"""Flax param-tree -> torch state-dict export (inverse of torch_import).

Lets checkpoints trained with this framework be consumed by the reference
stack (and by this repo's own loader): per-module .pth dumps matching
train.py:734-753 (save_module_checkpoint / save_motion_module_checkpoint
filename and key conventions).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _flax_path_to_torch_key(parts) -> str:
    key = ".".join(parts)
    # module-list index re-expansion: resnets_0 -> resnets.0 (known list names)
    key = re.sub(
        r"\b(down_blocks|up_blocks|resnets|attentions|motion_modules|transformer_blocks"
        r"|downsamplers|upsamplers|norms|attention_blocks|blocks|conv_layers|layers)_(\d+)",
        r"\1.\2",
        key,
    )
    key = key.replace("to_out_0", "to_out.0")
    key = key.replace("net_0_proj", "net.0.proj")
    key = key.replace("net_2", "net.2")
    # audio projection composites
    key = re.sub(r"layers\.(\d+)_attn\.", r"layers.\1.0.", key)
    key = re.sub(r"layers\.(\d+)_ff\.norm\.", r"layers.\1.1.0.", key)
    key = re.sub(r"layers\.(\d+)_ff\.fc1\.", r"layers.\1.1.1.", key)
    key = re.sub(r"layers\.(\d+)_ff\.fc2\.", r"layers.\1.1.3.", key)
    return key


def export_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Nested flax params (without the outer {"params": ...} or with) ->
    flat torch-style state dict of numpy arrays."""
    if set(params.keys()) == {"params"}:
        params = params["params"]

    out: Dict[str, np.ndarray] = {}

    def walk(node, parts):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, parts + [k])
            return
        arr = np.asarray(node, dtype=np.float32)
        leaf = parts[-1]
        prefix = parts[:-1]
        if leaf == "kernel":
            if arr.ndim == 4:  # HWIO -> OIHW
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 3:  # conv1d (K, I/g, O) -> (O, I/g, K)
                arr = arr.transpose(2, 1, 0)
            elif arr.ndim == 2:
                arr = arr.T
            key = _flax_path_to_torch_key(prefix + ["weight"])
        elif leaf == "scale":
            key = _flax_path_to_torch_key(prefix + ["weight"])
        elif leaf == "bias":
            key = _flax_path_to_torch_key(prefix + ["bias"])
        else:  # passthrough params (latents, pos_emb, ...)
            key = _flax_path_to_torch_key(parts)
            if leaf == "pos_emb":
                key = key + ".weight"  # nn.Embedding
        out[key] = arr

    walk(params, [])
    return out


def filter_motion_module(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """train.py:744-753: motion-module-only checkpoint."""
    return {k: v for k, v in state_dict.items() if "motion_module" in k}


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}, path)
