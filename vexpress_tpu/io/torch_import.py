"""Torch-checkpoint -> flax param-tree conversion.

The released V-Express weights are five torch state dicts
(denoising_unet.bin, reference_net.bin, motion_module.bin, v_kps_guider.bin,
audio_projection.bin; reference: inference.py:77-129, loaded strict=False).
This module maps diffusers-style torch keys onto this repo's flax module
paths and converts tensor layouts:

  Linear  weight (O, I)        -> kernel (I, O)
  Conv2d  weight (O, I, kH, kW) -> kernel (kH, kW, I, O)
  Norm    weight (C,)           -> scale
  buffers (pos_encoder.pe, ...) -> skipped (recomputed)

Also supports the reference's checkpoint-lineage remaps
(train.py:122-161: old_attn / moore_pretrained / new_attn).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

# Ordered rewrite rules applied to the dotted torch key (first match of each
# rule applies everywhere in the key).
_REWRITES: Tuple[Tuple[str, str], ...] = (
    (r"(^|\.)to_out\.0\.", r"\1to_out_0."),
    (r"(^|\.)net\.0\.proj\.", r"\1net_0_proj."),
    (r"(^|\.)net\.2\.", r"\1net_2."),
    # AudioProjection: layers.{i}.0 = PerceiverAttention, layers.{i}.1 = FF Sequential
    (r"^layers\.(\d+)\.0\.", r"layers_\1_attn."),
    (r"^layers\.(\d+)\.1\.0\.", r"layers_\1_ff.norm."),
    (r"^layers\.(\d+)\.1\.1\.", r"layers_\1_ff.fc1."),
    (r"^layers\.(\d+)\.1\.3\.", r"layers_\1_ff.fc2."),
    (r"^pos_emb\.weight$", "pos_emb"),
)

_SKIP_PATTERNS: Tuple[str, ...] = (
    r"pos_encoder\.pe$",  # sinusoidal buffer, recomputed
    r"num_batches_tracked$",
)

# Flax param leaves that are not torch "weight"/"bias" leaves.
_PASSTHROUGH_LEAVES = {"latents", "pos_emb"}


def _merge_list_indices(key: str) -> str:
    """down_blocks.0.resnets.1.x -> down_blocks_0.resnets_1.x"""
    while True:
        new = re.sub(r"([A-Za-z0-9_]+)\.(\d+)\.", r"\1_\2.", key)
        if new == key:
            return new
        key = new


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    for pat, repl in _REWRITES:
        key = re.sub(pat, repl, key)
    key = _merge_list_indices(key)
    return tuple(key.split("."))


def convert_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    strict_shapes: bool = True,
) -> Dict:
    """Convert a torch state dict (tensors or numpy arrays) to a nested flax
    params dict. Values are converted to float32 numpy arrays."""
    params: Dict = {}
    for key, value in state_dict.items():
        if any(re.search(p, key) for p in _SKIP_PATTERNS):
            continue
        arr = np.asarray(_to_numpy(value), dtype=np.float32)
        path = list(torch_key_to_flax_path(key))
        leaf = path[-1]

        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
                path[-1] = "kernel"
            elif arr.ndim == 2:  # linear (O, I) -> (I, O)
                arr = arr.T
                path[-1] = "kernel"
            elif arr.ndim == 1:  # norm affine
                path[-1] = "scale"
            else:
                raise ValueError(f"unhandled weight rank {arr.ndim} for {key}")
        elif leaf == "bias":
            pass
        elif path[-1] in _PASSTHROUGH_LEAVES or path[0] in _PASSTHROUGH_LEAVES:
            pass
        else:
            # unknown leaf (buffer etc.) — keep as-is; caller may prune
            pass

        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = arr
    return params


def _to_numpy(value):
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().to("cpu").float().numpy()
    return value


def remap_lineage(state_dict: Mapping, state_dict_type: str) -> Dict:
    """Reference train.py:122-161: derive attn1_5/norm1_5 weights and audio
    attn2 weights for older checkpoint lineages."""
    out = dict(state_dict)
    if state_dict_type == "new_attn":
        return out
    if state_dict_type not in ("old_attn", "moore_pretrained"):
        raise ValueError(f"unsupported state_dict_type {state_dict_type}")
    for name in list(state_dict.keys()):
        if "norm1" in name and "norm1_5" not in name:
            out[name.replace("norm1", "norm1_5")] = state_dict[name]
        if "attn1" in name and "attn1_5" not in name:
            out[name.replace("attn1", "attn1_5")] = state_dict[name]
        if state_dict_type == "old_attn":
            for part in ("to_q", "to_k", "to_v", "to_out"):
                tgt = f"attn2.{part}"
                if tgt in name:
                    # the reference indexes unconditionally (train.py:131-149)
                    # — a malformed old_attn checkpoint must fail loudly, not
                    # silently keep the SD text-attention weights in attn2
                    src = name.replace(tgt, f"attn2.processor.{part}_aud")
                    if src not in state_dict:
                        raise KeyError(
                            f"old_attn checkpoint has {name} but no {src}; "
                            "is this really an old_attn-lineage state dict?")
                    out[name] = state_dict[src]
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pth/.safetensors torch checkpoint into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in sd.items()}
