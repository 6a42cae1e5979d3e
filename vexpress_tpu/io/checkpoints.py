"""Orbax checkpointing: full trainer state save/resume + per-module torch
export.

Mirrors the reference's two mechanisms (SURVEY.md §5.4): (a) full state via
accelerator.save_state/load_state -> orbax StandardCheckpointer on the
TrainState pytree, (b) per-module weight dumps every checkpointing_steps
(train.py:672-698, 734-753) -> export_to_torch_state_dict.
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Optional

import numpy as np

from .torch_export import export_to_torch_state_dict, filter_motion_module, save_torch_checkpoint

MODULE_FILES = (
    "denoising_unet",
    "reference_net",
    "v_kps_guider",
    "audio_projection",
)


def save_train_state(ckpt_dir: str, step: int, state) -> str:
    import orbax.checkpoint as ocp

    path = pathlib.Path(ckpt_dir).resolve() / f"checkpoint-{step}"
    with ocp.StandardCheckpointer() as ckptr:
        # overwrite stale dirs from a killed run at the same step — orbax
        # refuses to save over an existing destination otherwise
        ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                          "step": np.asarray(state.step)}, force=True)
    return str(path)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    p = pathlib.Path(ckpt_dir)
    if not p.exists():
        return None
    ckpts = sorted(
        (d for d in p.iterdir() if d.name.startswith("checkpoint-")),
        key=lambda d: int(d.name.split("-")[1]),
    )
    return str(ckpts[-1]) if ckpts else None


def restore_train_state(path: str, abstract_state) -> Any:
    """Restore into the structure of `abstract_state` (a TrainState template)."""
    import orbax.checkpoint as ocp

    from ..train.train_step import TrainState

    template = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": np.asarray(abstract_state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(pathlib.Path(path).resolve(), template)
    return TrainState(restored["params"], restored["opt_state"], restored["step"])


def export_modules(params, out_dir: str, step: int, save_motion_separately: bool = True) -> None:
    """Per-module torch-compatible dumps: <module>-<step>.pth
    (+ motion_module-<step>.pth filtered from the denoising unet)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in MODULE_FILES:
        if name not in params:
            continue
        sd = export_to_torch_state_dict(params[name])
        save_torch_checkpoint(sd, os.path.join(out_dir, f"{name}-{step}.pth"))
        if name == "denoising_unet" and save_motion_separately:
            save_torch_checkpoint(
                filter_motion_module(sd), os.path.join(out_dir, f"motion_module-{step}.pth")
            )
