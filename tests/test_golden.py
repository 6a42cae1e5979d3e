"""Self-golden regression net (VERDICT r2 item 9).

Fixed-seed tiny-pipeline latents (fp32, CPU, deterministic PRNGKey(0) init)
are committed under tests/goldens/. Any numeric change to the denoise path —
an attention rewrite, a fusion-boundary move, a scheduler tweak — that shifts
the output beyond tolerance fails here, so perf work can't silently alter
results. Fidelity is measured with tools/psnr.py's PSNR (the same metric as
BASELINE.md's >= 40 dB north star vs reference outputs).

UPDATE PROCEDURE (only after verifying the numeric change is intended and
equivalence tests still pass):
    VEXPRESS_UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py
then commit the regenerated tests/goldens/*.npy with an explanation of what
changed the numerics.
"""

import os
import sys

import numpy as np
import pytest

from .utils import make_tiny_pipeline

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from psnr import psnr  # noqa: E402  (tools/psnr.py)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
PSNR_GATE_DB = 45.0  # jax/XLA version drift lands > 100 dB; real math changes land far below


def _run(pipe, piecewise):
    rng = np.random.default_rng(1234)
    H = W = 64
    L = 12
    return pipe(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=np.asarray(rng.uniform(size=(L, H, W, 3)), np.float32),
        audio_waveform=np.asarray(rng.normal(size=(6400,)), np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4, window_group=2,
        seed=7, return_latents=True, piecewise=piecewise,
        shape_bucketing=False,
    ).astype(np.float32)


@pytest.mark.parametrize("mode", ["streamed", "piecewise"])
def test_golden_latents(mode):
    pipe = make_tiny_pipeline()
    lat = _run(pipe, piecewise=(mode == "piecewise"))
    path = os.path.join(GOLDEN_DIR, f"tiny_latents_{mode}.npy")

    if os.environ.get("VEXPRESS_UPDATE_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, lat)
        pytest.skip(f"golden regenerated at {path}; commit it")

    assert os.path.exists(path), (
        f"missing golden {path}; generate with VEXPRESS_UPDATE_GOLDEN=1")
    golden = np.load(path)
    assert golden.shape == lat.shape
    rng_span = float(golden.max() - golden.min())
    db = psnr(lat, golden, data_range=rng_span)
    assert db >= PSNR_GATE_DB, (
        f"latents drifted from golden: PSNR {db:.1f} dB < {PSNR_GATE_DB} "
        f"(max abs diff {np.abs(lat - golden).max():.2e}). If the numeric "
        f"change is intended, follow the update procedure in this file's "
        f"docstring.")
