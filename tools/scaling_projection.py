#!/usr/bin/env python
"""Analytic v5e-N scaling projection for window-parallel inference.

No multi-chip hardware is reachable from this sandbox (CLAUDE.md), so the
mode="sharded" performance story is a MODEL, not a measurement — this script
keeps it honest by deriving it strictly from single-chip measurements
(PERFORMANCE.md) plus first-principles collective costs, with every
assumption printed next to the number it produces.

Model of one sharded denoise step (parallel/mesh.py:window_parallel_step_dynamic):
  * each chip runs ceil(n_windows/N) window UNet forwards — the SAME per-block
    programs measured single-chip (0.72 s/window-step steady), so per-window
    time is taken as measured, not idealized;
  * one psum of the fp32 latent accumulator (L x 64 x 64 x 4) per step —
    ring all-reduce cost 2*D*(N-1)/N / ICI_BW;
  * the DDIM/DPM update runs replicated (negligible, measured inside the
    0.72 s).
VAE decode + median filter shard over frames (embarrassingly parallel,
measured 90 s single-chip for 924 frames); conditioning partially shards
(guider/audio over frames; the one reference-net forward does not).

Usage: python tools/scaling_projection.py [N_chips ...]
Prints one JSON line per chip count.
"""

import json
import math
import sys

# --- measured single-chip constants (PERFORMANCE.md, BENCH r4) -------------
WINDOW_STEP_S = 0.72        # steady window-step, 924-frame save_memory run
DECODE_FILTER_S_924 = 90.0  # chunked VAE decode + filter + pipelined download
COND_S_924 = 35.0           # conditioning: ref-net + guider + wav2vec2 + proj
COND_UNSHARDABLE_S = 5.0    # the single reference-net forward + glue
STARTUP_TUNNEL_S = 87.6     # 4.4 GB bf16 params at the sandbox tunnel's ~50 MB/s
STARTUP_PCIE_S = 10.0       # same upload on a real v5e host (>= 2 GB/s PCIe)
N_STEPS = 25
FRAMES = 924
CONTEXT, OVERLAP = 24, 4

# --- v5e fabric ------------------------------------------------------------
ICI_GBPS = 45.0  # per-chip ICI bandwidth, v5e (2D torus, aggregate per chip)


def project(n_chips: int) -> dict:
    from vexpress_tpu.pipelines.context import compute_context_windows
    from vexpress_tpu.parallel.mesh import pad_window_set
    import numpy as np

    windows, inv = compute_context_windows(FRAMES, CONTEXT, OVERLAP)
    win_idx, _ = pad_window_set(np.asarray(windows), inv, n_chips)
    padded = win_idx.shape[0]          # dead-compute pad rows included
    per_chip = padded // n_chips

    # per-step psum of the fp32 accumulator over the padded frame buffer
    l_bucket = -(-FRAMES // 32) * 32   # pipeline length bucketing
    acc_bytes = l_bucket * 64 * 64 * 4 * 4
    psum_s = 2 * acc_bytes * (n_chips - 1) / n_chips / (ICI_GBPS * 1e9)

    denoise_s = N_STEPS * (per_chip * WINDOW_STEP_S + psum_s)
    decode_s = DECODE_FILTER_S_924 / n_chips
    cond_s = COND_UNSHARDABLE_S + (COND_S_924 - COND_UNSHARDABLE_S) / n_chips
    run_s = denoise_s + decode_s + cond_s

    out = {
        "n_chips": n_chips,
        "padded_windows": padded,
        "windows_per_chip": per_chip,
        "psum_ms_per_step": round(psum_s * 1e3, 2),
        "denoise_s": round(denoise_s, 1),
        "run_s": round(run_s, 1),
        "e2e_fps": round(FRAMES / run_s, 2),
        "all_inclusive_fps_tunnel_startup": round(
            FRAMES / (STARTUP_TUNNEL_S + run_s), 2),
        "all_inclusive_fps_pcie_startup": round(
            FRAMES / (STARTUP_PCIE_S + run_s), 2),
    }
    out["vs_baseline_all_inclusive_pcie"] = round(
        out["all_inclusive_fps_pcie_startup"] / 0.36, 1)
    return out


def main():
    chips = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    print(json.dumps({
        "model": "window-parallel sharded inference, 924-frame reference "
                 "workload; derived from single-chip measurements",
        "assumptions": [
            f"per-window step time stays {WINDOW_STEP_S}s on every chip "
            "(same compiled programs; no multi-chip interference modeled)",
            f"one fp32 latent-accumulator psum per step at {ICI_GBPS} GB/s "
            "per-chip ICI (ring all-reduce)",
            "VAE decode/filter and guider/audio conditioning shard over "
            "frames; the reference-net forward does not",
            "host IO (kps upload, YUV download) overlaps compute as measured "
            "single-chip",
        ],
    }, indent=None))
    for n in chips:
        print(json.dumps(project(n)))


if __name__ == "__main__":
    main()
