#!/usr/bin/env python
"""The reference's 924-frame `--save_gpu_memory` workload under an alternate
sampler config (default: the quality-validated DPM-Solver++ 2M @ 16 steps —
see tools/bench_sampler_quality.py / PERFORMANCE.md).

One measured pass (the UNet block programs are step-count-independent and the
persistent compile cache covers them; only the tiny per-bucket sampler glue
compiles fresh), reported e2e and all-inclusive-with-startup, directly
comparable to the reference's 0.36 f/s (README.md:116) and to the DDIM-25
long-pass numbers in BENCH r4.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_long_sampler.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=930)  # trimmed to 924
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--sampler", type=str, default="dpmpp_2m")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.pipelines.context import (compute_context_windows,
                                                compute_video_length)
    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    height = width = 512
    L = compute_video_length(args.frames, 24, 4)
    n_windows = len(compute_context_windows(L, 24, 4)[0])

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    startup_s = time.time() - t0
    print(json.dumps({"startup_s": round(startup_s, 1),
                      "frames": L, "windows": n_windows}), flush=True)

    rng = np.random.default_rng(0)
    kwargs = dict(
        reference_image=rng.uniform(0, 1, (height, width, 3)).astype(np.float32),
        kps_images=rng.integers(0, 256, (L, height, width, 3), dtype=np.uint8),
        audio_waveform=(0.1 * rng.standard_normal(int(L / 30 * 16000))).astype(np.float32),
        width=width, height=height, video_length=L,
        num_inference_steps=args.steps, guidance_scale=3.5,
        sampler=args.sampler,
        context_frames=24, context_overlap=4, seed=0,
        median_filter=True, output_yuv420=True, save_memory=True,
    )
    t = time.time()
    video = pipe(**kwargs)
    for plane in video:
        np.asarray(plane)
    dt = time.time() - t
    print(json.dumps({
        "config": f"{args.sampler}@{args.steps}_save_memory_{L}f",
        "e2e_s": round(dt, 1),
        "e2e_fps": round(L / dt, 3),
        "all_inclusive_fps": round(L / (startup_s + dt), 3),
        "vs_baseline_all_inclusive": round(L / (startup_s + dt) / 0.36, 2),
        "s_per_window_step": round(dt / (n_windows * args.steps), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
