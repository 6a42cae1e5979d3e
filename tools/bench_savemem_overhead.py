#!/usr/bin/env python
"""Decompose the save_memory long-pass overhead (r5: the 924-frame runs read
0.89-1.15 s/window-step vs the 0.668 s microbenched group step).

Runs the SAME 304-frame clip warm, save_memory ON vs OFF, with per-step
timestamps from progress_callback — the ON-OFF delta isolates the per-
(step,group) on-the-fly guider cost + host glue; the tail after the last
step isolates decode/filter/download.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_savemem_overhead.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")


def main():
    frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 304
    steps = 25

    import jax.numpy as jnp

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.pipelines.context import (compute_context_windows,
                                                compute_video_length)
    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    H = W = 512
    L = compute_video_length(frames, 24, 4)
    n_windows = len(compute_context_windows(L, 24, 4)[0])

    t0 = time.time()
    pipe = load_pipeline(models=default_pipeline_models(dtype=jnp.bfloat16),
                         verbose=False, param_dtype=jnp.bfloat16)
    print(json.dumps({"startup_s": round(time.time() - t0, 1), "frames": L,
                      "windows": n_windows}), flush=True)

    rng = np.random.default_rng(0)
    base = dict(
        reference_image=rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
        kps_images=rng.integers(0, 256, (L, H, W, 3), dtype=np.uint8),
        audio_waveform=(0.1 * rng.standard_normal(int(L / 30 * 16000))).astype(np.float32),
        width=W, height=H, video_length=L, num_inference_steps=steps,
        guidance_scale=3.5, context_frames=24, context_overlap=4, seed=0,
        median_filter=True, output_yuv420=True,
    )

    import contextlib

    def run(tag, warm, **extra):
        stamps = []

        def cb(i, t):
            stamps.append(time.time())

        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            video = pipe(**{**base, **extra},
                         progress_callback=None if warm else cb)
        for plane in video:
            np.asarray(plane)
        dt = time.time() - t0
        rec = {"config": tag, "warm": warm, "e2e_s": round(dt, 1),
               "s_per_window_step": round(dt / (n_windows * steps), 4)}
        if stamps:
            loop = stamps[-1] - stamps[0]
            rec.update({
                "cond_before_first_step_s": round(stamps[0] - t0, 1),
                "denoise_loop_s": round(loop, 1),
                "loop_s_per_window_step": round(loop / (n_windows * (steps - 1)), 4),
                "decode_download_tail_s": round(t0 + dt - stamps[-1], 1),
            })
        print(json.dumps(rec), flush=True)

    run("savemem_on", warm=True, save_memory=True)    # warm pass, unmeasured detail
    run("savemem_on", warm=False, save_memory=True)
    run("savemem_off", warm=True, save_memory=False)  # compiles the L-gather variant
    run("savemem_off", warm=False, save_memory=False)


if __name__ == "__main__":
    main()
