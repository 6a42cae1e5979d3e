#!/usr/bin/env python
"""Measure the save_memory knobs on a long clip (VERDICT r3 next #5):

  (a) raw-window device cache ON (default 2 GiB budget) vs OFF (budget 0:
      per-(step,group) host upload of the raw uint8 windows)
  (b) window_group 1 vs 2 under save_memory

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_savemem.py [--frames 304]

Uses a mid-length clip (default 304 frames = 16 windows) so the sweep stays
affordable; the effects scale linearly in window count, so the per-window-
step deltas transfer to the 924-frame headline workload.
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
    ap.add_argument("--frames", type=int, default=304)
    ap.add_argument("--steps", type=int, default=25)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.pipelines.context import compute_context_windows, compute_video_length
    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    height = width = 512
    L = compute_video_length(args.frames, 24, 4)
    n_windows = len(compute_context_windows(L, 24, 4)[0])

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    print(f"# startup {time.time()-t0:.0f}s; clip {L} frames = {n_windows} windows",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    kwargs = dict(
        reference_image=rng.uniform(0, 1, (height, width, 3)).astype(np.float32),
        kps_images=rng.integers(0, 256, (L, height, width, 3), dtype=np.uint8),
        audio_waveform=(0.1 * rng.standard_normal(int(L / 30 * 16000))).astype(np.float32),
        width=width, height=height, video_length=L,
        num_inference_steps=args.steps, guidance_scale=3.5,
        context_frames=24, context_overlap=4, seed=0,
        median_filter=True, output_yuv420=True, save_memory=True,
    )

    def run(tag, cache_mb, extra=None):
        os.environ["VEXPRESS_SAVEMEM_DEV_CACHE_MB"] = str(cache_mb)
        t = time.time()
        video = pipe(**{**kwargs, **(extra or {})})
        for plane in video:
            np.asarray(plane)
        dt = time.time() - t
        print(json.dumps({"config": tag, "e2e_s": round(dt, 1),
                          "fps": round(L / dt, 3),
                          "s_per_window_step": round(dt / (n_windows * args.steps), 4)}),
              flush=True)
        return dt

    # warm all compiles with the default config, unmeasured
    run("warmup_cache_on_g1", 2048)
    run("cache_on_g1", 2048)
    run("cache_off_g1", 0)
    run("cache_on_g2", 2048, {"window_group": 2})
    run("cache_on_g1_again", 2048)  # drift check


if __name__ == "__main__":
    main()
