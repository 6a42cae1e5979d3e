#!/usr/bin/env python
"""Per-stage timing of the production (piecewise) window step on the real
chip: times each per-block UNet program individually plus the gather/scatter
glue, so optimization effort goes where the milliseconds are (SURVEY §5.1 —
profiling as a first-class subsystem).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py
Optionally --trace <dir> to also capture a jax.profiler trace of 3 steps.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default="")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cfg_fast", type=int, default=1,
                    help="use the zero-uncond-KV CFG fast path (production default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.models.piecewise import PiecewiseUNetRunner

    models = default_pipeline_models(dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    print(f"startup {time.time() - t0:.1f}s", flush=True)

    h = w = args.height // 8
    f = args.frames
    B = 2  # CFG batch
    cfg = models.unet_config
    rng = np.random.default_rng(0)

    sample = jnp.asarray(rng.normal(size=(B, f, h, w, 4)), jnp.bfloat16)
    t = jnp.asarray([500, 500])
    audio = jnp.asarray(rng.normal(size=(B, f, 5, 768)), jnp.bfloat16)
    kps = jnp.asarray(rng.normal(size=(B, f, h, w, 320)), jnp.bfloat16)
    shapes = cfg.ref_feature_shapes(h, w)
    refs = tuple(jnp.asarray(rng.normal(size=(B, l, c)), jnp.bfloat16) for l, c in shapes)
    params = pipe.params["denoising_unet"]

    runner = PiecewiseUNetRunner(cfg, dtype=jnp.bfloat16)
    zk = bool(args.cfg_fast)

    # warm up the whole chain (compiles)
    t0 = time.time()
    out = runner.unet3d(params, sample, t, audio, refs, kps, 0.95, 3.0, zero_uncond_kv=zk)
    np.asarray(out)
    print(f"compile+first run {time.time() - t0:.1f}s", flush=True)

    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    float(sync(out.reshape(-1)[:8]))  # pre-warm the sync reducer

    # time the full chain
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = runner.unet3d(params, sample, t, audio, refs, kps, 0.95, 3.0, zero_uncond_kv=zk)
        np.asarray(out)
        times.append(time.time() - t0)
    print(f"full piecewise UNet forward: {min(times):.3f}s best of {args.reps} "
          f"(cfg_fast={zk})", flush=True)

    # per-stage timings (each stage synced via device_get of its output's sum)
    stage_times = runner.timed_stages(params, sample, t, audio, refs, kps, 0.95, 3.0,
                                      reps=args.reps, zero_uncond_kv=zk)
    total = sum(stage_times.values())
    print(f"\n{'stage':<18} {'ms':>8} {'share':>7}")
    for name, ts in stage_times.items():
        print(f"{name:<18} {ts * 1000:8.1f} {ts / total:6.1%}")
    print(f"{'TOTAL':<18} {total * 1000:8.1f}")

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            out = runner.unet3d(params, sample, t, audio, refs, kps, 0.95, 3.0)
        np.asarray(out)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
