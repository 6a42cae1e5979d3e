#!/usr/bin/env python
"""Time the real piecewise window-group step (the unit that dominates e2e
inference: 25 steps x 6 windows) and attribute per-stage shares.

Runs the exact `group_step` the pipeline uses (gather + per-block UNet
programs + CFG combine/scatter) on random full-size weights — same compute,
no checkpoints needed. The unsynced chain number is the trustworthy one;
timed_stages adds ~40 ms/stage of sync overhead (shares are relative only).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_window_step.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")


def main():
    g = int(sys.argv[sys.argv.index("--group") + 1]) if "--group" in sys.argv else 1
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline

    height = width = 512
    num_steps, guidance_scale = 25, 3.5
    video_length, win = 124, 24

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    print(f"pipeline loaded in {time.time()-t0:.0f}s", flush=True)

    cfg = models.unet_config
    h = height // 8
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((video_length, h, h, 4)), jnp.float32)
    kps_feat = jnp.asarray(rng.standard_normal((video_length, h, h, cfg.block_out_channels[0])), jnp.bfloat16)
    audio_tok = jnp.asarray(rng.standard_normal((video_length, 2 * 5, 768)), jnp.bfloat16)
    rf_shapes = cfg.ref_feature_shapes(h, h)
    # CFG-batched banks: [zero uncond; cond]
    ref_feats = tuple(
        jnp.concatenate([jnp.zeros((1, l, c), jnp.bfloat16),
                         jnp.asarray(rng.standard_normal((1, l, c)), jnp.bfloat16)])
        for l, c in rf_shapes)

    group_step, ddim = pipe._build_piecewise_programs(num_steps, guidance_scale)
    w_idx = jnp.asarray(
        np.stack([np.arange(win) + i * 20 for i in range(g)]).astype(np.int32))  # (g, 24)
    w_w = jnp.full((g, win), 1.0, jnp.float32)
    tt = jnp.asarray(999)
    acc = jnp.zeros_like(latents)
    scales = (jnp.asarray(1.0, jnp.bfloat16), jnp.asarray(1.0, jnp.bfloat16))

    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    np.asarray(reduce(latents))

    def one(acc):
        return group_step(acc, latents, tt, w_idx, w_w, kps_feat, audio_tok,
                          ref_feats, scales[0], scales[1])

    t0 = time.time()
    acc = one(acc)
    np.asarray(reduce(acc))
    print(f"first group_step (compiles): {time.time()-t0:.0f}s", flush=True)

    reps = 10
    t0 = time.time()
    for _ in range(reps):
        acc = one(acc)
    np.asarray(reduce(acc))
    step_s = (time.time() - t0) / reps
    print(f"window group step g={g} (unsynced chain): {step_s*1000:.0f} ms", flush=True)
    n_groups = -(-6 // g)
    est = num_steps * n_groups * step_s
    print(f"=> denoise estimate for 124 frames: {est:.1f}s", flush=True)
    if g > 1:
        return

    # per-stage attribution (sync overhead ~40ms/stage: relative shares only)
    runner = pipe.piecewise_runner
    lat = jnp.concatenate([latents[w_idx[0]][None]] * 2).astype(jnp.bfloat16)
    kps = jnp.concatenate([jnp.zeros((1, win, h, h, cfg.block_out_channels[0]), jnp.bfloat16),
                           kps_feat[w_idx[0]][None]])
    aud = jnp.concatenate([jnp.zeros((1, win, 10, 768), jnp.bfloat16),
                           audio_tok[w_idx[0]][None]])
    rec = runner.timed_stages(pipe.params["denoising_unet"], lat,
                              jnp.broadcast_to(tt, (2,)), aud, ref_feats, kps,
                              scales[0], scales[1], reps=3, zero_uncond_kv=True)
    total = sum(rec.values())
    for k, v in sorted(rec.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<12} {v*1000:7.1f} ms  {v/total:6.1%}", flush=True)
    print(f"  synced total {total*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
