#!/usr/bin/env python
"""Benchmark: generated frames/sec at 512x512, 25-step denoise (V-Express
headline workload; BASELINE.md: reference achieves ~0.36 frames/s on V100 for
this configuration — 930 frames in 2617 s, README.md:116).

Measures the steady-state denoise throughput of the production (piecewise)
window-group step on the real chip — one full 24-frame context window per
UNet pass, CFG batch 2 — plus batched VAE decode, and derives end-to-end
generated frames/sec:
  total = num_steps * num_windows * t_window + L * t_decode  ->  fps = L / total

Prints ONE JSON line:
  {"metric": "frames_per_sec_512x512_25step", "value": N, "unit": "frames/s",
   "vs_baseline": N / 0.36}
"""

import json
import time

import numpy as np

BASELINE_FPS = 0.36


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.pipelines.context import compute_context_windows

    # workload geometry (reference defaults, inference.py:61-70)
    height = width = 512
    num_steps = 25
    context_frames, context_overlap = 24, 4
    guidance_scale = 3.5
    video_length = 124  # AOC-sized clip: 6 windows

    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)

    windows, inv_counts = compute_context_windows(video_length, context_frames, context_overlap)
    n_windows = len(windows)

    h, w = height // 8, width // 8
    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (video_length, h, w, 4), jnp.float32)
    kps_feat = jnp.zeros((video_length, h, w, 320), jnp.bfloat16)
    audio_tok = jnp.zeros((video_length, 5, 768), jnp.bfloat16)
    ref_feats = tuple(
        jnp.zeros((2, l, c), jnp.bfloat16)
        for l, c in models.unet_config.ref_feature_shapes(h, w)
    )

    group_step, ddim = pipe._build_piecewise_programs(num_steps, guidance_scale)
    idx = jnp.asarray(windows[:1].astype(np.int32))
    wts = jnp.asarray(inv_counts[windows[:1]])
    acc = jnp.zeros_like(latents)
    rs, as_ = jnp.bfloat16(0.95), jnp.bfloat16(3.0)

    # warmup/compile (persistent cache makes this fast on later runs)
    t0 = time.time()
    out = group_step(acc, latents, jnp.asarray(999), idx, wts, kps_feat, audio_tok,
                     ref_feats, rs, as_)
    np.asarray(out)  # device_get forces true completion (block_until_ready can
    # return early through the axon tunnel runtime)
    compile_s = time.time() - t0

    reps = 5
    t0 = time.time()
    out = acc
    for _ in range(reps):
        out = group_step(out, latents, jnp.asarray(999), idx, wts, kps_feat, audio_tok,
                         ref_feats, rs, as_)
    np.asarray(out)
    window_s = (time.time() - t0) / reps

    np.asarray(ddim(out, jnp.asarray(999), latents))

    # VAE decode throughput (16-frame chunks)
    chunk = 16
    z = jnp.zeros((chunk, h, w, 4), jnp.float32)
    np.asarray(pipe._decode_chunk(z))
    t0 = time.time()
    for _ in range(3):
        r = pipe._decode_chunk(z)
    np.asarray(r)
    decode_s_per_frame = (time.time() - t0) / 3 / chunk

    denoise_total = num_steps * n_windows * window_s
    decode_total = video_length * decode_s_per_frame
    total = denoise_total + decode_total
    fps = video_length / total

    result = {
        "metric": "frames_per_sec_512x512_25step",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "detail": {
            "video_length": video_length,
            "n_windows": n_windows,
            "window_step_s": round(window_s, 3),
            "decode_s_per_frame": round(decode_s_per_frame, 4),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
