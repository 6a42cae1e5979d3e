#!/usr/bin/env python
"""VAE decode throughput at 512x512 vs chunk size (+ MFU).

The decode tail costs ~12 s of the 124-frame clip (~10% of e2e); this measures
whether the chunked decoder leaves throughput on the table and which chunk
size is optimal for the pipelined decode→filter→download path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_decode.py
"""

import os
import time

import numpy as np

os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")

PEAK_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.models.vae import AutoencoderKL, VAEConfig

    dt = jnp.bfloat16
    cfg = VAEConfig()
    vae = AutoencoderKL(cfg, dtype=dt)
    key = jax.random.PRNGKey(0)
    lat1 = jax.random.normal(key, (1, 64, 64, 4), dt)
    params = vae.init(key, lat1, method=AutoencoderKL.decode)

    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    np.asarray(reduce(jnp.zeros((4, 4), dt)))

    # rough per-frame decoder FLOPs at 512x512 (SD decoder: 4 levels of
    # resnets/upsamples, ~1.25 TF/frame)
    FLOPS_PER_FRAME = 1.25e12

    for chunk in (4, 8, 16, 32):
        lat = jax.random.normal(key, (chunk, 64, 64, 4), jnp.float32)

        f = jax.jit(lambda p, z: vae.apply(p, z / 0.18215, method=AutoencoderKL.decode))
        try:
            out = f(params, lat)
            np.asarray(reduce(out))
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = f(params, lat)
            np.asarray(reduce(out))
            dt_s = (time.time() - t0) / reps
            ms_frame = dt_s / chunk * 1000
            mfu = FLOPS_PER_FRAME * chunk / dt_s / (PEAK_TFLOPS * 1e12) * 100
            print(f"chunk {chunk:3d}: {dt_s*1000:8.1f} ms  {ms_frame:6.1f} ms/frame  "
                  f"~MFU {mfu:4.1f}%", flush=True)
        except Exception as e:
            print(f"chunk {chunk:3d}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
