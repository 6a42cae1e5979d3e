#!/usr/bin/env python
"""Micro-benchmarks of the UNet's hot sub-ops at production shapes
(512x512 latents, CFG batch 2 x 24 frames), with bf16 roofline comparison.
Pinpoints which op class holds the full-resolution blocks at ~10% MFU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_ops.py
"""

import time

import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.models.blocks import ResnetBlock, conv, group_norm
    from vexpress_tpu.models.motion_module import TemporalMotionModule
    from vexpress_tpu.ops.attention import Attention, sdpa
    from vexpress_tpu.ops.layers import FeedForward

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    BF, H, W, C = 48, 64, 64, 320  # CFG 2 x 24 frames at 512x512 latents
    L = H * W
    heads = 8

    # pre-warmed scalar reducer: forces true completion through the axon
    # tunnel (block_until_ready can return early; np.asarray of the full
    # output would measure the ~10 MB/s download, not the compute)
    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))

    def bench(name, init_fn, apply_fn, flops, reps=10):
        params, args = init_fn()
        f = jax.jit(lambda p, *a: apply_fn(p, *a))
        out = f(params, *args)
        np.asarray(reduce(out))  # warm f and reduce, device_get scalar sync
        t0 = time.time()
        for _ in range(reps):
            out = f(params, *args)
        np.asarray(reduce(out))  # chained on all reps' outputs' last value
        dt_s = (time.time() - t0) / reps
        tf = flops / dt_s / 1e12
        print(f"{name:<34} {dt_s * 1000:8.2f} ms  {tf:7.1f} TF/s  {tf / PEAK_TFLOPS:6.1%} MFU",
              flush=True)
        return dt_s

    x_img = jax.random.normal(key, (BF, H, W, C), dt)
    x_seq = jax.random.normal(key, (BF, L, C), dt)
    temb = jax.random.normal(key, (BF, 1280), dt)

    # 3x3 conv C->C
    conv_flops = 2 * BF * L * 9 * C * C
    bench("conv3x3 320->320 (48,64,64)",
          lambda: (conv(C, 3, "c", dtype=dt).init(key, x_img), (x_img,)),
          lambda p, x: conv(C, 3, "c", dtype=dt).apply(p, x),
          conv_flops)

    # full resnet block (norm-silu-conv x2 + temb)
    rn = ResnetBlock(C, dtype=dt)
    bench("ResnetBlock 320 (48,64,64)",
          lambda: (rn.init(key, x_img, temb), (x_img, temb)),
          lambda p, x, t: rn.apply(p, x, t),
          2 * conv_flops)

    # groupnorm + silu alone (bandwidth-bound)
    gn = group_norm(32, 1e-5, "n", dt)
    bench("GroupNorm+silu (48,64,64,320)",
          lambda: (gn.init(key, x_img), (x_img,)),
          lambda p, x: jax.nn.silu(gn.apply(p, x)),
          4 * BF * L * C)  # nominal

    # spatial self-attention attn1 (flash path)
    attn = Attention(C, heads, C // heads, dtype=dt)
    attn_flops = 2 * 2 * BF * L * L * C + 4 * 2 * BF * L * C * C  # qk+av + 4 proj
    bench("attn1 self (48, 4096, 320)",
          lambda: (attn.init(key, x_seq), (x_seq,)),
          lambda p, x: attn.apply(p, x),
          attn_flops)

    # attn1_5 grouped-query reference attention: q (2, 24*4096, 320), kv (2, 4096, 320)
    xq = jax.random.normal(key, (2, 24 * L, C), dt)
    xkv = jax.random.normal(key, (2, L, C), dt)
    a15_flops = 2 * 2 * 2 * (24 * L) * L * C + 2 * (2 * (24 * L) * C * C * 2 + 2 * 2 * L * C * C * 2)
    attn15 = Attention(C, heads, C // heads, dtype=dt)

    def init15():
        xq_s = x_seq  # params same as attn1 (self on (48, L, C) with kv arg)
        return attn15.init(key, xq_s, xq_s[:1, :L]), (xq, xkv)

    # Attention handles bq != bkv via grouped queries
    x48kv = jax.random.normal(key, (2, L, C), dt)
    bench("attn1_5 grouped (q 98304, kv 4096)",
          lambda: (attn15.init(key, xq, xkv), (xq, xkv)),
          lambda p, q, kv: attn15.apply(p, q, kv),
          a15_flops)

    # raw sdpa at attn1 shapes (isolate kernel from projections)
    q = jax.random.normal(key, (BF, L, C), dt)
    sdpa_flops = 2 * 2 * BF * L * L * C
    bench("sdpa core (48, 4096x4096, d40x8)",
          lambda: ({}, (q,)),
          lambda p, x: sdpa(x, x, x, heads),
          sdpa_flops)

    # GEGLU feed-forward
    ff = FeedForward(C, dtype=dt)
    ff_flops = 2 * BF * L * C * (2 * 4 * C) + 2 * BF * L * (4 * C) * C
    bench("FeedForward GEGLU (48,4096,320)",
          lambda: (ff.init(key, x_seq), (x_seq,)),
          lambda p, x: ff.apply(p, x),
          ff_flops)

    # motion module at full res: (48, 4096, 320) with f=24 -> (2*4096, 24, 320)
    mm = TemporalMotionModule(C, 8, 1, 32, dtype=dt)
    mm_flops = 2 * (  # 2 attention blocks
        4 * 2 * (2 * L) * 24 * C * C          # qkvo projections
        + 2 * 2 * (2 * L) * 24 * 24 * C       # qk+av
    ) + 2 * (2 * L) * 24 * C * 8 * C + 2 * (2 * L) * 24 * 4 * C * C  # ff
    bench("MotionModule f=24 (48,64,64,320)",
          lambda: (mm.init(key, x_img, 24), (x_img,)),
          lambda p, x: mm.apply(p, x, 24),
          mm_flops)

    # audio cross-attn attn2: kv = 5 tokens
    kv5 = jax.random.normal(key, (BF, 5, 768), dt)
    attn2 = Attention(C, heads, C // heads, dtype=dt)
    a2_flops = 2 * BF * L * C * C * 2 + 2 * BF * 5 * 768 * C * 2
    bench("attn2 audio (48,4096 q, 5 kv)",
          lambda: (attn2.init(key, x_seq, kv5), (x_seq, kv5)),
          lambda p, x, kv: attn2.apply(p, x, kv),
          a2_flops)


if __name__ == "__main__":
    main()
