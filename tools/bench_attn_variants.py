#!/usr/bin/env python
"""Head-dim padding experiment for the spatial flash attention (attn1 core).

The stock TPU flash kernel pads head_dim 40 -> 128 (3.2x QK/AV flops).
Candidates measured here at the production attn1 shape (48, 8, 4096, 40):

  flash_pad128   current production path (ops.flash.flash_sdpa)
  flash_pad64    same kernel, pad 40 -> 64 only
  flash_native   same kernel, no padding (D=40) if it compiles
  splash_native  splash-attention MHA at native D=40
  splash_pad64   splash at D=64
  xla_chunked    the non-pallas fallback (ops.attention.sdpa)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_variants.py
"""

import time

import numpy as np

PEAK_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    B, H, L, D = 48, 8, 4096, 40
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, L, D), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D), dt)
    scale = D**-0.5

    nominal_flops = 2 * 2 * B * H * L * L * D  # qk + av

    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    np.asarray(reduce(q))  # warm reducer

    # correctness reference on a (1, 1) batch/head slice only — the full
    # fp32 logits tensor would be 26 GB
    @jax.jit
    def ref_slice(q, k, v):
        qs, ks, vs = (t[:1, :1].astype(jnp.float32) for t in (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) * scale
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", w, vs)

    ref_out = np.asarray(ref_slice(q, k, v))
    print("reference slice ready", flush=True)

    def bench(name, fn, reps=10):
        try:
            f = jax.jit(fn)
            out = f(q, k, v)
            err = float(np.abs(np.asarray(out[:1, :1]).astype(np.float32) - ref_out).max())
            np.asarray(reduce(out))
            t0 = time.time()
            for _ in range(reps):
                out = f(q, k, v)
            np.asarray(reduce(out))
            dt_s = (time.time() - t0) / reps
            tf = nominal_flops / dt_s / 1e12
            print(f"{name:<16} {dt_s*1000:8.2f} ms  {tf:6.1f} TF/s  {tf/PEAK_TFLOPS:6.1%} MFU  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:<16} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- stock flash kernel at various paddings ---
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes, flash_attention

    def flash_at(d_target, bq=1024, bk=1024):
        def fn(q, k, v):
            pad = d_target - D
            if pad:
                p = ((0, 0), (0, 0), (0, 0), (0, pad))
                qp, kp, vp = jnp.pad(q, p), jnp.pad(k, p), jnp.pad(v, p)
            else:
                qp, kp, vp = q, k, v
            block = BlockSizes(
                block_q=min(bq, L), block_k_major=min(bk, L), block_k=min(bk, L),
                block_b=1,
                block_q_major_dkv=min(512, L), block_k_major_dkv=min(512, L),
                block_k_dkv=min(512, L), block_q_dkv=min(512, L),
                block_k_major_dq=min(512, L), block_k_dq=min(512, L),
                block_q_dq=min(512, L),
            )
            out = flash_attention(qp, kp, vp, causal=False, sm_scale=float(scale), block_sizes=block)
            return out[..., :D]
        return fn

    import os
    only_bb = os.environ.get("VEXPRESS_BENCH_ONLY_BB") == "1"

    if not only_bb:
        bench("flash_pad128", flash_at(128))
    bench("flash_native40", flash_at(40))
    if not only_bb:
        bench("flash_pad64", flash_at(64))

    # --- splash attention ---
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    def splash_at(d_target, bq=2048, bkv=1024):
        mask = sm.MultiHeadMask([sm.FullMask((L, L)) for _ in range(H)])
        block = sk.BlockSizes(
            block_q=min(bq, L), block_kv=min(bkv, L), block_kv_compute=min(bkv, L),
            block_q_dkv=min(512, L), block_kv_dkv=min(512, L),
            block_kv_dkv_compute=min(512, L), block_q_dq=min(512, L),
            block_kv_dq=min(512, L),
        )
        kernel = sk.make_splash_mha(mask, block_sizes=block, head_shards=1, q_seq_shards=1)

        def fn(q, k, v):
            pad = d_target - D
            if pad:
                p3 = ((0, 0), (0, 0), (0, 0), (0, pad))
                qp, kp, vp = jnp.pad(q, p3), jnp.pad(k, p3), jnp.pad(v, p3)
            else:
                qp, kp, vp = q, k, v
            # splash takes (H, L, D) per example; fold scale into q
            out = jax.vmap(kernel)(qp * scale, kp, vp)
            return out[..., :D]
        return fn

    if not only_bb:
        bench("splash_native40", splash_at(40))
        bench("splash_pad64", splash_at(64))
        bench("splash_bq4096", splash_at(40, bq=4096, bkv=2048))

    # --- repo's chunked-XLA fallback (ops.attention.sdpa, (B, L, H*D) layout) ---
    from vexpress_tpu.ops.attention import sdpa as xla_sdpa

    def xla_chunked(q, k, v):
        def fold(t):
            return t.transpose(0, 2, 1, 3).reshape(B, L, H * D)
        out = xla_sdpa(fold(q), fold(k), fold(v), H)
        return out.reshape(B, L, H, D).transpose(0, 2, 1, 3)

    if not only_bb:
        bench("xla_chunked", xla_chunked)

    # --- block_b > 1: more (batch, head) pairs per grid step. At D=40 each
    # q/k/v tile is tiny (1024x40 = 80 KB bf16), so the MXU work per grid
    # step is small relative to the fixed per-step pipeline overhead;
    # batching b·h into the tile amortizes it (VMEM check: the fp32 softmax
    # scratch is block_b * block_q * block_k * 4 B).
    def flash_bb(block_b, bq=1024, bk=1024):
        def fn(q, k, v):
            block = BlockSizes(
                block_q=min(bq, L), block_k_major=min(bk, L), block_k=min(bk, L),
                block_b=block_b,
                block_q_major_dkv=min(512, L), block_k_major_dkv=min(512, L),
                block_k_dkv=min(512, L), block_q_dkv=min(512, L),
                block_k_major_dq=min(512, L), block_k_dq=min(512, L),
                block_q_dq=min(512, L),
            )
            return flash_attention(q, k, v, causal=False, sm_scale=float(scale),
                                   block_sizes=block)
        return fn

    for bb in (2, 4):
        for bq, bk in ((1024, 1024), (2048, 1024), (512, 2048)):
            bench(f"flash_bb{bb}_q{bq}k{bk}", flash_bb(bb, bq, bk))


if __name__ == "__main__":
    main()
