#!/usr/bin/env python
"""Temporal (motion) attention formulation sweep at the @64 production shape.

The motion module's attention is 65k tiny (24x40)x(40x24) dots — 12% MFU at
64x64 (PERFORMANCE.md per-block table), the single least-efficient hot op
left. Round-2/3 attempts (pallas per-head batched dot, folded-into-batch,
block-diag packing) matched XLA at best. This measures whether a VPU
formulation — unrolling the 24-frame key axis into elementwise
multiply-reduce ops, like ops.attention._attend_tiny_kv does for the 5-token
audio attention — beats the batched-matmul form: the total attention flops
are only ~6 GFLOP, so if XLA fuses the unrolled ops into one traversal the op
becomes pure-bandwidth (~1 GB of traffic, ~1.3 ms roofline) instead of
MXU-grid-overhead-bound.

Variants, all bit-comparable (fp32 softmax), layout (b*f, d, h*c) in/out:
  prod_folded    current production path (Attention temporal_frames branch:
                 per-head einsum, frame permutation inside batch dims)
  einsum_auto    one 5D einsum, heads as a named axis (no python loop)
  unroll_kf      key-frame-unrolled VPU reduce (tiny-kv style, 24 slices)
  unroll_kf_bf16 same with bf16 elementwise products (fp32 softmax stats)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_motion_variants.py
"""

import time

import numpy as np

PEAK_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    b, f, d_tok, h, dd = 2, 24, 4096, 8, 40
    inner = h * dd
    dt = jnp.bfloat16
    scale = dd**-0.5
    key = jax.random.PRNGKey(0)
    # post-projection q/k/v in the folded layout the module uses
    q = jax.random.normal(key, (b * f, d_tok, inner), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (b * f, d_tok, inner), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (b * f, d_tok, inner), dt)

    attn_flops = 2 * 2 * b * d_tok * h * f * f * dd  # qk + av

    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    np.asarray(reduce(q))

    def prod_folded(q, k, v):
        outs = []
        for i in range(h):
            sl = slice(i * dd, (i + 1) * dd)
            qh = q[:, :, sl].reshape(b, f, d_tok, dd)
            kh = k[:, :, sl].reshape(b, f, d_tok, dd)
            vh = v[:, :, sl].reshape(b, f, d_tok, dd)
            logits = jnp.einsum("bqde,bkde->bdqk", qh, kh,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
            outs.append(jnp.einsum("bdqk,bkde->bqde", w, vh))
        return jnp.stack(outs, axis=3).reshape(b * f, d_tok, inner)

    def einsum_auto(q, k, v):
        q5 = q.reshape(b, f, d_tok, h, dd)
        k5 = k.reshape(b, f, d_tok, h, dd)
        v5 = v.reshape(b, f, d_tok, h, dd)
        logits = jnp.einsum("bqdhe,bkdhe->bdhqk", q5, k5,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        o = jnp.einsum("bdhqk,bkdhe->bqdhe", w, v5)
        return o.reshape(b * f, d_tok, inner)

    def unroll_kf(q, k, v, prod_dt=jnp.float32):
        q5 = q.reshape(b, f, d_tok, h, dd).astype(prod_dt)
        k5 = k.reshape(b, f, d_tok, h, dd).astype(prod_dt)
        v5 = v.reshape(b, f, d_tok, h, dd)
        # logits[j] = sum_e q * k_j  -> (b, f, d, h), one slice per key frame
        logits = [
            (jnp.sum(q5 * k5[:, j][:, None], axis=-1).astype(jnp.float32) * scale)
            for j in range(f)
        ]
        m = logits[0]
        for j in range(1, f):
            m = jnp.maximum(m, logits[j])
        exps = [jnp.exp(l - m) for l in logits]
        denom = exps[0]
        for j in range(1, f):
            denom = denom + exps[j]
        out = jnp.zeros((b, f, d_tok, h, dd), jnp.float32)
        for j in range(f):
            w_j = (exps[j] / denom)[..., None]
            out = out + w_j * v5[:, j].astype(jnp.float32)[:, None]
        return out.astype(v.dtype).reshape(b * f, d_tok, inner)

    ref = None

    def bench(name, fn, reps=8):
        nonlocal ref
        try:
            fj = jax.jit(fn)
            out = fj(q, k, v)
            a = np.asarray(out[:1, :256]).astype(np.float32)
            if ref is None:
                ref = a
                err = 0.0
            else:
                err = float(np.abs(a - ref).max())
            np.asarray(reduce(out))
            t0 = time.time()
            for _ in range(reps):
                out = fj(q, k, v)
            np.asarray(reduce(out))
            dt_s = (time.time() - t0) / reps
            tf = attn_flops / dt_s / 1e12
            print(f"{name:<16} {dt_s*1000:8.2f} ms  {tf:5.2f} TF/s "
                  f"({tf/PEAK_TFLOPS:5.1%} MFU of real flops)  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:<16} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    bench("prod_folded", prod_folded)
    bench("einsum_auto", einsum_auto)
    bench("unroll_kf", unroll_kf)
    bench("unroll_kf_bf16", lambda q, k, v: unroll_kf(q, k, v, prod_dt=jnp.bfloat16))


if __name__ == "__main__":
    main()
