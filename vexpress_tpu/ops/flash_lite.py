"""Lean Pallas TPU flash-attention forward for the V-Express spatial shapes.

Why not the stock `jax.experimental.pallas.ops.tpu.flash_attention`? Measured
on v5e at the production attn1 shape (48, 8, 4096, 40), the stock kernel runs
~30.5 ms against a ~16.8 ms padded-MXU floor; the gap is mostly float32
softmax VPU work (6.4e9 exps + running-stat corrections) serialized against
the MXU. This kernel is specialized for what the pipeline actually needs —
non-causal, no masks/segments, head_dim 40/80/160, forward only — and
computes the exp in bfloat16 *after* max subtraction (error ~0.4% relative,
the order of bf16 output rounding). Running max/sum and the accumulator stay
float32.

MEASURED RESULT (v5e, attn1 shape 48x8x4096x40): 33.6 ms vs stock 30.6 ms —
SLOWER. The bf16 exp did not help: the stock kernel is not softmax-bound;
~55% of padded-MXU roofline appears to be the practical ceiling for this
algorithm/shape. Kept (off by default, VEXPRESS_FLASH_LITE=1) as the recorded
experiment so the next round doesn't re-learn this; the production path stays
on the stock kernel at native head dim (ops.flash).

Reference role: xformers memory_efficient_attention (SURVEY §2.4 row 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, sm_scale: float):
    # q_ref: (1, BQ, D) for one (b*h, qblock); k_ref/v_ref: (1, Lk, D)
    _, bq, d = q_ref.shape
    lk = k_ref.shape[1]
    q = q_ref[0] * jnp.asarray(sm_scale, q_ref.dtype)

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * bk, bk), :]
        vb = v_ref[0, pl.ds(i * bk, bk), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) f32 logits
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        # bf16 exp: s - m_new <= 0 so p in (0, 1]; see module docstring
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc = acc * corr + pv
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, lk // bk, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "interpret")
)
def flash_lite_fwd(
    q: jax.Array,  # (B, H, Lq, D)
    k: jax.Array,  # (B, H, Lk, D)
    v: jax.Array,
    sm_scale: float,
    block_q: int = 2048,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(block_q, lq)
    bk = min(block_k, lk)
    assert lq % bq == 0 and lk % bk == 0, (lq, lk, bq, bk)

    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)

    grid = (b * h, lq // bq)
    kernel = functools.partial(_fwd_kernel, bk=bk, sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, g: (i, g, 0)),
            pl.BlockSpec((1, lk, d), lambda i, g: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, g: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, g: (i, g, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, lq, d)
