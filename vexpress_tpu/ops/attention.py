"""Multi-head attention primitives.

The four attention flavors of the V-Express stack (spatial self-attention,
reference KV injection `attn1_5`, audio cross-attention `attn2`, and temporal
motion attention) all reduce to this one batched softmax-attention core
(reference math: diffusers `Attention` as used in
/root/reference/modules/attention.py:321-395 and
/root/reference/modules/motion_module.py:280-388).

Layout is (batch, seq, channels); heads are folded into the batch only inside
the kernel so XLA sees large, MXU-friendly matmuls. Softmax runs in float32
regardless of the compute dtype (TPU bf16-safe).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# chunk the query axis when the full logits tensor would exceed this many
# elements per (batch*heads) — keeps peak attention memory bounded instead of
# materializing (B, H, Lq, Lk) (XLA does not do flash attention on its own;
# at 512x512 the spatial blocks would otherwise need ~13 GB of logits)
_Q_CHUNK_LOGIT_BUDGET = 1 << 21

# The Pallas TPU flash-attention kernel (ops.flash) is 2.4x faster than the
# chunked XLA path for the spatial attention shapes (measured on v5e); on by
# default on TPU, disable with VEXPRESS_FLASH=0.
import os as _os

_USE_FLASH = _os.environ.get("VEXPRESS_FLASH", "1") == "1"

# Read ONCE at import time: jit caches key on the traced program, so flipping
# the env var mid-process would silently not affect already-compiled shapes.
# Set VEXPRESS_TEMPORAL_FOLDED=0 BEFORE importing vexpress_tpu to restore the
# reference-shaped (b f) d c -> (b d) f c rearrange path. Tests may
# monkeypatch this module attribute (and must then avoid reusing jit caches).
TEMPORAL_FOLDED = _os.environ.get("VEXPRESS_TEMPORAL_FOLDED", "1") == "1"


def _flash_eligible(lq: int, lk: int) -> bool:
    if not _USE_FLASH:
        return False
    try:
        import jax.extend.backend as _jeb

        if _jeb.get_backend().platform != "tpu":
            return False
    except Exception:
        return False
    from .flash import flash_supported

    return flash_supported(lq, lk) and lk >= 512


def _attend(q, k, v, scale):
    """(B, Lq, H, D) x (B, Lk, H, D) -> (B, Lq, H, D), fp32 softmax."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _attend_tiny_kv(q, k, v, scale):
    """Exact attention for very short KV (audio cross-attn attn2: 5 tokens).

    The einsum path materializes (B, H, Lq, Lk) logits with Lk padded to 128
    lanes (25x memory for Lk=5, ~GBs of padded fp32 traffic at SD shapes).
    Unrolling the Lk axis keeps everything at (B, Lq, H*D)-shaped elementwise
    ops: logits as per-token reductions, output as a weighted sum of value
    rows. Softmax still in fp32.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    # logits[:, :, h, j] = sum_d q[b,l,h,d] * k[b,j,h,d]
    logits = [
        jnp.sum(qf * kf[:, j][:, None], axis=-1) * scale  # (B, Lq, H)
        for j in range(lk)
    ]
    m = logits[0]
    for j in range(1, lk):
        m = jnp.maximum(m, logits[j])
    exps = [jnp.exp(l - m) for l in logits]
    denom = exps[0]
    for j in range(1, lk):
        denom = denom + exps[j]
    out = jnp.zeros((b, lq, h, d), jnp.float32)
    for j in range(lk):
        w_j = (exps[j] / denom)[..., None]  # (B, Lq, H, 1)
        out = out + w_j * v[:, j].astype(jnp.float32)[:, None]
    return out.astype(v.dtype)


def _attend_short(q, k, v, scale):
    """Same math as `_attend` for short sequences (temporal motion attention:
    Lq = Lk = frames <= 32, huge batch). Per-head lane slices (each head's
    q/k/v is a contiguous 40-lane slice of the packed layout) measured
    fastest on v5e: 11.3 ms vs 14.0 ms for heads-folded-into-batch (which
    pays 4 transposes of the full tensor) and 17.9 ms for the bhqk einsum —
    bit-identical outputs (round-2 motion-variant bench)."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    outs = []
    for i in range(h):
        qh, kh, vh = q[:, :, i], k[:, :, i], v[:, :, i]  # (b, L, d) lane slices
        logits = jnp.einsum("bqd,bkd->bqk", qh, kh, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bqk,bkd->bqd", weights, vh))
    return jnp.stack(outs, axis=2)  # (b, lq, h, d)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: Optional[float] = None,
    q_chunk: Optional[int] = None,
) -> jax.Array:
    """Scaled dot-product attention over (B, L, H*D) tensors.

    Softmax statistics are computed in float32; output is cast back to the
    input dtype. Equivalent to torch.nn.functional.scaled_dot_product_attention
    on (B, H, L, D) with default scale. Long query sequences are processed in
    chunks (exact — each chunk sees the full KV length) to bound memory.
    """
    b, lq, inner = q.shape
    lk = k.shape[1]
    d = inner // heads
    if scale is None:
        scale = d**-0.5

    if q_chunk is None and _flash_eligible(lq, lk):
        from .flash import flash_sdpa

        return flash_sdpa(q, k, v, heads, scale)

    q = q.reshape(b, lq, heads, d)
    k = k.reshape(b, lk, heads, d)
    v = v.reshape(b, lk, heads, d)

    if q_chunk is None:
        # bound the fp32 logits transient (b, heads, chunk, lk) to ~1 GB while
        # keeping each chunk a large batched matmul — the budget must account
        # for batch*heads or small-batch grouped-query attention (attn1_5)
        # degenerates into hundreds of serialized tiny chunks
        budget_elems = 1 << 28
        if b * heads * lq * lk > budget_elems:
            q_chunk = max(128, budget_elems // max(b * heads * lk, 1))
        else:
            q_chunk = lq

    if q_chunk >= lq:
        # shape-specialized layouts (bisection kill-switches via env)
        if lk <= 8 and lq > 64 and _os.environ.get("VEXPRESS_TINY_KV", "1") == "1":
            attend = _attend_tiny_kv
        elif lq <= 64 and lk <= 64 and _os.environ.get("VEXPRESS_SHORT_ATTEND", "1") == "1":
            attend = _attend_short
        else:
            attend = _attend
        out = attend(q, k, v, scale)
        return out.reshape(b, lq, inner)

    n_chunks = -(-lq // q_chunk)
    pad = n_chunks * q_chunk - lq
    if pad:
        q = jnp.concatenate([q, jnp.zeros((b, pad, heads, d), q.dtype)], axis=1)
    qc = q.reshape(b, n_chunks, q_chunk, heads, d).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(lambda qi: _attend(qi, k, v, scale), qc)
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, n_chunks * q_chunk, inner)
    return out[:, :lq]


class Attention(nn.Module):
    """Multi-head attention mirroring diffusers `Attention`.

    Parameter names map 1:1 onto torch checkpoint keys:
      to_q/to_k/to_v (no bias), to_out_0 (bias)  <->  to_q/to_k/to_v/to_out.0
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None  # informational; kv dim inferred
    qkv_bias: bool = False
    out_bias: bool = True
    # zero-init to_out kernel (reference zero-inits attn2/attn_temp output
    # projections at construction, modules/attention.py:361, :389)
    out_kernel_zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        zero_kv_first_half: bool = False,
        temporal_frames: Optional[int] = None,
    ) -> jax.Array:
        kv = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        inner = self.heads * self.dim_head
        dense = functools.partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        to_q = dense(inner, use_bias=self.qkv_bias, name="to_q")
        to_k = dense(inner, use_bias=self.qkv_bias, name="to_k")
        to_v = dense(inner, use_bias=self.qkv_bias, name="to_v")
        out_kw = dict(kernel_init=nn.initializers.zeros) if self.out_kernel_zero_init else {}
        to_out = dense(self.query_dim, use_bias=self.out_bias, name="to_out_0", **out_kw)

        if temporal_frames is not None:
            # Temporal (motion) self-attention WITHOUT the module-level
            # (b f) d c -> (b d) f c rearrange: input stays (b*f, d, c); the
            # projections run as large clean matmuls in that layout and the
            # frame permutation rides inside the per-head attention einsums
            # (batch dims (b, d)). Measured at the @64 production shape
            # (b*f=48, d=4096, c=320): 10.36 ms vs 12.19 ms per attention
            # block for rearrange + lane-slice sdpa — the 4 materialized
            # full-tensor transposes per block were ~15% of its cost
            # (/tmp-r3 motion_variant experiment; same math, <=1 bf16 ulp).
            # Kill switch: VEXPRESS_TEMPORAL_FOLDED=0 restores the rearrange
            # path (models/motion_module.py).
            assert encoder_hidden_states is None and not zero_kv_first_half
            f = temporal_frames
            bf, d_tok, _ = hidden_states.shape
            b = bf // f
            scale = self.dim_head**-0.5
            q, k, v = to_q(hidden_states), to_k(hidden_states), to_v(hidden_states)
            outs = []
            for i in range(self.heads):
                sl = slice(i * self.dim_head, (i + 1) * self.dim_head)
                qh = q[:, :, sl].reshape(b, f, d_tok, self.dim_head)
                kh = k[:, :, sl].reshape(b, f, d_tok, self.dim_head)
                vh = v[:, :, sl].reshape(b, f, d_tok, self.dim_head)
                logits = jnp.einsum("bqde,bkde->bdqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
                outs.append(jnp.einsum("bdqk,bkde->bqde", w, vh))
            o = jnp.stack(outs, axis=3).reshape(bf, d_tok, inner)
            return to_out(o)

        def attend(hs, kv_):
            q, k, v = to_q(hs), to_k(kv_), to_v(kv_)
            if k.shape[0] != q.shape[0]:
                # KV shared across a folded query axis (e.g. reference KV
                # shared by all frames of a video): group the queries instead
                # of materializing KV copies. Exact — softmax normalizes over
                # the KV length only.
                bq, lq, _ = q.shape
                bkv = k.shape[0]
                assert bq % bkv == 0, f"query batch {bq} not a multiple of kv batch {bkv}"
                g = bq // bkv
                out = sdpa(q.reshape(bkv, g * lq, inner), k, v, self.heads)
                return out.reshape(bq, lq, inner)
            return sdpa(q, k, v, self.heads)

        if zero_kv_first_half:
            # CFG fast path (classifier-free guidance batches [uncond; cond]):
            # the unconditional half's KV inputs are all-zero (zero reference
            # banks / zero audio tokens, pipeline.py CFG concat). With
            # bias-free to_k/to_v, K = V = 0 exactly: softmax over zero logits
            # is uniform, its product with V = 0 is zero, so the module output
            # for that half is just to_out's bias — skip its projections and
            # attention entirely. Bit-identical to the full computation.
            assert not self.qkv_bias, "zero-KV shortcut requires bias-free to_k/to_v"
            bq, bkv = hidden_states.shape[0], kv.shape[0]
            assert bq % 2 == 0 and bkv % 2 == 0, (bq, bkv)
            out_c = to_out(attend(hidden_states[bq // 2 :], kv[bkv // 2 :]))
            bias_row = to_out(jnp.zeros((1, 1, inner), out_c.dtype))
            out_u = jnp.broadcast_to(bias_row, out_c.shape)
            return jnp.concatenate([out_u, out_c], axis=0)

        return to_out(attend(hidden_states, kv))
