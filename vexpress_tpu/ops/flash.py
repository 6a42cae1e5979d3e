"""Pallas TPU flash attention wrapper for the spatial attention flavors.

Wraps jax's fused TPU flash-attention kernel (online softmax in VMEM — no
(Lq, Lk) logits in HBM) for the shapes V-Express produces:

  spatial self-attn:   Lq = Lk = (latent h*w), head dims 40/80/160
  reference attn1_5:   Lq = frames * h*w (grouped queries), Lk = h*w

Head dims run NATIVE (40/80/160) — measured on v5e, zero-padding the head
dim to the 128-lane boundary is strictly slower (D=40 at L=4096:
37.0 ms padded vs 30.5 ms native, tools/bench_attn_variants.py): Mosaic
already lane-pads tiles internally, so explicit padding only adds HBM
traffic. Set VEXPRESS_FLASH_PAD=128 to restore the old behavior. Sequence
lengths must be multiples of the 128 block size; the caller falls back to
chunked XLA attention otherwise (ops.attention.sdpa).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# tuning/bisection knobs (defaults = measured v5e optimum, see below)
_BQ = int(os.environ.get("VEXPRESS_FLASH_BQ", "1024"))
_BK = int(os.environ.get("VEXPRESS_FLASH_BK", "1024"))
# 0 = native head dim (fastest, default); set to 128 to force lane padding
_DPAD = int(os.environ.get("VEXPRESS_FLASH_PAD", "0"))
# inference-only lean kernel (ops.flash_lite): bf16-exp online softmax.
# Forward-only — enable in inference processes (cli/infer.py, bench.py);
# keep off for training (no backward rule).
_LITE = os.environ.get("VEXPRESS_FLASH_LITE", "0") == "1"


def flash_supported(lq: int, lk: int) -> bool:
    return lq % 128 == 0 and lk % 128 == 0 and lq >= 128 and lk >= 128


@functools.partial(jax.jit, static_argnames=("heads", "scale"))
def flash_sdpa(
    q: jax.Array,  # (B, Lq, H*D)
    k: jax.Array,  # (B, Lk, H*D)
    v: jax.Array,
    heads: int,
    scale: Optional[float] = None,
) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes, flash_attention

    b, lq, inner = q.shape
    lk = k.shape[1]
    d = inner // heads
    if scale is None:
        scale = d**-0.5

    def split(t, l):
        return t.reshape(b, l, heads, d).transpose(0, 2, 1, 3)  # (B, H, L, D)

    qh, kh, vh = split(q, lq), split(k, lk), split(v, lk)

    if _LITE and lq % min(2048, lq) == 0 and lk % min(512, lk) == 0 and d % 8 == 0:
        from .flash_lite import flash_lite_fwd

        out = flash_lite_fwd(qh, kh, vh, float(scale))
        return out.transpose(0, 2, 1, 3).reshape(b, lq, inner)

    # sublane alignment only (d is 40/80/160 in practice — already aligned);
    # zero Q/K columns do not change logits, zero V columns are sliced off
    d_pad = (-d % _DPAD) if _DPAD else (-d % 8)
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)

    # block sizes tuned on v5e at SD 512x512 shapes (tools/microbench_ops.py):
    # 1024/1024 is ~6% faster than 512/512; 2048/1024 is another ~3% faster
    # but OOMs scoped VMEM in the DIFFERENTIATED kernel (training's forward
    # additionally carries fp32 softmax stats) — 1024 is the safe optimum.
    block = BlockSizes(
        block_q=min(_BQ, lq),
        block_k_major=min(_BK, lk),
        block_k=min(_BK, lk),
        block_b=1,
        block_q_major_dkv=min(512, lq),
        block_k_major_dkv=min(512, lk),
        block_k_dkv=min(512, lk),
        block_q_dkv=min(512, lq),
        block_k_major_dq=min(512, lk),
        block_k_dq=min(512, lk),
        block_q_dq=min(512, lq),
    )
    out = flash_attention(qh, kh, vh, causal=False, sm_scale=float(scale), block_sizes=block)
    out = out[..., :d]  # drop padded head-dim columns
    return out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
