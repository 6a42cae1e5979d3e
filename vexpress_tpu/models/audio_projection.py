"""Audio Projection: perceiver resampler turning 10 wav2vec2 frame embeddings
into 5 audio tokens per video frame.

Reference: modules/audio_projection.py — learned latents, learned positional
embedding on the inputs, `depth` layers of PerceiverAttention
(kv = concat(x, latents), double-sqrt scale, fp32 softmax) + LayerNorm-GELU FF,
then proj_out + LayerNorm. V-Express config (inference.py:116-126): dim=768,
depth=4, dim_head=64, heads=12, num_queries=5, embedding_dim=768,
output_dim=768, ff_mult=4, max_seq_len=10.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import GeluFeedForward


class PerceiverAttention(nn.Module):
    """modules/audio_projection.py:32-76. Queries from latents; keys/values from
    concat(x, latents). Logits scaled by dim_head**-0.5 split as two sqrt-sqrt
    factors (applied to q and k) for fp16 stability — same math."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        inner = self.dim_head * self.heads
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        norm = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        x = norm("norm1")(x)
        latents = norm("norm2")(latents)

        b, l, _ = latents.shape
        q = dense(inner, "to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = dense(inner * 2, "to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return dense(self.dim, "to_out")(out)


class AudioProjection(nn.Module):
    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 5
    embedding_dim: int = 768
    output_dim: int = 768
    ff_mult: int = 4
    max_seq_len: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (N, seq<=max_seq_len, embedding_dim) -> (N, num_queries, output_dim)."""
        n, seq, _ = x.shape
        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(1.0), (self.max_seq_len, self.embedding_dim), jnp.float32
        )
        latents_init = self.param(
            "latents", nn.initializers.normal(self.dim**-0.5), (1, self.num_queries, self.dim), jnp.float32
        )

        x = x.astype(self.dtype) + pos_emb[None, :seq].astype(self.dtype)
        latents = jnp.broadcast_to(latents_init.astype(self.dtype), (n, self.num_queries, self.dim))
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(x)

        for i in range(self.depth):
            latents = (
                PerceiverAttention(self.dim, self.dim_head, self.heads, dtype=self.dtype, name=f"layers_{i}_attn")(
                    x, latents
                )
                + latents
            )
            latents = GeluFeedForward(self.dim, self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(latents) + latents

        latents = nn.Dense(self.output_dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm_out")(latents)
