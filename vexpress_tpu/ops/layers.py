"""Shared layers: GEGLU feed-forward, timestep embeddings, temporal PE.

Math parity targets (in /root/reference/):
  - FeedForward/GEGLU: diffusers FeedForward as used by modules/attention.py:375
  - get_timestep_embedding: diffusers Timesteps (modules/unet_3d.py:93,464-470)
  - TimestepEmbedding: linear_1 -> silu -> linear_2 (modules/unet_3d.py:96)
  - get_sinusoidal_positional_encoding: modules/motion_module.py:262-277
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch F.gelu to the working precision.

    In float32 use the exact erf form (bit-parity with the torch reference).
    In bfloat16 use the tanh approximation: its error (<4e-4 absolute) is
    below bf16 rounding (~8 mantissa bits), so the result is still correct to
    working precision — while erf costs 3.1 ms per SD-sized FeedForward on
    v5e vs 0.6 ms for tanh (tools: /tmp marginal-chain bench, round 2).
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2*inner, gate with exact GELU, project back.

    Torch key map: ff.net.0.proj -> net_0_proj ; ff.net.2 -> net_2
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.dim * self.mult)
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="net_2")(h)


class GeluFeedForward(nn.Module):
    """Perceiver-style FF: LayerNorm -> Linear(no bias) -> GELU -> Linear(no bias).

    Matches modules/audio_projection.py:79-86. Torch key map:
      ff.0 (LayerNorm) -> norm ; ff.1 -> fc1 ; ff.3 -> fc2
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.dim * self.mult)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers `Timesteps` semantics)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP on the sinusoidal embedding (torch: time_embedding.linear_{1,2})."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear_1")(sample)
        sample = jax.nn.silu(sample)
        return nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear_2")(sample)


def get_sinusoidal_positional_encoding(d_model: int, max_len: int) -> np.ndarray:
    """Temporal positional encoding table [1, max_len, d_model] (AnimateDiff PE)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe = np.zeros((1, max_len, d_model), dtype=np.float32)
    pe[0, :, 0::2] = np.sin(position * div_term)
    pe[0, :, 1::2] = np.cos(position * div_term)
    return pe
