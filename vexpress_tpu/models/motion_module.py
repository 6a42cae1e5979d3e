"""AnimateDiff-style temporal motion module.

Rebuilds /root/reference/modules/motion_module.py (VanillaTemporalModule →
TemporalTransformer3DModel → TemporalTransformerBlock → VersatileAttention):
per-pixel attention across frames with sinusoidal temporal position encoding.

TPU mapping: the (b f) d c -> (b d) f c rearrange becomes a reshape/transpose
that XLA fuses; attention runs as one batched matmul over B*H*W sequences of
length F (<= max_len=32), which tiles cleanly onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as _attention_mod
from ..ops.attention import Attention
from ..ops.layers import FeedForward, get_sinusoidal_positional_encoding
from .blocks import group_norm


class TemporalTransformerBlock(nn.Module):
    """Two Temporal_Self attention sublayers + GEGLU FF (motion_module.py:185-259)."""

    dim: int
    heads: int
    max_len: int
    num_attention_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, frames: int) -> jax.Array:
        if frames > self.max_len:
            raise ValueError(
                f"temporal attention got {frames} frames but "
                f"temporal_position_encoding_max_len={self.max_len}; split the video "
                f"into context windows of <= {self.max_len} frames (pipelines.context)."
            )
        bf, d, c = x.shape
        b = bf // frames
        pe = jnp.asarray(get_sinusoidal_positional_encoding(self.dim, self.max_len), dtype=self.dtype)

        # Transpose-free path (default): keep tokens in (b*f, d, c), add the
        # positional encoding by broadcasting pe[frame-of-row] over d, and let
        # Attention's temporal mode carry the frame permutation inside its
        # einsum batch dims — drops 4 materialized full-tensor transposes per
        # attention block (measured 15% of the block at @64; ops/attention.py).
        # VEXPRESS_TEMPORAL_FOLDED=0 restores the reference-shaped rearrange.
        folded = _attention_mod.TEMPORAL_FOLDED  # read once at import, see ops/attention.py
        for i in range(self.num_attention_blocks):
            n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=f"norms_{i}")(x)
            attn = Attention(
                self.dim, self.heads, self.dim // self.heads, dtype=self.dtype, name=f"attention_blocks_{i}"
            )
            if folded:
                pe_rows = jnp.tile(pe[0, :frames], (b, 1))[:, None, :]  # (b*f, 1, c)
                a = attn(n + pe_rows, temporal_frames=frames)
            else:
                # (b f) d c -> (b d) f c  (motion_module.py:360-363)
                n = n.reshape(b, frames, d, c).transpose(0, 2, 1, 3).reshape(b * d, frames, c)
                n = n + pe[:, :frames]
                a = attn(n)
                a = a.reshape(b, d, frames, c).transpose(0, 2, 1, 3).reshape(bf, d, c)
            x = x + a

        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ff_norm")(x)
        )
        return x


class TemporalTransformer3D(nn.Module):
    """norm -> proj_in -> temporal blocks -> proj_out + residual
    (motion_module.py:94-182). proj_out is zero-initialized (ibid:72-74) so an
    untrained module is the identity."""

    in_channels: int
    heads: int = 8
    num_transformer_block: int = 1
    max_len: int = 32
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, frames: int) -> jax.Array:
        # x: (B*F, H, W, C)
        n, h, w, c = x.shape
        residual = x

        hs = group_norm(self.groups, 1e-6, "norm", self.dtype)(x)
        hs = hs.reshape(n, h * w, c)
        hs = nn.Dense(self.in_channels, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(hs)

        for i in range(self.num_transformer_block):
            hs = TemporalTransformerBlock(
                self.in_channels, self.heads, self.max_len, dtype=self.dtype, name=f"transformer_blocks_{i}"
            )(hs, frames)

        hs = nn.Dense(
            self.in_channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
        )(hs)
        return hs.reshape(n, h, w, c) + residual


class TemporalMotionModule(nn.Module):
    """VanillaTemporalModule wrapper (motion_module.py:44-91); torch key prefix
    `motion_modules.{j}.temporal_transformer` maps to child `temporal_transformer`."""

    in_channels: int
    heads: int = 8
    num_transformer_block: int = 1
    max_len: int = 32
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, frames: int) -> jax.Array:
        return TemporalTransformer3D(
            self.in_channels,
            self.heads,
            self.num_transformer_block,
            self.max_len,
            groups=self.groups,
            dtype=self.dtype,
            name="temporal_transformer",
        )(x, frames)
