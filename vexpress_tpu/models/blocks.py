"""UNet building blocks, channels-last (N, H, W, C), frames folded into batch.

The reference's "3D" ops are per-frame 2D ops (InflatedConv3d / InflatedGroupNorm,
/root/reference/modules/resnet.py:9-28), so both the 2D reference net and the 3D
denoising net share these spatial blocks; time mixing lives exclusively in
`motion_module.TemporalMotionModule`.

Reference-net KV injection is explicit here: `BasicTransformerBlock` *returns*
the norm2 hidden state ("bank" feature) and `TemporalBasicTransformerBlock`
*takes* it as an argument — replacing the forward monkey-patching of
/root/reference/modules/mutual_self_attention.py:101-284 with functional
plumbing (same math).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as _attention_mod
from ..ops.attention import Attention
from ..ops.layers import FeedForward


def group_norm(groups: int, eps: float, name: str, dtype=jnp.float32) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype, param_dtype=jnp.float32, name=name)


def conv(features: int, kernel: int, name: str, stride: int = 1, padding: int = 1, dtype=jnp.float32) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ResnetBlock(nn.Module):
    """GroupNorm-SiLU-Conv x2 with timestep-embedding add (diffusers ResnetBlock2D,
    reference: modules/resnet.py:123-251, time_embedding_norm="default")."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        h = group_norm(self.groups, self.eps, "norm1", self.dtype)(x)
        h = jax.nn.silu(h)
        h = conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32, name="time_emb_proj")(
                jax.nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = group_norm(self.groups, self.eps, "norm2", self.dtype)(h)
        h = jax.nn.silu(h)
        h = conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)
        if in_channels != self.out_channels:
            x = conv(self.out_channels, 1, "conv_shortcut", padding=0, dtype=self.dtype)(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv (modules/resnet.py:93-120)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv(self.out_channels, 3, "conv", stride=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv (modules/resnet.py:31-90)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv(self.out_channels, 3, "conv", dtype=self.dtype)(x)


class BasicTransformerBlock(nn.Module):
    """Reference-net block: self-attn, (bank capture), cross-attn, GEGLU FF.

    Returns (hidden_states, bank) where bank = norm2(hidden) is the feature
    the denoising net's attn1_5 attends to (mutual_self_attention.py:159-165).
    """

    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, encoder_hidden_states: jax.Array) -> Tuple[jax.Array, jax.Array]:
        attn = lambda name: Attention(self.dim, self.heads, self.dim_head, dtype=self.dtype, name=name)
        norm = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        x = x + attn("attn1")(norm("norm1")(x))
        bank = norm("norm2")(x)
        x = x + attn("attn2")(bank, encoder_hidden_states)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(norm("norm3")(x))
        return x, bank


class TemporalBasicTransformerBlock(nn.Module):
    """Denoising-net block: self-attn, reference attn1_5, audio attn2, FF,
    optional attn_temp.

    Math follows the "read"-mode hacked forward
    (mutual_self_attention.py:176-248): attn1 is plain self-attention, attn1_5
    attends to the reference bank scaled by `ref_scale`, attn2 cross-attends
    to audio tokens scaled by `audio_scale`. The optional attn_temp branch
    (modules/attention.py:380-395, :466-479: post-FF per-pixel self-attention
    across frames, zero-init output projection, no position encoding) is
    disabled in V-Express configs (inference_v2.yaml:4) but built when
    `use_temporal_attention` is set.
    """

    dim: int
    heads: int
    dim_head: int
    use_temporal_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        audio_kv: jax.Array,
        ref_kv: Optional[jax.Array],  # None: plain unfused forward (midup down blocks)
        ref_scale: jax.Array,
        audio_scale: jax.Array,
        zero_uncond_kv: bool = False,
        frames: int = 1,
    ) -> jax.Array:
        attn = lambda name: Attention(self.dim, self.heads, self.dim_head, dtype=self.dtype, name=name)
        norm = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        x = x + attn("attn1")(norm("norm1")(x))
        # audio attn2 output projection is zero-initialized at construction
        # (attention.py:361) — a fresh model's audio branch starts inert
        attn2 = Attention(self.dim, self.heads, self.dim_head, out_kernel_zero_init=True,
                          dtype=self.dtype, name="attn2")
        if ref_kv is None:
            # Outside the fusion set (fusion_blocks="midup", mutual_self_
            # attention.py:286-294): the reference's PLAIN forward runs
            # (modules/attention.py:396-479) — attn1_5 self-attends its own
            # norm1_5 output and neither branch is weight-scaled. The audio
            # attn2 zero-KV CFG shortcut still applies (uncond audio tokens
            # are zero regardless of fusion mode).
            x = x + attn("attn1_5")(norm("norm1_5")(x))
            x = x + attn2(norm("norm2")(x), audio_kv, zero_kv_first_half=zero_uncond_kv)
        else:
            x = x + ref_scale * attn("attn1_5")(norm("norm1_5")(x), ref_kv, zero_kv_first_half=zero_uncond_kv)
            x = x + audio_scale * attn2(norm("norm2")(x), audio_kv, zero_kv_first_half=zero_uncond_kv)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(norm("norm3")(x))
        if self.use_temporal_attention:
            # per-pixel attention over frames (attention.py:466-479); LayerNorm
            # commutes with the (b f) d c <-> (b d) f c permutation, so the
            # transpose-free temporal mode applies here too (ops/attention.py)
            attn_temp = Attention(
                self.dim, self.heads, self.dim_head, out_kernel_zero_init=True,
                dtype=self.dtype, name="attn_temp",
            )
            if _attention_mod.TEMPORAL_FOLDED:  # read once at import, see ops/attention.py
                x = x + attn_temp(norm("norm_temp")(x), temporal_frames=frames)
            else:
                bf, d, c = x.shape
                b = bf // frames
                xt = x.reshape(b, frames, d, c).transpose(0, 2, 1, 3).reshape(b * d, frames, c)
                a = attn_temp(norm("norm_temp")(xt))
                xt = xt + a
                x = xt.reshape(b, d, frames, c).transpose(0, 2, 1, 3).reshape(bf, d, c)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 conv in -> transformer blocks -> 1x1 conv out + residual.

    Covers both Transformer2DModel (modules/transformer_2d.py:35) and
    Transformer3DModel (modules/transformer_3d.py:27) with
    use_linear_projection=False (SD1.5). `temporal=True` builds
    TemporalBasicTransformerBlocks (denoising net), else BasicTransformerBlocks
    (reference net, which also emits bank features).
    """

    in_channels: int
    heads: int
    depth: int = 1
    temporal: bool = False
    use_temporal_attention: bool = False
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_hidden_states: jax.Array,
        ref_kv: Optional[Tuple[jax.Array, ...]] = None,
        ref_scale: Optional[jax.Array] = None,
        audio_scale: Optional[jax.Array] = None,
        zero_uncond_kv: bool = False,
        frames: int = 1,
    ):
        n, h, w, c = x.shape
        dim_head = self.in_channels // self.heads
        residual = x

        hs = group_norm(self.groups, 1e-6, "norm", self.dtype)(x)
        hs = conv(self.in_channels, 1, "proj_in", padding=0, dtype=self.dtype)(hs)
        hs = hs.reshape(n, h * w, self.in_channels)

        banks = []
        for i in range(self.depth):
            if self.temporal:
                hs = TemporalBasicTransformerBlock(
                    self.in_channels, self.heads, dim_head,
                    use_temporal_attention=self.use_temporal_attention,
                    dtype=self.dtype, name=f"transformer_blocks_{i}"
                )(hs, encoder_hidden_states,
                  None if ref_kv is None else ref_kv[i], ref_scale, audio_scale,
                  zero_uncond_kv, frames)
            else:
                hs, bank = BasicTransformerBlock(
                    self.in_channels, self.heads, dim_head, dtype=self.dtype, name=f"transformer_blocks_{i}"
                )(hs, encoder_hidden_states)
                banks.append(bank)

        hs = hs.reshape(n, h, w, self.in_channels)
        hs = conv(self.in_channels, 1, "proj_out", padding=0, dtype=self.dtype)(hs)
        out = hs + residual
        if self.temporal:
            return out
        return out, banks
