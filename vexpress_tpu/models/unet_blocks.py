"""UNet down/mid/up blocks, shared between the 2D reference net and the 3D
denoising net (reference: modules/unet_2d_blocks.py and modules/unet_3d_blocks.py).

`temporal=False` builds reference-net blocks (BasicTransformerBlock, no motion
modules) which *emit* bank features; `temporal=True` builds denoising-net
blocks (TemporalBasicTransformerBlock + optional TemporalMotionModule) which
*consume* them. Bank features flow positionally in forward-traversal order
(down -> mid -> up); positional pairing is exactly what the reference's
stable sort by hidden dim produces for two structurally identical UNets
(mutual_self_attention.py:303-305, :351-356).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Downsample, ResnetBlock, SpatialTransformer, Upsample
from .motion_module import TemporalMotionModule


class RefFeatures:
    """Cursor over the ordered list of reference bank features (read side) or
    accumulator (write side)."""

    def __init__(self, feats: Optional[Sequence[jax.Array]] = None):
        self.feats: List[jax.Array] = list(feats) if feats is not None else []
        self._cursor = 0

    def push(self, banks: Sequence[jax.Array]) -> None:
        self.feats.extend(banks)

    def pop(self) -> jax.Array:
        if self._cursor >= len(self.feats):
            raise ValueError(
                f"ran out of reference features: block requested feature #{self._cursor} "
                f"but only {len(self.feats)} were provided. The denoising UNet needs "
                f"config.num_ref_features tensors in down->mid->up order (see "
                f"UNetConfig.ref_feature_shapes)."
            )
        feat = self.feats[self._cursor]
        self._cursor += 1
        return feat


class DownBlock(nn.Module):
    """CrossAttnDownBlock{2,3}D / DownBlock{2,3}D (has_attention switches)."""

    out_channels: int
    num_layers: int = 2
    heads: int = 8
    has_attention: bool = True
    add_downsample: bool = True
    temporal: bool = False
    use_temporal_attention: bool = False
    use_motion: bool = False
    motion_heads: int = 8
    motion_blocks: int = 1
    motion_max_len: int = 32
    eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx, refs: Optional[RefFeatures], scales, frames: int,
                 zero_uncond_kv: bool = False):
        output_states = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.eps, self.groups, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_attention:
                st = SpatialTransformer(
                    self.out_channels,
                    self.heads,
                    temporal=self.temporal,
                    use_temporal_attention=self.use_temporal_attention,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )
                if self.temporal:
                    # refs: RefFeatures cursor (piecewise runners), a plain
                    # per-block tuple indexed by layer (jittable pytree, used
                    # by the remat-able monolithic path), or None — this block
                    # is outside the fusion set (fusion_blocks="midup") and
                    # runs the reference's plain unfused forward
                    if refs is None:
                        ref_i = None
                    else:
                        ref_i = refs.pop() if isinstance(refs, RefFeatures) else refs[i]
                    x = st(x, ctx, None if ref_i is None else (ref_i,),
                           scales[0], scales[1], zero_uncond_kv, frames)
                else:
                    x, banks = st(x, ctx)
                    if refs is not None:  # None: outside the fusion set, no capture
                        refs.push(banks)
            if self.temporal and self.use_motion:
                x = TemporalMotionModule(
                    self.out_channels,
                    self.motion_heads,
                    self.motion_blocks,
                    self.motion_max_len,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"motion_modules_{i}",
                )(x, frames)
            output_states.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            output_states.append(x)
        return x, output_states


class MidBlock(nn.Module):
    """UNetMidBlock{2,3}DCrossAttn (modules/unet_3d_blocks.py:171-293)."""

    in_channels: int
    num_layers: int = 1
    heads: int = 8
    temporal: bool = False
    use_temporal_attention: bool = False
    use_motion: bool = False
    motion_heads: int = 8
    motion_blocks: int = 1
    motion_max_len: int = 32
    eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx, refs: Optional[RefFeatures], scales, frames: int,
                 zero_uncond_kv: bool = False):
        x = ResnetBlock(self.in_channels, self.eps, self.groups, dtype=self.dtype, name="resnets_0")(x, temb)
        for i in range(self.num_layers):
            st = SpatialTransformer(
                self.in_channels,
                self.heads,
                temporal=self.temporal,
                use_temporal_attention=self.use_temporal_attention,
                groups=self.groups,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )
            if self.temporal:
                ref_i = refs.pop() if isinstance(refs, RefFeatures) else refs[i]
                x = st(x, ctx, (ref_i,), scales[0], scales[1], zero_uncond_kv, frames)
            else:
                x, banks = st(x, ctx)
                refs.push(banks)
            if self.temporal and self.use_motion:
                x = TemporalMotionModule(
                    self.in_channels,
                    self.motion_heads,
                    self.motion_blocks,
                    self.motion_max_len,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"motion_modules_{i}",
                )(x, frames)
            x = ResnetBlock(self.in_channels, self.eps, self.groups, dtype=self.dtype, name=f"resnets_{i + 1}")(
                x, temb
            )
        return x


class UpBlock(nn.Module):
    """CrossAttnUpBlock{2,3}D / UpBlock{2,3}D with skip concatenation."""

    out_channels: int
    num_layers: int = 3
    heads: int = 8
    has_attention: bool = True
    add_upsample: bool = True
    temporal: bool = False
    use_temporal_attention: bool = False
    use_motion: bool = False
    motion_heads: int = 8
    motion_blocks: int = 1
    motion_max_len: int = 32
    eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        skips: List[jax.Array],
        temb,
        ctx,
        refs: Optional[RefFeatures],
        scales,
        frames: int,
        zero_uncond_kv: bool = False,
    ):
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(self.out_channels, self.eps, self.groups, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_attention:
                st = SpatialTransformer(
                    self.out_channels,
                    self.heads,
                    temporal=self.temporal,
                    use_temporal_attention=self.use_temporal_attention,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )
                if self.temporal:
                    ref_i = refs.pop() if isinstance(refs, RefFeatures) else refs[i]
                    x = st(x, ctx, (ref_i,), scales[0], scales[1], zero_uncond_kv, frames)
                else:
                    x, banks = st(x, ctx)
                    refs.push(banks)
            if self.temporal and self.use_motion:
                x = TemporalMotionModule(
                    self.out_channels,
                    self.motion_heads,
                    self.motion_blocks,
                    self.motion_max_len,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"motion_modules_{i}",
                )(x, frames)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x
