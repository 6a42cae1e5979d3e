"""The 2D reference net (reference: modules/unet_2d_condition.py, a near-vanilla
SD1.5 UNet run once on the reference-image latent at t=0).

Instead of harvesting bank features via forward hooks
(mutual_self_attention.py write mode, :145-174), this net *returns* the ordered
tuple of norm2 hidden states — one per BasicTransformerBlock in down->mid->up
traversal order — alongside the sample. The denoising UNet consumes them
positionally, which matches the reference's stable sort-by-dim pairing for two
structurally identical UNets.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import TimestepEmbedding, get_timestep_embedding
from .blocks import conv, group_norm
from .unet_blocks import DownBlock, MidBlock, RefFeatures, UpBlock
from .unet_3d import UNetConfig


class ReferenceUNet2D(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C_in) reference latent
        timesteps: jax.Array,  # (B,) int — always 0 in V-Express
        encoder_hidden_states: jax.Array,  # (B, L, cross_dim) — zeros(1,1,768)
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        cfg = self.config
        b, h, w, _ = sample.shape
        ch = cfg.block_out_channels
        heads = cfg.attention_head_dim
        dt = self.dtype

        t_emb = get_timestep_embedding(
            jnp.broadcast_to(jnp.asarray(timesteps), (b,)), ch[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(dt)
        temb = TimestepEmbedding(ch[0] * 4, dtype=dt, name="time_embedding")(t_emb)

        x = sample.astype(dt)
        ctx = encoder_hidden_states.astype(dt)
        refs = RefFeatures()
        common = dict(
            temporal=False,
            eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=dt,
            heads=heads,
            num_layers=cfg.layers_per_block,
        )

        x = conv(ch[0], 3, "conv_in", dtype=dt)(x)

        skips = [x]
        # midup fusion: down-block banks are never read, so don't capture them
        # (mutual_self_attention.py:286-294 registers hooks on mid+up only)
        down_refs = refs if cfg.fusion_blocks == "full" else None
        for i in range(4):
            is_final = i == 3
            x, states = DownBlock(
                ch[i],
                has_attention=not is_final,
                add_downsample=not is_final,
                **common,
                name=f"down_blocks_{i}",
            )(x, temb, ctx, down_refs, None, 1)
            skips.extend(states)

        x = MidBlock(
            ch[-1],
            num_layers=1,
            heads=heads,
            temporal=False,
            eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=dt,
            name="mid_block",
        )(x, temb, ctx, refs, None, 1)

        rev = list(reversed(ch))
        up_common = dict(common, num_layers=cfg.layers_per_block + 1)
        for i in range(4):
            is_final = i == 3
            x = UpBlock(
                rev[i],
                has_attention=i != 0,
                add_upsample=not is_final,
                **up_common,
                name=f"up_blocks_{i}",
            )(x, skips, temb, ctx, refs, None, 1)

        x = group_norm(cfg.norm_num_groups, cfg.norm_eps, "conv_norm_out", dt)(x)
        x = jax.nn.silu(x)
        x = conv(cfg.out_channels, 3, "conv_out", dtype=dt)(x)
        return x, tuple(refs.feats)
