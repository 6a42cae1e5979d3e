"""The 3D denoising UNet (reference: modules/unet_3d.py UNet3DConditionModel).

SD1.5 topology inflated to video: per-frame spatial convs/attention (frames
folded into batch), reference KV injection via attn1_5, audio cross-attention
via attn2, and AnimateDiff temporal motion modules after each spatial
transformer (inference_v2.yaml unet_additional_kwargs).

Layout: video tensors are (B, F, H, W, C) channels-last; reference features
arrive as an ordered tuple of (B, L_p, C_p) tensors (down->mid->up traversal)
produced by `ReferenceUNet2D` — the functional replacement for the bank
monkey-patching of modules/mutual_self_attention.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import TimestepEmbedding, get_timestep_embedding
from .blocks import conv, group_norm
from .unet_blocks import DownBlock, MidBlock, UpBlock


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD1.5 UNet geometry + V-Express additions (unet_additional_kwargs)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8  # SD1.5 naming: this is the HEAD COUNT
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # V-Express additions (inference_v2.yaml:1-22)
    # optional post-FF per-pixel temporal attention in every transformer block
    # (inference_v2.yaml:4 unet_use_temporal_attention — off in V-Express)
    unet_use_temporal_attention: bool = False
    # Which transformer blocks take part in reference-bank fusion
    # (mutual_self_attention.py:286-305). "full" (every cross-attn block —
    # what V-Express always uses, v_express_pipeline.py:451-466) or "midup"
    # (mid+up only; down blocks run the PLAIN TemporalBasicTransformerBlock
    # forward: self-attn attn1_5, unweighted audio attn2 —
    # modules/attention.py:396-479).
    fusion_blocks: str = "full"
    use_motion_module: bool = True
    motion_module_mid_block: bool = True
    motion_num_attention_heads: int = 8
    motion_num_transformer_block: int = 1
    motion_max_len: int = 32
    # jax.checkpoint each down/mid/up block on the monolithic path: recompute
    # activations at block boundaries in the backward pass (the reference's
    # per-block torch.utils.checkpoint, train.py:448-451 +
    # unet_3d_blocks.py:411-435). The piecewise trainer gets this for free.
    gradient_checkpointing: bool = False

    @classmethod
    def from_diffusers_json(cls, path: str, **overrides) -> "UNetConfig":
        """Build from a diffusers UNet2DConditionModel config.json (the
        reference's --unet_config_path, inference.py:30,77-90). Only geometry
        fields are read; V-Express additional kwargs come from `overrides`."""
        import json

        with open(path) as f:
            d = json.load(f)
        kw = {}
        for src, dst in [
            ("in_channels", "in_channels"), ("out_channels", "out_channels"),
            ("block_out_channels", "block_out_channels"),
            ("layers_per_block", "layers_per_block"),
            ("attention_head_dim", "attention_head_dim"),
            ("cross_attention_dim", "cross_attention_dim"),
            ("norm_num_groups", "norm_num_groups"), ("norm_eps", "norm_eps"),
            ("flip_sin_to_cos", "flip_sin_to_cos"), ("freq_shift", "freq_shift"),
        ]:
            if src in d:
                v = d[src]
                kw[dst] = tuple(v) if isinstance(v, list) else v
        if isinstance(kw.get("attention_head_dim"), tuple):
            raise ValueError(
                "per-block attention_head_dim lists (SDXL-style configs) are "
                "not supported; V-Express uses the SD1.5 UNet geometry "
                "(uniform attention_head_dim, reference inference.py:30)")
        kw.update(overrides)
        return cls(**kw)

    def __post_init__(self):
        if self.fusion_blocks not in ("full", "midup"):
            raise ValueError(
                f"fusion_blocks must be 'full' or 'midup', got {self.fusion_blocks!r} "
                "(mutual_self_attention.py:38 asserts the same)")

    @property
    def num_ref_features(self) -> int:
        """Number of bank features = number of fused cross-attn transformer
        blocks: 3*lp + 1 + 3*(lp+1) for "full", 1 + 3*(lp+1) for "midup"."""
        n_down = 3 * self.layers_per_block if self.fusion_blocks == "full" else 0
        n_mid = 1
        n_up = 3 * (self.layers_per_block + 1)  # up blocks 1..3
        return n_down + n_mid + n_up

    def ref_feature_shapes(self, height: int, width: int) -> Tuple[Tuple[int, int], ...]:
        """(seq_len, channels) of each reference feature at latent res (h, w)."""
        shapes = []
        ch = self.block_out_channels
        if self.fusion_blocks == "full":
            # down blocks with attention: 0, 1, 2 at resolutions /1, /2, /4
            for i in range(3):
                h, w = height >> i, width >> i
                shapes += [(h * w, ch[i])] * self.layers_per_block
        # mid at deepest resolution
        hd, wd = height >> 3, width >> 3
        shapes.append((hd * wd, ch[-1]))
        # up blocks 1, 2, 3 at resolutions /4, /2, /1
        for j, i in enumerate((2, 1, 0)):
            h, w = height >> (2 - j), width >> (2 - j)
            shapes += [(h * w, ch[i])] * (self.layers_per_block + 1)
        return tuple(shapes)


class DenoisingUNet3D(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, F, H, W, C_in) latent video
        timesteps: jax.Array,  # (B,) int
        audio_tokens: jax.Array,  # (B, F, L_audio, cross_dim)
        ref_features: Sequence[jax.Array],  # tuple of (B, L_p, C_p)
        kps_features: Optional[jax.Array] = None,  # (B, F, H, W, block0_ch)
        ref_scale: float | jax.Array = 1.0,
        audio_scale: float | jax.Array = 1.0,
        zero_uncond_kv: bool = False,  # CFG batches [uncond; cond] with zero
        # uncond banks/audio: skip the uncond half of attn1_5/attn2 (exact)
    ) -> jax.Array:
        cfg = self.config
        if len(ref_features) != cfg.num_ref_features:
            raise ValueError(
                f"DenoisingUNet3D needs config.num_ref_features={cfg.num_ref_features} "
                f"reference features in down->mid->up order but got {len(ref_features)}; "
                f"see UNetConfig.ref_feature_shapes for the expected shapes."
            )
        b, f, h, w, _ = sample.shape
        ch = cfg.block_out_channels
        heads = cfg.attention_head_dim
        dt = self.dtype

        # time embedding (unet_3d.py:464-470), shared across frames
        t_emb = get_timestep_embedding(
            jnp.broadcast_to(jnp.asarray(timesteps), (b,)), ch[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(dt)
        temb = TimestepEmbedding(ch[0] * 4, dtype=dt, name="time_embedding")(t_emb)
        temb = jnp.repeat(temb, f, axis=0)  # (B*F, 4*ch0)

        # fold frames into batch; refs consumed as per-block tuples (a plain
        # pytree, so blocks can be wrapped in jax.checkpoint)
        x = sample.reshape(b * f, h, w, sample.shape[-1]).astype(dt)
        ctx = audio_tokens.reshape(b * f, audio_tokens.shape[2], audio_tokens.shape[3]).astype(dt)
        ref_tuple = tuple(r.astype(dt) for r in ref_features)
        scales = (jnp.asarray(ref_scale, dtype=dt), jnp.asarray(audio_scale, dtype=dt))

        DB, MB, UB = DownBlock, MidBlock, UpBlock
        if cfg.gradient_checkpointing:
            DB = nn.remat(DownBlock, static_argnums=(6, 7))
            MB = nn.remat(MidBlock, static_argnums=(6, 7))
            UB = nn.remat(UpBlock, static_argnums=(7, 8))

        mkw = dict(
            use_motion=cfg.use_motion_module,
            motion_heads=cfg.motion_num_attention_heads,
            motion_blocks=cfg.motion_num_transformer_block,
            motion_max_len=cfg.motion_max_len,
        )
        common = dict(
            temporal=True,
            use_temporal_attention=cfg.unet_use_temporal_attention,
            eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=dt,
            heads=heads,
            num_layers=cfg.layers_per_block,
        )

        # conv_in + kps conditioning (unet_3d.py:485-487)
        x = conv(ch[0], 3, "conv_in", dtype=dt)(x)
        if kps_features is not None:
            x = x + kps_features.reshape(b * f, h, w, ch[0]).astype(dt)

        # down — with fusion_blocks="midup" the down blocks consume NO banks:
        # block_refs=None makes their transformer blocks run the reference's
        # plain (unfused) forward (mutual_self_attention.py:286-294)
        lp = cfg.layers_per_block
        midup = cfg.fusion_blocks == "midup"
        cursor = 0
        skips = [x]
        for i in range(4):
            is_final = i == 3
            n_refs = 0 if (is_final or midup) else lp
            block_refs = None if (midup and not is_final) else ref_tuple[cursor : cursor + n_refs]
            cursor += n_refs
            x, states = DB(
                ch[i],
                has_attention=not is_final,
                add_downsample=not is_final,
                **{**common, **mkw},
                name=f"down_blocks_{i}",
            )(x, temb, ctx, block_refs, scales, f, zero_uncond_kv)
            skips.extend(states)

        # mid
        x = MB(
            ch[-1],
            num_layers=1,
            heads=heads,
            temporal=True,
            use_temporal_attention=cfg.unet_use_temporal_attention,
            use_motion=cfg.use_motion_module and cfg.motion_module_mid_block,
            motion_heads=cfg.motion_num_attention_heads,
            motion_blocks=cfg.motion_num_transformer_block,
            motion_max_len=cfg.motion_max_len,
            eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=dt,
            name="mid_block",
        )(x, temb, ctx, ref_tuple[cursor : cursor + 1], scales, f, zero_uncond_kv)
        cursor += 1

        # up: types (Up, CrossAttn, CrossAttn, CrossAttn), channels reversed
        rev = list(reversed(ch))
        up_common = dict(common, num_layers=cfg.layers_per_block + 1)
        n_skips = lp + 1
        for i in range(4):
            is_final = i == 3
            n_refs = 0 if i == 0 else lp + 1
            block_refs = ref_tuple[cursor : cursor + n_refs]
            cursor += n_refs
            use, skips = skips[-n_skips:], skips[:-n_skips]
            x = UB(
                rev[i],
                has_attention=i != 0,
                add_upsample=not is_final,
                **{**up_common, **mkw},
                name=f"up_blocks_{i}",
            )(x, list(use), temb, ctx, block_refs, scales, f, zero_uncond_kv)

        # out
        x = group_norm(cfg.norm_num_groups, cfg.norm_eps, "conv_norm_out", dt)(x)
        x = jax.nn.silu(x)
        x = conv(cfg.out_channels, 3, "conv_out", dtype=dt)(x)
        return x.reshape(b, f, h, w, cfg.out_channels)
