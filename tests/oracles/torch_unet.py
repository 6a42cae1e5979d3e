"""Clean-room torch oracle of the full V-Express UNet pair (reference 2D net +
3D denoising net) with diffusers-compatible state_dict keys, plus timestep
embedding helpers. Used to validate the JAX implementation end to end with
random weights — including the checkpoint key mapping.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn

from .torch_modules import (
    OMotionModule,
    OResnetBlock,
    OSpatialTransformer,
)


def timestep_embedding(timesteps, dim, flip_sin_to_cos=True, downscale_freq_shift=0.0, max_period=10000):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps.float()[:, None] * emb[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    if flip_sin_to_cos:
        return torch.cat([cos, sin], dim=-1)
    return torch.cat([sin, cos], dim=-1)


class OTimestepEmbedding(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, out_dim)
        self.linear_2 = nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ODownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, heads, cross_dim, groups, eps, layers,
                 has_attention, add_downsample, temporal, use_motion, motion_kwargs):
        super().__init__()
        self.resnets = nn.ModuleList(
            [OResnetBlock(in_ch if i == 0 else out_ch, out_ch, temb_ch, groups, eps) for i in range(layers)]
        )
        self.attentions = (
            nn.ModuleList([OSpatialTransformer(out_ch, heads, cross_dim, groups, temporal) for _ in range(layers)])
            if has_attention
            else None
        )
        self.motion_modules = (
            nn.ModuleList([OMotionModule(out_ch, groups=groups, **motion_kwargs) for _ in range(layers)])
            if (temporal and use_motion)
            else None
        )
        self.downsamplers = (
            nn.ModuleList([nn.Module()]) if add_downsample else None
        )
        if add_downsample:
            self.downsamplers[0].conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)

    def forward(self, x, temb, ctx, refs, scales, frames):
        states = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                if refs.temporal:
                    x = self.attentions[i](x, ctx, refs.pop(), scales[0], scales[1])
                else:
                    x, banks = self.attentions[i](x, ctx)
                    refs.push(banks)
            if self.motion_modules is not None:
                x = self.motion_modules[i](x, frames)
            states.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0].conv(x)
            states.append(x)
        return x, states


class OMidBlock(nn.Module):
    def __init__(self, ch, temb_ch, heads, cross_dim, groups, eps, temporal, use_motion, motion_kwargs):
        super().__init__()
        self.resnets = nn.ModuleList([OResnetBlock(ch, ch, temb_ch, groups, eps) for _ in range(2)])
        self.attentions = nn.ModuleList([OSpatialTransformer(ch, heads, cross_dim, groups, temporal)])
        self.motion_modules = (
            nn.ModuleList([OMotionModule(ch, groups=groups, **motion_kwargs)]) if (temporal and use_motion) else None
        )

    def forward(self, x, temb, ctx, refs, scales, frames):
        x = self.resnets[0](x, temb)
        if refs.temporal:
            x = self.attentions[0](x, ctx, refs.pop(), scales[0], scales[1])
        else:
            x, banks = self.attentions[0](x, ctx)
            refs.push(banks)
        if self.motion_modules is not None:
            x = self.motion_modules[0](x, frames)
        x = self.resnets[1](x, temb)
        return x


class OUpBlock(nn.Module):
    def __init__(self, in_ch, prev_ch, out_ch, temb_ch, heads, cross_dim, groups, eps, layers,
                 has_attention, add_upsample, temporal, use_motion, motion_kwargs):
        super().__init__()
        resnets = []
        for i in range(layers):
            res_skip = in_ch if (i == layers - 1) else out_ch
            res_in = prev_ch if i == 0 else out_ch
            resnets.append(OResnetBlock(res_in + res_skip, out_ch, temb_ch, groups, eps))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = (
            nn.ModuleList([OSpatialTransformer(out_ch, heads, cross_dim, groups, temporal) for _ in range(layers)])
            if has_attention
            else None
        )
        self.motion_modules = (
            nn.ModuleList([OMotionModule(out_ch, groups=groups, **motion_kwargs) for _ in range(layers)])
            if (temporal and use_motion)
            else None
        )
        self.upsamplers = nn.ModuleList([nn.Module()]) if add_upsample else None
        if add_upsample:
            self.upsamplers[0].conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)

    def forward(self, x, skips, temb, ctx, refs, scales, frames):
        for i, resnet in enumerate(self.resnets):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                if refs.temporal:
                    x = self.attentions[i](x, ctx, refs.pop(), scales[0], scales[1])
                else:
                    x, banks = self.attentions[i](x, ctx)
                    refs.push(banks)
            if self.motion_modules is not None:
                x = self.motion_modules[i](x, frames)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _Refs:
    def __init__(self, feats=None, temporal=False):
        self.feats = list(feats) if feats else []
        self.temporal = temporal
        self._cursor = 0

    def push(self, banks):
        self.feats.extend(banks)

    def pop(self):
        f = self.feats[self._cursor]
        self._cursor += 1
        return f


class OUNet(nn.Module):
    """Both reference (temporal=False) and denoising (temporal=True) UNets."""

    def __init__(self, cfg, temporal):
        super().__init__()
        ch = cfg["block_out_channels"]
        self.cfg = cfg
        self.temporal = temporal
        temb_ch = ch[0] * 4
        heads = cfg["attention_head_dim"]
        cross = cfg["cross_attention_dim"]
        groups = cfg["norm_num_groups"]
        eps = cfg["norm_eps"]
        layers = cfg["layers_per_block"]
        mkw = dict(
            heads=cfg.get("motion_heads", 8),
            num_blocks=cfg.get("motion_blocks", 1),
            max_len=cfg.get("motion_max_len", 32),
        )
        use_motion = temporal and cfg.get("use_motion_module", True)

        self.conv_in = nn.Conv2d(cfg["in_channels"], ch[0], 3, padding=1)
        self.time_embedding = OTimestepEmbedding(ch[0], temb_ch)

        self.down_blocks = nn.ModuleList()
        out_c = ch[0]
        for i in range(4):
            in_c, out_c = out_c, ch[i]
            final = i == 3
            self.down_blocks.append(
                ODownBlock(in_c, out_c, temb_ch, heads, cross, groups, eps, layers,
                           has_attention=not final, add_downsample=not final,
                           temporal=temporal, use_motion=use_motion, motion_kwargs=mkw)
            )

        self.mid_block = OMidBlock(ch[-1], temb_ch, heads, cross, groups, eps, temporal,
                                   use_motion and cfg.get("motion_module_mid_block", True), mkw)

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        out_c = rev[0]
        for i in range(4):
            prev_c = out_c
            out_c = rev[i]
            in_c = rev[min(i + 1, 3)]
            final = i == 3
            self.up_blocks.append(
                OUpBlock(in_c, prev_c, out_c, temb_ch, heads, cross, groups, eps, layers + 1,
                         has_attention=i != 0, add_upsample=not final,
                         temporal=temporal, use_motion=use_motion, motion_kwargs=mkw)
            )

        self.conv_norm_out = nn.GroupNorm(groups, ch[0], eps=eps)
        self.conv_out = nn.Conv2d(ch[0], cfg["out_channels"], 3, padding=1)

    def forward(self, sample, timesteps, ctx, ref_feats=None, kps_features=None,
                ref_scale=1.0, audio_scale=1.0, frames=1):
        # sample: (N=B*F, C, H, W); ctx: (N, L, cross); ref_feats: list of (N, L_p, C_p)
        b = sample.shape[0] // frames
        temb = self.time_embedding(timestep_embedding(timesteps, self.cfg["block_out_channels"][0]))
        temb = temb.repeat_interleave(frames, dim=0)

        refs = _Refs(ref_feats, temporal=self.temporal)
        scales = (ref_scale, audio_scale)

        x = self.conv_in(sample)
        if kps_features is not None:
            x = x + kps_features

        skips = [x]
        for blk in self.down_blocks:
            x, states = blk(x, temb, ctx, refs, scales, frames)
            skips.extend(states)

        x = self.mid_block(x, temb, ctx, refs, scales, frames)

        for blk in self.up_blocks:
            x = blk(x, skips, temb, ctx, refs, scales, frames)

        x = self.conv_norm_out(x)
        x = F.silu(x)
        x = self.conv_out(x)
        if self.temporal:
            return x
        return x, refs.feats
