"""Clean-room torch oracles mirroring the diffusers/V-Express math, used to
verify the JAX implementation numerically with randomly initialized weights.

These are NOT copies of the reference code (which depends on diffusers); they
re-implement the documented semantics of the modules V-Express composes:
diffusers Attention / FeedForward(GEGLU) / ResnetBlock2D / Transformer2DModel
plus V-Express's TemporalBasicTransformerBlock (read-mode math,
/root/reference/modules/mutual_self_attention.py:176-267) and the AnimateDiff
motion module. Module attribute names are chosen so `state_dict()` produces
the same keys as real V-Express checkpoints.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class OAttention(nn.Module):
    """diffusers Attention with AttnProcessor2_0 semantics (bias-free qkv,
    to_out = Sequential(Linear, Dropout))."""

    def __init__(self, query_dim, heads, dim_head, cross_dim=None, qkv_bias=False):
        super().__init__()
        inner = heads * dim_head
        kv_dim = cross_dim if cross_dim is not None else query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(kv_dim, inner, bias=qkv_bias)
        self.to_v = nn.Linear(kv_dim, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, encoder_hidden_states=None):
        kv = x if encoder_hidden_states is None else encoder_hidden_states
        b, lq, _ = x.shape
        q = self.to_q(x)
        k = self.to_k(kv)
        v = self.to_v(kv)
        d = q.shape[-1] // self.heads
        q = q.view(b, lq, self.heads, d).transpose(1, 2)
        k = k.view(b, -1, self.heads, d).transpose(1, 2)
        v = v.view(b, -1, self.heads, d).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, lq, self.heads * d)
        return self.to_out[0](out)


class OGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class OFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = int(dim * mult)
        self.net = nn.ModuleList([OGEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class OBasicTransformerBlock(nn.Module):
    """Reference-net block in write mode: returns (hidden, bank)."""

    def __init__(self, dim, heads, cross_dim):
        super().__init__()
        dim_head = dim // heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = OAttention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = OAttention(dim, heads, dim_head, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = OFeedForward(dim)

    def forward(self, x, encoder_hidden_states):
        x = x + self.attn1(self.norm1(x))
        bank = self.norm2(x)
        x = x + self.attn2(bank, encoder_hidden_states)
        x = x + self.ff(self.norm3(x))
        return x, bank


class OTemporalBasicTransformerBlock(nn.Module):
    """Denoising-net block, read-mode math (mutual_self_attention.py:176-248);
    optional attn_temp branch (attention.py:380-395, :466-479)."""

    def __init__(self, dim, heads, cross_dim, use_temporal_attention=False):
        super().__init__()
        dim_head = dim // heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = OAttention(dim, heads, dim_head)
        self.norm1_5 = nn.LayerNorm(dim)
        self.attn1_5 = OAttention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = OAttention(dim, heads, dim_head, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = OFeedForward(dim)
        self.use_temporal_attention = use_temporal_attention
        if use_temporal_attention:
            self.norm_temp = nn.LayerNorm(dim)
            self.attn_temp = OAttention(dim, heads, dim_head)
            nn.init.zeros_(self.attn_temp.to_out[0].weight.data)

    def forward(self, x, audio_kv, ref_kv, ref_scale=1.0, audio_scale=1.0, frames=1):
        x = x + self.attn1(self.norm1(x))
        x = x + ref_scale * self.attn1_5(self.norm1_5(x), ref_kv)
        x = x + audio_scale * self.attn2(self.norm2(x), audio_kv)
        x = x + self.ff(self.norm3(x))
        if self.use_temporal_attention:
            bf, d, c = x.shape
            b = bf // frames
            x = x.reshape(b, frames, d, c).permute(0, 2, 1, 3).reshape(b * d, frames, c)
            x = x + self.attn_temp(self.norm_temp(x))
            x = x.reshape(b, d, frames, c).permute(0, 2, 1, 3).reshape(bf, d, c)
        return x


class OResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch) if temb_ch else None
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb=None):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class OSpatialTransformer(nn.Module):
    """Transformer2D/3D wrapper, use_linear_projection=False."""

    def __init__(self, channels, heads, cross_dim, groups, temporal,
                 use_temporal_attention=False):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        if temporal:
            block = OTemporalBasicTransformerBlock(
                channels, heads, cross_dim, use_temporal_attention=use_temporal_attention)
        else:
            block = OBasicTransformerBlock(channels, heads, cross_dim)
        self.transformer_blocks = nn.ModuleList([block])
        self.proj_out = nn.Conv2d(channels, channels, 1)
        self.temporal = temporal

    def forward(self, x, ctx, ref_kv=None, ref_scale=1.0, audio_scale=1.0, frames=1):
        n, c, h, w = x.shape
        residual = x
        hs = self.norm(x)
        hs = self.proj_in(hs)
        hs = hs.permute(0, 2, 3, 1).reshape(n, h * w, c)
        banks = []
        for blk in self.transformer_blocks:
            if self.temporal:
                hs = blk(hs, ctx, ref_kv, ref_scale, audio_scale, frames)
            else:
                hs, bank = blk(hs, ctx)
                banks.append(bank)
        hs = hs.reshape(n, h, w, c).permute(0, 3, 1, 2)
        hs = self.proj_out(hs)
        out = hs + residual
        if self.temporal:
            return out
        return out, banks


class OPositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class OVersatileAttention(OAttention):
    """Temporal self-attention across frames per spatial location."""

    def __init__(self, dim, heads, max_len):
        super().__init__(dim, heads, dim // heads)
        self.pos_encoder = OPositionalEncoding(dim, max_len)

    def forward(self, x, video_length=None):
        bf, d, c = x.shape
        b = bf // video_length
        x = x.view(b, video_length, d, c).transpose(1, 2).reshape(b * d, video_length, c)
        x = self.pos_encoder(x)
        x = super().forward(x)
        x = x.view(b, d, video_length, c).transpose(1, 2).reshape(bf, d, c)
        return x


class OTemporalTransformerBlock(nn.Module):
    def __init__(self, dim, heads, max_len):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [OVersatileAttention(dim, heads, max_len) for _ in range(2)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(2)])
        self.ff = OFeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length=video_length) + x
        x = self.ff(self.ff_norm(x)) + x
        return x


class OTemporalTransformer3D(nn.Module):
    def __init__(self, channels, heads, num_blocks, max_len, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, channels)
        self.transformer_blocks = nn.ModuleList(
            [OTemporalTransformerBlock(channels, heads, max_len) for _ in range(num_blocks)]
        )
        self.proj_out = nn.Linear(channels, channels)

    def forward(self, x, video_length):
        n, c, h, w = x.shape
        residual = x
        hs = self.norm(x)
        hs = hs.permute(0, 2, 3, 1).reshape(n, h * w, c)
        hs = self.proj_in(hs)
        for blk in self.transformer_blocks:
            hs = blk(hs, video_length)
        hs = self.proj_out(hs)
        hs = hs.reshape(n, h, w, c).permute(0, 3, 1, 2)
        return hs + residual


class OMotionModule(nn.Module):
    def __init__(self, channels, heads, num_blocks, max_len, groups=32):
        super().__init__()
        self.temporal_transformer = OTemporalTransformer3D(channels, heads, num_blocks, max_len, groups)

    def forward(self, x, video_length):
        return self.temporal_transformer(x, video_length)
