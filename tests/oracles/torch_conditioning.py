"""Torch oracles for VKpsGuider and AudioProjection (state_dict-key compatible
with /root/reference/modules/{v_kps_guider,audio_projection}.py)."""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class OVKpsGuider(nn.Module):
    def __init__(self, embed_channels=320, block_out_channels=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_out_channels[0], 3, padding=1)
        blocks = []
        for i in range(len(block_out_channels) - 1):
            blocks.append(nn.Conv2d(block_out_channels[i], block_out_channels[i], 3, padding=1))
            blocks.append(nn.Conv2d(block_out_channels[i], block_out_channels[i + 1], 3, padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(block_out_channels[-1], embed_channels, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class OPerceiverAttention(nn.Module):
    def __init__(self, dim, dim_head, heads):
        super().__init__()
        self.dim_head = dim_head
        self.heads = heads
        inner = dim_head * heads
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, latents):
        x = self.norm1(x)
        latents = self.norm2(latents)
        b, l, _ = latents.shape
        q = self.to_q(latents)
        k, v = self.to_kv(torch.cat([x, latents], dim=-2)).chunk(2, dim=-1)

        def rs(t):
            return t.view(b, t.shape[1], self.heads, -1).transpose(1, 2)

        q, k, v = rs(q), rs(k), rs(v)
        scale = 1 / math.sqrt(math.sqrt(self.dim_head))
        weight = (q * scale) @ (k * scale).transpose(-2, -1)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        out = weight @ v
        out = out.permute(0, 2, 1, 3).reshape(b, l, -1)
        return self.to_out(out)


def _off(dim, mult):
    inner = int(dim * mult)
    return nn.Sequential(
        nn.LayerNorm(dim),
        nn.Linear(dim, inner, bias=False),
        nn.GELU(),
        nn.Linear(inner, dim, bias=False),
    )


class OAudioProjection(nn.Module):
    def __init__(self, dim=768, depth=4, dim_head=64, heads=12, num_queries=5,
                 embedding_dim=768, output_dim=768, ff_mult=4, max_seq_len=10):
        super().__init__()
        self.pos_emb = nn.Embedding(max_seq_len, embedding_dim)
        self.latents = nn.Parameter(torch.randn(1, num_queries, dim) / dim**0.5)
        self.proj_in = nn.Linear(embedding_dim, dim)
        self.proj_out = nn.Linear(dim, output_dim)
        self.norm_out = nn.LayerNorm(output_dim)
        self.layers = nn.ModuleList(
            [nn.ModuleList([OPerceiverAttention(dim, dim_head, heads), _off(dim, ff_mult)]) for _ in range(depth)]
        )

    def forward(self, x):
        n = x.shape[1]
        pos = self.pos_emb(torch.arange(n, device=x.device))
        x = x + pos
        latents = self.latents.repeat(x.size(0), 1, 1)
        x = self.proj_in(x)
        for attn, ff in self.layers:
            latents = attn(x, latents) + latents
            latents = ff(latents) + latents
        return self.norm_out(self.proj_out(latents))
