"""Torch oracle of diffusers AutoencoderKL (state_dict-key compatible)."""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

from .torch_modules import OResnetBlock


class OVAEAttention(nn.Module):
    def __init__(self, channels, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels), nn.Dropout(0.0)])

    def forward(self, x):
        n, c, h, w = x.shape
        residual = x
        hs = self.group_norm(x).permute(0, 2, 3, 1).reshape(n, h * w, c)
        q, k, v = self.to_q(hs), self.to_k(hs), self.to_v(hs)
        w_ = torch.softmax(q @ k.transpose(-2, -1) * (c**-0.5), dim=-1)
        hs = w_ @ v
        hs = self.to_out[0](hs)
        return hs.reshape(n, h, w, c).permute(0, 3, 1, 2) + residual


class _Down(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class _Up(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [OResnetBlock(in_ch if j == 0 else out_ch, out_ch, None, groups, 1e-6) for j in range(layers)]
        )
        self.downsamplers = nn.ModuleList([_Down(out_ch)]) if add_down else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _UpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [OResnetBlock(in_ch if j == 0 else out_ch, out_ch, None, groups, 1e-6) for j in range(layers)]
        )
        self.upsamplers = nn.ModuleList([_Up(out_ch)]) if add_up else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _Mid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([OResnetBlock(ch, ch, None, groups, 1e-6) for _ in range(2)])
        self.attentions = nn.ModuleList([OVAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class OEncoder(nn.Module):
    def __init__(self, chs, layers, groups, latent):
        super().__init__()
        self.conv_in = nn.Conv2d(3, chs[0], 3, padding=1)
        blocks = []
        for i, ch in enumerate(chs):
            in_ch = chs[i - 1] if i else chs[0]
            blocks.append(_DownBlock(in_ch, ch, layers, groups, i < len(chs) - 1))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _Mid(chs[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class ODecoder(nn.Module):
    def __init__(self, chs, layers, groups, latent):
        super().__init__()
        rev = list(reversed(chs))
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0], groups)
        blocks = []
        for i, ch in enumerate(rev):
            in_ch = rev[i - 1] if i else rev[0]
            blocks.append(_UpBlock(in_ch, ch, layers + 1, groups, i < len(rev) - 1))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class OVAE(nn.Module):
    def __init__(self, chs=(8, 16, 16, 16), layers=2, groups=4, latent=4):
        super().__init__()
        self.encoder = OEncoder(chs, layers, groups, latent)
        self.decoder = ODecoder(chs, layers, groups, latent)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_mean(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = moments.chunk(2, dim=1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
