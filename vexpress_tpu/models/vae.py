"""AutoencoderKL (sd-vae-ft-mse) — the SD1.5 VAE, channels-last JAX.

Rebuilds the diffusers AutoencoderKL used by the reference
(inference.py:162: AutoencoderKL.from_pretrained('sd-vae-ft-mse')): encoder
(4 DownEncoderBlocks + attention mid), decoder (attention mid + 4
UpDecoderBlocks), quant/post_quant 1x1 convs, diagonal Gaussian latents.
Latent scaling (x0.18215) is the pipeline's job, as in the reference
(v_express_pipeline.py:343-348, :152-166).

TPU notes: everything is conv/matmul, XLA-fused; frame batches decode as one
batched conv pipeline instead of the reference's frame-by-frame python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResnetBlock, Upsample, conv, group_norm


class VAEDownsample(nn.Module):
    """Asymmetric-pad (right/bottom) stride-2 conv, as in the diffusers VAE."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEAttention(nn.Module):
    """Single-head self-attention of the VAE mid block (qkv with bias)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        residual = x
        hs = group_norm(self.groups, 1e-6, "group_norm", self.dtype)(x)
        hs = hs.reshape(n, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(hs), dense("to_k")(hs), dense("to_v")(hs)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        hs = jnp.einsum("bqk,bkc->bqc", weights, v)
        hs = dense("to_out_0")(hs)
        return hs.reshape(n, h, w, c) + residual


class MidBlockVAE(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock(self.channels, 1e-6, self.groups, use_temb=False, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock(self.channels, 1e-6, self.groups, use_temb=False, dtype=self.dtype, name="resnets_1")(x)
        return x


class DownEncoderBlock(nn.Module):
    out_channels: int
    layers: int
    groups: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.layers):
            x = ResnetBlock(self.out_channels, 1e-6, self.groups, use_temb=False, dtype=self.dtype,
                            name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = VAEDownsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    layers: int
    groups: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.layers):
            x = ResnetBlock(self.out_channels, 1e-6, self.groups, use_temb=False, dtype=self.dtype,
                            name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        x = conv(ch[0], 3, "conv_in", dtype=self.dtype)(x)
        for i in range(len(ch)):
            x = DownEncoderBlock(ch[i], cfg.layers_per_block, g, add_downsample=i < len(ch) - 1,
                                 dtype=self.dtype, name=f"down_blocks_{i}")(x)
        x = MidBlockVAE(ch[-1], g, dtype=self.dtype, name="mid_block")(x)
        x = group_norm(g, 1e-6, "conv_norm_out", self.dtype)(x)
        x = jax.nn.silu(x)
        return conv(2 * cfg.latent_channels, 3, "conv_out", dtype=self.dtype)(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        ch = list(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        x = conv(ch[0], 3, "conv_in", dtype=self.dtype)(z)
        x = MidBlockVAE(ch[0], g, dtype=self.dtype, name="mid_block")(x)
        for i in range(len(ch)):
            x = UpDecoderBlock(ch[i], cfg.layers_per_block + 1, g, add_upsample=i < len(ch) - 1,
                               dtype=self.dtype, name=f"up_blocks_{i}")(x)
        x = group_norm(g, 1e-6, "conv_norm_out", self.dtype)(x)
        x = jax.nn.silu(x)
        return conv(cfg.out_channels, 3, "conv_out", dtype=self.dtype)(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype,
                                       param_dtype=jnp.float32, name="post_quant_conv")

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (N,H,W,3) in [-1,1] -> (mean, logvar) each (N,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jax.Array) -> jax.Array:
        """Deterministic encode: posterior mean (pipeline uses .mean,
        v_express_pipeline.py:346)."""
        return self.encode_moments(x)[0]

    def encode_sample(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z: jax.Array) -> jax.Array:
        """z (N,h,w,4) -> (N,H,W,3) in [-1,1]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
