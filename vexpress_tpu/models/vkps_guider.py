"""V-Kps Guider: encodes rendered 3-point keypoint images to a latent-resolution
feature added to the denoising UNet's conv_in output.

Reference: modules/v_kps_guider.py:10-45 — conv_in -> 3x(conv, stride-2 conv)
-> zero-init conv_out, SiLU between convs, channels (16, 32, 96, 256) -> 320
(inference.py:100). Per-frame 2D convs; frames folded into batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv


class VKpsGuider(nn.Module):
    conditioning_embedding_channels: int = 320
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kps_images: jax.Array) -> jax.Array:
        """kps_images: (B, F, H, W, 3) in [0, 1] -> (B, F, H/8, W/8, 320)."""
        b, f, h, w, c = kps_images.shape
        x = kps_images.reshape(b * f, h, w, c).astype(self.dtype)

        x = conv(self.block_out_channels[0], 3, "conv_in", dtype=self.dtype)(x)
        x = jax.nn.silu(x)

        chans = self.block_out_channels
        for i in range(len(chans) - 1):
            x = conv(chans[i], 3, f"blocks_{2 * i}", dtype=self.dtype)(x)
            x = jax.nn.silu(x)
            x = conv(chans[i + 1], 3, f"blocks_{2 * i + 1}", stride=2, dtype=self.dtype)(x)
            x = jax.nn.silu(x)

        x = nn.Conv(
            self.conditioning_embedding_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_out",
        )(x)
        return x.reshape(b, f, x.shape[1], x.shape[2], x.shape[3])
