"""Audio embedding windowing: wav2vec2 frames -> per-video-frame token windows.

Reference math (v_express_pipeline.py:374-407 and
datasets/talking_face_video.py:70-95):
  1. wav2vec2 last_hidden_state (T', 768)
  2. fp32 linear interpolation (torch F.interpolate, align_corners=False) to
     length 2 * video_length
  3. zero-pad 2*num_pad frames on both ends
  4. frame i gets the slice [2i : 2i + 2*(2*num_pad + 1)] — 10 embeddings
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_linear(x: jax.Array, out_len: int) -> jax.Array:
    """torch.nn.functional.interpolate(mode='linear', align_corners=False)
    along axis 0 of x (T, C)."""
    t_in = x.shape[0]
    x32 = x.astype(jnp.float32)
    scale = t_in / out_len
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    frac = (pos - lo.astype(jnp.float32))[:, None]
    return (x32[lo] * (1.0 - frac) + x32[hi] * frac).astype(x.dtype)


def audio_frame_windows(
    audio_embeddings: jax.Array,  # (T', C) wav2vec2 features
    video_length: int,
    num_pad_audio_frames: int = 2,
) -> jax.Array:
    """-> (video_length, 2*(2*num_pad+1), C) per-frame embedding windows."""
    emb = interpolate_linear(audio_embeddings, 2 * video_length)
    c = emb.shape[-1]
    pad = 2 * num_pad_audio_frames
    emb = jnp.concatenate(
        [jnp.zeros((pad, c), emb.dtype), emb, jnp.zeros((pad, c), emb.dtype)], axis=0
    )
    window = 2 * (2 * num_pad_audio_frames + 1)
    starts = 2 * jnp.arange(video_length)
    idx = starts[:, None] + jnp.arange(window)[None, :]
    return emb[idx]
