"""Wav2Vec2 audio encoder (wav2vec2-base-960h), JAX.

The reference runs transformers' torch Wav2Vec2Model frozen
(inference.py:165-166, v_express_pipeline.py:374-407) to embed 16 kHz speech
into 768-d frame features (~49.6 Hz). This is a TPU-native rebuild of the
base architecture (do_stable_layer_norm=False, feat_extract_norm="group"):

  conv feature extractor (7 strided 1-D convs, GroupNorm on the first)
  -> feature projection (LayerNorm + Linear)
  -> grouped positional conv embedding (kernel 128, groups 16, SamePad)
  -> 12 post-LN transformer layers

Weight import: transformers state_dict keys, incl. weight-norm'ed pos conv
(weight_g/weight_v or parametrizations.*), handled by `convert_wav2vec2_state_dict`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.layers import gelu


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_normalize: bool = True  # waveform zero-mean/unit-var (processor)

    def num_output_frames(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def normalize_waveform(waveform: jax.Array) -> jax.Array:
    """Wav2Vec2 processor zero-mean unit-variance normalization (per utterance)."""
    mean = jnp.mean(waveform, axis=-1, keepdims=True)
    var = jnp.var(waveform, axis=-1, keepdims=True)
    return (waveform - mean) / jnp.sqrt(var + 1e-7)


class FeatureEncoder(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T) waveform -> (B, frames, conv_dim[-1])."""
        cfg = self.config
        h = x[..., None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"conv_layers_{i}_conv")(h)
            if i == 0:
                # GroupNorm(num_groups=dim) == per-channel instance norm over time
                h = nn.GroupNorm(num_groups=dim, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"conv_layers_{i}_layer_norm")(h)
            h = gelu(h)
        return h


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False)."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        heads = cfg.num_attention_heads
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        residual = x
        b, t, _ = x.shape
        hd = d // heads
        q = dense(d, "attention_q_proj")(x) * (hd**-0.5)
        k = dense(d, "attention_k_proj")(x)
        v = dense(d, "attention_v_proj")(x)
        q = q.reshape(b, t, heads, hd)
        k = k.reshape(b, t, heads, hd)
        v = v.reshape(b, t, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, t, d)
        x = residual + dense(d, "attention_out_proj")(attn)
        x = ln("layer_norm")(x)

        ff = dense(cfg.intermediate_size, "feed_forward_intermediate_dense")(x)
        ff = gelu(ff)
        ff = dense(d, "feed_forward_output_dense")(ff)
        x = ln("final_layer_norm")(x + ff)
        return x


class Wav2Vec2Model(nn.Module):
    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jax.Array) -> jax.Array:
        """waveform: (B, T) raw (un-normalized) 16 kHz audio
        -> last_hidden_state (B, frames, hidden)."""
        cfg = self.config
        if cfg.do_normalize:
            waveform = normalize_waveform(waveform)

        feats = FeatureEncoder(cfg, dtype=self.dtype, name="feature_extractor")(waveform)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="feature_projection_layer_norm")(feats)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="feature_projection_projection")(h)

        # positional conv embedding: grouped conv, pad 64 both sides, drop last
        # output step (SamePad for even kernel), gelu
        k = cfg.num_conv_pos_embeddings
        pos = nn.Conv(cfg.hidden_size, (k,), padding=((k // 2, k // 2),),
                      feature_group_count=cfg.num_conv_pos_embedding_groups,
                      dtype=self.dtype, param_dtype=jnp.float32, name="pos_conv_embed_conv")(h)
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        pos = gelu(pos)
        h = h + pos
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="encoder_layer_norm")(h)

        for i in range(cfg.num_hidden_layers):
            h = EncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(h)
        return h


def convert_wav2vec2_state_dict(state_dict) -> dict:
    """transformers Wav2Vec2Model.state_dict() -> flax params for this module."""
    import re

    params: dict = {}

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, dtype=np.float32)

    def np_of(v):
        return v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)

    # weight-norm'ed positional conv: reconstruct effective weight
    sd = {k: np_of(v) for k, v in state_dict.items()}
    g_key = next((k for k in sd if re.search(r"pos_conv_embed\.conv\.(weight_g|parametrizations\.weight\.original0)$", k)), None)
    v_key = next((k for k in sd if re.search(r"pos_conv_embed\.conv\.(weight_v|parametrizations\.weight\.original1)$", k)), None)
    if g_key and v_key:
        g, v = sd.pop(g_key), sd.pop(v_key)
        # torch weight_norm(dim=2) over conv1d weight (O, I/g, K):
        # w = g * v / ||v||, norm over dims (0, 1) keeping K
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd["encoder.pos_conv_embed.conv.weight"] = g * v / norm

    for key, arr in sd.items():
        if key.endswith("masked_spec_embed"):
            continue
        k = key
        k = k.replace("feature_extractor.conv_layers.", "feature_extractor.conv_layers_")
        k = re.sub(r"conv_layers_(\d+)\.conv\.", r"conv_layers_\1_conv.", k)
        k = re.sub(r"conv_layers_(\d+)\.layer_norm\.", r"conv_layers_\1_layer_norm.", k)
        k = k.replace("feature_projection.layer_norm.", "feature_projection_layer_norm.")
        k = k.replace("feature_projection.projection.", "feature_projection_projection.")
        k = k.replace("encoder.pos_conv_embed.conv.", "pos_conv_embed_conv.")
        k = k.replace("encoder.layer_norm.", "encoder_layer_norm.")
        k = k.replace("encoder.layers.", "layers.")
        k = re.sub(r"layers\.(\d+)\.", r"layers_\1.", k)
        k = k.replace(".attention.q_proj.", ".attention_q_proj.")
        k = k.replace(".attention.k_proj.", ".attention_k_proj.")
        k = k.replace(".attention.v_proj.", ".attention_v_proj.")
        k = k.replace(".attention.out_proj.", ".attention_out_proj.")
        k = k.replace(".feed_forward.intermediate_dense.", ".feed_forward_intermediate_dense.")
        k = k.replace(".feed_forward.output_dense.", ".feed_forward_output_dense.")

        path = k.split(".")
        leaf = path[-1]
        if leaf == "weight":
            if arr.ndim == 3:  # conv1d (O, I/g, K) -> (K, I/g, O)
                arr = arr.transpose(2, 1, 0)
                path[-1] = "kernel"
            elif arr.ndim == 2:
                arr = arr.T
                path[-1] = "kernel"
            else:
                path[-1] = "scale"
        put(path, arr)
    return params
