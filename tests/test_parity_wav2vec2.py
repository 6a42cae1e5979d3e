"""Wav2Vec2 parity vs the REAL transformers torch implementation (random
weights, small config) — the strongest oracle available offline."""

import numpy as np
import torch
import jax.numpy as jnp

from transformers import Wav2Vec2Config as HFConfig
from transformers import Wav2Vec2Model as HFModel
from transformers import Wav2Vec2FeatureExtractor

from vexpress_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    convert_wav2vec2_state_dict,
    normalize_waveform,
)

torch.manual_seed(0)

SMALL = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16, 16),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _models():
    hf_cfg = HFConfig(
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        feat_extract_activation="gelu",
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        **SMALL,
    )
    hf = HFModel(hf_cfg).eval()
    cfg = Wav2Vec2Config(do_normalize=False, **SMALL)
    m = Wav2Vec2Model(cfg)
    params = {"params": convert_wav2vec2_state_dict(hf.state_dict())}
    return hf, m, params, cfg


def test_wav2vec2_parity():
    hf, m, params, cfg = _models()
    wav = torch.randn(2, 1600)
    with torch.no_grad():
        ref = hf(wav).last_hidden_state
    out = m.apply(params, jnp.asarray(wav.numpy()))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=2e-4)


def test_num_output_frames():
    hf, m, params, cfg = _models()
    wav = torch.randn(1, 3200)
    with torch.no_grad():
        ref = hf(wav).last_hidden_state
    assert cfg.num_output_frames(3200) == ref.shape[1]


def test_processor_normalization():
    fe = Wav2Vec2FeatureExtractor(do_normalize=True, return_attention_mask=False)
    wav = np.random.default_rng(0).normal(size=(2000,)).astype(np.float32) * 3 + 1
    ref = fe(wav, sampling_rate=16000, return_tensors="np")["input_values"][0]
    out = normalize_waveform(jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
