"""Importer coverage against synthesized FULL checkpoint key sets.

The released V-Express weights are loaded with strict=False in the reference
(inference.py:77-129), so a misspelled key mapping in the importer would be
silently dropped. These tests synthesize the complete torch state-dict key
set for every module (tests/sd15_keys.py, written down independently of the
importer) at full SD1.5 widths, run them through the converter, and require
exact two-way coverage of the real flax parameter trees: every checkpoint
tensor lands on a leaf with the right shape, and every leaf is loaded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vexpress_tpu.io.torch_import import convert_torch_state_dict
from vexpress_tpu.io.loaders import default_pipeline_models
from vexpress_tpu.pipelines.pipeline import VExpressPipeline

from .sd15_keys import (
    audio_projection_keys,
    denoising_unet_keys,
    reference_net_keys,
    v_kps_guider_keys,
)


def _flat_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(getattr(p, "key", str(p)) for p in path): tuple(leaf.shape)
        for path, leaf in flat
    }


def _converted_shapes(key_shapes):
    sd = {k: np.zeros(s, np.float32) for k, s in key_shapes.items()}
    converted = {"params": convert_torch_state_dict(sd)}
    return _flat_shapes(converted)


@pytest.fixture(scope="module")
def full_models():
    return default_pipeline_models(dtype=jnp.float32)


def _assert_two_way(converted, flax_shapes, label):
    missing = sorted(set(flax_shapes) - set(converted))
    extra = sorted(set(converted) - set(flax_shapes))
    assert not missing, f"{label}: flax leaves never loaded (first 10): {missing[:10]}"
    assert not extra, f"{label}: checkpoint tensors with no destination (first 10): {extra[:10]}"
    for path, shape in flax_shapes.items():
        assert converted[path] == shape, f"{label}: shape mismatch at {path}: " \
                                         f"ckpt {converted[path]} vs flax {shape}"


def test_reference_net_full_coverage(full_models):
    pipe = VExpressPipeline(full_models, params={})
    key = jax.random.PRNGKey(0)
    h = w = 8
    shapes = jax.eval_shape(
        pipe.reference_net.init, key, jnp.zeros((1, h, w, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 768)),
    )
    _assert_two_way(_converted_shapes(reference_net_keys()), _flat_shapes(shapes),
                    "reference_net")


def test_denoising_unet_full_coverage(full_models):
    pipe = VExpressPipeline(full_models, params={})
    key = jax.random.PRNGKey(0)
    h = w = 8
    rf = full_models.unet_config.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.zeros((1, l, c)) for l, c in rf)
    shapes = jax.eval_shape(
        pipe.denoising_unet.init, key, jnp.zeros((1, 1, h, w, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 5, 768)), ref_feats,
        jnp.zeros((1, 1, h, w, 320)),
    )
    _assert_two_way(_converted_shapes(denoising_unet_keys()), _flat_shapes(shapes),
                    "denoising_unet")


def test_v_kps_guider_full_coverage(full_models):
    pipe = VExpressPipeline(full_models, params={})
    shapes = jax.eval_shape(
        pipe.v_kps_guider.init, jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3))
    )
    _assert_two_way(_converted_shapes(v_kps_guider_keys()), _flat_shapes(shapes),
                    "v_kps_guider")


def test_audio_projection_full_coverage(full_models):
    pipe = VExpressPipeline(full_models, params={})
    shapes = jax.eval_shape(
        pipe.audio_projection.init, jax.random.PRNGKey(0), jnp.zeros((1, 10, 768))
    )
    _assert_two_way(_converted_shapes(audio_projection_keys()), _flat_shapes(shapes),
                    "audio_projection")


def test_merge_reports_unconsumed(full_models):
    """A misspelled checkpoint key must surface, not be silently dropped."""
    from vexpress_tpu.io.loaders import _merge

    dst = {"a": {"kernel": np.zeros((2, 2))}}
    src = {"a": {"kernel": np.ones((2, 2))}, "typo_module": {"kernel": np.ones((3,))}}
    unconsumed = []
    n = _merge(dst, src, unconsumed=unconsumed)
    assert n == 1
    assert unconsumed == ["/typo_module/kernel"]
