"""IO tests: torch import/export roundtrip and orbax train-state save/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from vexpress_tpu.io.torch_export import (
    export_to_torch_state_dict,
    filter_motion_module,
    save_torch_checkpoint,
)
from vexpress_tpu.io.torch_import import convert_torch_state_dict, load_torch_checkpoint
from vexpress_tpu.io.checkpoints import (
    export_modules,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from vexpress_tpu.train.train_step import TrainState

from .oracles.torch_unet import OUNet
from .oracles.torch_conditioning import OAudioProjection
from .test_parity_unet import TINY


def _trees_equal(a, b):
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]), atol=0,
                                   err_msg=jax.tree_util.keystr(path))


def test_unet_export_import_roundtrip():
    torch.manual_seed(0)
    o = OUNet(TINY, temporal=True)
    sd_ref = o.state_dict()
    params = convert_torch_state_dict(sd_ref)
    sd_out = export_to_torch_state_dict(params)
    # every torch key must roundtrip exactly (minus skipped buffers)
    skipped = {k for k in sd_ref if "pos_encoder.pe" in k}
    assert set(sd_out.keys()) == set(sd_ref.keys()) - skipped
    for k in sd_out:
        np.testing.assert_allclose(sd_out[k], sd_ref[k].numpy(), atol=0, err_msg=k)


def test_audio_projection_roundtrip():
    torch.manual_seed(0)
    o = OAudioProjection(dim=16, depth=2, dim_head=4, heads=2, num_queries=5,
                         embedding_dim=12, output_dim=12, ff_mult=2, max_seq_len=10)
    sd_ref = o.state_dict()
    params = convert_torch_state_dict(sd_ref)
    sd_out = export_to_torch_state_dict(params)
    assert set(sd_out.keys()) == set(sd_ref.keys())
    for k in sd_out:
        np.testing.assert_allclose(sd_out[k], sd_ref[k].numpy(), atol=0, err_msg=k)


def test_motion_module_filter():
    torch.manual_seed(0)
    o = OUNet(TINY, temporal=True)
    sd = export_to_torch_state_dict(convert_torch_state_dict(o.state_dict()))
    mm = filter_motion_module(sd)
    assert mm and all("motion_module" in k for k in mm)


def test_torch_checkpoint_file_roundtrip(tmp_path):
    sd = {"a.weight": np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)}
    path = str(tmp_path / "m.pth")
    save_torch_checkpoint(sd, path)
    loaded = load_torch_checkpoint(path)
    np.testing.assert_allclose(loaded["a.weight"], sd["a.weight"])


def test_orbax_save_restore(tmp_path):
    params = {"m": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.adamw(1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(7, jnp.int32))
    path = save_train_state(str(tmp_path), 7, state)
    assert latest_checkpoint(str(tmp_path)) == path

    template = TrainState(
        jax.tree_util.tree_map(jnp.zeros_like, params),
        tx.init(jax.tree_util.tree_map(jnp.zeros_like, params)),
        jnp.asarray(0, jnp.int32),
    )
    restored = restore_train_state(path, template)
    assert int(restored.step) == 7
    _trees_equal(restored.params, params)
