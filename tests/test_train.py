"""Training-step tests: stage trainability masks, loss finiteness, parameter
updates restricted to the right modules, DP-sharded execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from vexpress_tpu.parallel.mesh import create_mesh, shard_opt_state_zero2
from vexpress_tpu.train.train_step import (
    TrainConfig,
    TrainState,
    build_train_step,
    make_optimizer,
    trainable_mask,
)

from .test_pipeline_e2e import tiny_pipeline  # fixture reuse  # noqa: F401


def _tiny_batch(rng, b=2, f=2, H=64, W=64):
    h, w = H // 8, W // 8
    return {
        "target_images": rng.uniform(-1, 1, size=(b, f, H, W, 3)).astype(np.float32),
        "reference_image": rng.uniform(-1, 1, size=(b, H, W, 3)).astype(np.float32),
        "kps_images": rng.uniform(0, 1, size=(b, f, H, W, 3)).astype(np.float32),
        "audio_frame_embeddings": rng.normal(size=(b, f, 10, 16)).astype(np.float32),
        "lip_masks": rng.uniform(0, 1, size=(b, f, h, w)).astype(np.float32),
    }


def test_trainable_mask_stages(tiny_pipeline):  # noqa: F811
    params = tiny_pipeline.params
    m1 = trainable_mask(params, TrainConfig.stage("stage_1"))
    m2 = trainable_mask(params, TrainConfig.stage("stage_2"))

    def any_true(tree):
        return any(jax.tree_util.tree_leaves(tree))

    def all_false(tree):
        return not any_true(tree)

    # stage 1: unet/refnet/guider train; audio + motion frozen; vae/wav2vec2 frozen
    assert all_false(m1["vae"]) and all_false(m1["wav2vec2"])
    assert all_false(m1["audio_projection"])
    assert any_true(m1["reference_net"]) and any_true(m1["v_kps_guider"])
    # reference_net up_blocks_3 always frozen
    assert all_false(m1["reference_net"]["params"]["up_blocks_3"])
    # denoising unet: motion modules frozen, attn2 frozen in stage 1
    flat = jax.tree_util.tree_flatten_with_path(m1["denoising_unet"])[0]
    for path, v in flat:
        parts = [getattr(p, "key", "") for p in path]
        if any(p.startswith("motion_modules") for p in parts):
            assert not v, parts
        elif any(p in ("attn2", "norm2") for p in parts) and any(
            p.startswith("attentions") for p in parts
        ):
            assert not v, parts

    # stage 2: ONLY motion modules + attn2/norm2 + audio projection train
    assert any_true(m2["audio_projection"]) and all_false(m2["v_kps_guider"])
    assert all_false(m2["reference_net"])
    flat2 = jax.tree_util.tree_flatten_with_path(m2["denoising_unet"])[0]
    for path, v in flat2:
        parts = [getattr(p, "key", "") for p in path]
        is_motion = any(p.startswith("motion_modules") for p in parts)
        is_audio_attn = any(p in ("attn2", "norm2") for p in parts) and any(
            p.startswith("attentions") for p in parts
        )
        assert v == (is_motion or is_audio_attn), parts


def test_train_step_updates_only_trainable(tiny_pipeline):  # noqa: F811
    cfg = TrainConfig.stage("stage_2", learning_rate=1e-3, lip_loss_weight=2.0)
    params = tiny_pipeline.params
    tx, mask = make_optimizer(params, cfg)
    step_fn, loss_fn = build_train_step(tiny_pipeline, cfg, tx, mask=mask)

    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    batch = _tiny_batch(np.random.default_rng(0))
    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))

    assert np.isfinite(float(metrics["loss"]))

    # frozen leaves unchanged; some trainable leaf changed
    changed, frozen_changed = 0, 0
    flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(state2.params)[0])
    flat_mask = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
    for path, old in flat_old:
        new = flat_new[path]
        diff = not np.allclose(np.asarray(old), np.asarray(new))
        if flat_mask[path]:
            changed += int(diff)
        else:
            frozen_changed += int(diff)
    assert frozen_changed == 0
    assert changed > 0


def test_train_step_sharded_dp(tiny_pipeline):  # noqa: F811
    cfg = TrainConfig.stage("stage_1", learning_rate=1e-4, num_frames=2)
    params = tiny_pipeline.params
    tx, mask = make_optimizer(params, cfg)
    step_fn, _ = build_train_step(tiny_pipeline, cfg, tx, mask=mask)

    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp"))

    params = jax.device_put(params, repl)
    opt_state = tx.init(params)
    opt_state = jax.device_put(opt_state, shard_opt_state_zero2(opt_state, mesh))
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    batch = _tiny_batch(np.random.default_rng(1), b=8, f=2)
    batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}

    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
