"""Piecewise (per-block VJP) training must produce the same loss and
gradients as jax.grad of the monolithic loss."""

import numpy as np
import jax
import jax.numpy as jnp

from vexpress_tpu.train.train_step import TrainConfig, build_train_step, make_optimizer, mask_tree
from vexpress_tpu.train.piecewise_trainer import PiecewiseTrainer

from .test_pipeline_e2e import tiny_pipeline  # noqa: F401
from .test_train import _tiny_batch


def test_piecewise_grads_match_monolithic(tiny_pipeline):  # noqa: F811
    cfg = TrainConfig.stage("stage_3", num_frames=2, lip_loss_weight=2.0,
                            kps_drop_rate=0.1, reference_drop_rate=0.1)
    params = tiny_pipeline.params
    tx, _ = make_optimizer(params, cfg)

    # monolithic grads (no trainability mask: raw d(loss)/d(params))
    _, loss_fn = build_train_step(tiny_pipeline, cfg, tx, mask=None)
    batch = _tiny_batch(np.random.default_rng(7), b=2, f=2)
    rng = jax.random.PRNGKey(123)
    loss_mono, grads_mono = jax.value_and_grad(loss_fn)(params, batch, rng)

    trainer = PiecewiseTrainer(tiny_pipeline, cfg, tx)
    loss_piece, grads_piece = trainer.loss_and_grads(params, batch, rng)

    np.testing.assert_allclose(float(loss_piece), float(loss_mono), rtol=1e-5)

    flat_mono = dict(jax.tree_util.tree_flatten_with_path(grads_mono)[0])
    flat_piece = dict(jax.tree_util.tree_flatten_with_path(grads_piece)[0])
    assert set(flat_mono.keys()) == set(flat_piece.keys())
    checked = 0
    for path, gm in flat_mono.items():
        gp = flat_piece[path]
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gm), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked > 100  # every leaf compared


def test_piecewise_dp_grads_match_monolithic(tiny_pipeline):  # noqa: F811
    """Piecewise training composes with a DP mesh: batch sharded on "dp",
    params replicated — GSPMD propagates the shardings through every per-block
    forward/vjp program and all-reduces the parameter grads. Values must equal
    the single-device monolithic grads (VERDICT r1 item 4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vexpress_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(n_devices=4)
    cfg = TrainConfig.stage("stage_3", num_frames=2, lip_loss_weight=2.0)
    params = tiny_pipeline.params
    tx, _ = make_optimizer(params, cfg)

    batch = _tiny_batch(np.random.default_rng(9), b=4, f=2)
    rng = jax.random.PRNGKey(321)

    _, loss_fn = build_train_step(tiny_pipeline, cfg, tx, mask=None)
    loss_mono, grads_mono = jax.value_and_grad(loss_fn)(params, batch, rng)

    params_dp = jax.device_put(params, NamedSharding(mesh, P()))
    batch_dp = {k: jax.device_put(v, NamedSharding(mesh, P("dp"))) for k, v in batch.items()}
    trainer = PiecewiseTrainer(tiny_pipeline, cfg, tx)
    loss_piece, grads_piece = trainer.loss_and_grads(params_dp, batch_dp, rng)

    np.testing.assert_allclose(float(loss_piece), float(loss_mono), rtol=1e-5)
    flat_mono = dict(jax.tree_util.tree_flatten_with_path(grads_mono)[0])
    flat_piece = dict(jax.tree_util.tree_flatten_with_path(grads_piece)[0])
    assert set(flat_mono.keys()) == set(flat_piece.keys())
    for path, gm in flat_mono.items():
        np.testing.assert_allclose(
            np.asarray(flat_piece[path]), np.asarray(gm), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_piecewise_step_updates(tiny_pipeline):  # noqa: F811
    from vexpress_tpu.train.train_step import TrainState

    cfg = TrainConfig.stage("stage_2", learning_rate=1e-3)
    params = tiny_pipeline.params
    tx, mask = make_optimizer(params, cfg)
    trainer = PiecewiseTrainer(tiny_pipeline, cfg, tx, mask=mask)
    state = TrainState(params, tx.init(mask_tree(params, mask)), jnp.zeros((), jnp.int32))
    batch = _tiny_batch(np.random.default_rng(8), b=2, f=2)
    state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
