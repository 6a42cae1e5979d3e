"""Training-step tests: stage trainability masks, loss finiteness, parameter
updates restricted to the right modules, DP-sharded execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from vexpress_tpu.parallel.mesh import create_mesh, shard_opt_state_zero2
from vexpress_tpu.train.train_step import (
    mask_tree,
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

    state = TrainState(params, tx.init(mask_tree(params, mask)), jnp.zeros((), jnp.int32))
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


def test_gradient_checkpointing_matches(tiny_pipeline):  # noqa: F811
    """Monolithic-path per-block jax.checkpoint (reference train.py:448-451):
    outputs and gradients must equal the non-checkpointed model exactly."""
    import dataclasses

    from vexpress_tpu.models.unet_3d import DenoisingUNet3D

    cfg = dataclasses.replace(tiny_pipeline.m.unet_config, gradient_checkpointing=True)
    unet_gc = DenoisingUNet3D(cfg)
    unet = tiny_pipeline.denoising_unet
    params = tiny_pipeline.params["denoising_unet"]

    rng = np.random.default_rng(17)
    B, F, h, w = 1, 2, 8, 8
    shapes = cfg.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.asarray(rng.normal(size=(B, l, c)).astype(np.float32)) for l, c in shapes)
    sample = jnp.asarray(rng.normal(size=(B, F, h, w, 4)).astype(np.float32))
    t = jnp.asarray([250])
    audio = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))
    kps = jnp.asarray(rng.normal(size=(B, F, h, w, 8)).astype(np.float32))

    out_a = unet.apply(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    out_b = unet_gc.apply(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    # remat changes XLA fusion order -> ~1e-6 float noise
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=1e-5)

    def loss(model):
        def fn(p):
            out = model.apply(p, sample, t, audio, ref_feats, kps, 0.9, 2.0)
            return (out.astype(jnp.float32) ** 2).mean()
        return fn

    ga = jax.grad(loss(unet))(params)
    gb = jax.grad(loss(unet_gc))(params)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(ga)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(gb)[0])
    assert set(flat_a) == set(flat_b)
    for path, va in flat_a.items():
        np.testing.assert_allclose(np.asarray(flat_b[path]), np.asarray(va),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_reference_drop_rate_semantics(tiny_pipeline):  # noqa: F811
    """reference_drop_rate drops the reference banks per sample at train time
    (mutual_self_attention.py:210-213). With rate 1.0 every bank is zeroed, so
    the loss must be invariant to the reference image content."""
    cfg = TrainConfig.stage("stage_3", num_frames=2, reference_drop_rate=1.0,
                            uncond_ratio=0.0)
    params = tiny_pipeline.params
    tx, _ = make_optimizer(params, cfg)
    _, loss_fn = build_train_step(tiny_pipeline, cfg, tx, mask=None)

    rng_np = np.random.default_rng(13)
    batch_a = _tiny_batch(rng_np, b=2, f=2)
    batch_b = dict(batch_a)
    batch_b["reference_image"] = rng_np.uniform(-1, 1, size=batch_a["reference_image"].shape).astype(np.float32)

    key = jax.random.PRNGKey(77)
    la = float(loss_fn(params, batch_a, key))
    lb = float(loss_fn(params, batch_b, key))
    assert la == lb, (la, lb)

    # rate 0.0: the reference image must matter
    cfg0 = TrainConfig.stage("stage_3", num_frames=2, reference_drop_rate=0.0,
                             uncond_ratio=0.0)
    _, loss_fn0 = build_train_step(tiny_pipeline, cfg0, tx, mask=None)
    la0 = float(loss_fn0(params, batch_a, key))
    lb0 = float(loss_fn0(params, batch_b, key))
    assert la0 != lb0


def test_stage_zero_init(tiny_pipeline):  # noqa: F811
    """Stage-start zeroing (reference train.py:363-390): after it, the audio
    cross-attention and motion-module branches of the denoising UNet are exact
    no-ops, so the recipe starts each stage from the unconditioned model."""
    from vexpress_tpu.train.train_step import stage_zero_init

    params = tiny_pipeline.params
    z = stage_zero_init(params, "stage_2")

    n_zeroed = 0
    flat = jax.tree_util.tree_flatten_with_path(z["denoising_unet"])[0]
    for path, leaf in flat:
        parts = [getattr(p, "key", "") for p in path]
        hit = any(
            (parts[i - 1] == "attn2" and parts[i] == "to_out_0")
            or (parts[i - 1] == "temporal_transformer" and parts[i] == "proj_out")
            for i in range(1, len(parts))
        )
        if hit:
            assert np.all(np.asarray(leaf) == 0), parts
            n_zeroed += 1
    assert n_zeroed >= 8  # kernels+biases across blocks

    # stage_2_resume must NOT zero (train.py:380-381)
    zr = stage_zero_init(params, "stage_2_resume")
    assert zr is params

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        stage_zero_init(params, "stage_42")

    # behavioral check: output invariant to audio tokens and to interior
    # motion-module weights (their outputs are projected through zeros)
    cfg = tiny_pipeline.m.unet_config
    rng = np.random.default_rng(5)
    B, F, h, w = 1, 2, 8, 8
    shapes = cfg.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.asarray(rng.normal(size=(B, l, c)).astype(np.float32)) for l, c in shapes)
    sample = jnp.asarray(rng.normal(size=(B, F, h, w, 4)).astype(np.float32))
    t = jnp.asarray([100])
    kps = jnp.asarray(rng.normal(size=(B, F, h, w, 8)).astype(np.float32))
    audio_a = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))
    audio_b = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))

    apply = tiny_pipeline.denoising_unet.apply
    out_a = apply(z["denoising_unet"], sample, t, audio_a, ref_feats, kps, 0.9, 2.0)
    out_b = apply(z["denoising_unet"], sample, t, audio_b, ref_feats, kps, 0.9, 2.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def scale_motion_interior(path, leaf):
        parts = [getattr(p, "key", "") for p in path]
        if any(p.startswith("motion_modules") for p in parts) and "proj_out" not in parts:
            return leaf * 7.0
        return leaf

    z2 = dict(z)
    z2["denoising_unet"] = jax.tree_util.tree_map_with_path(
        scale_motion_interior, z["denoising_unet"]
    )
    out_c = apply(z2["denoising_unet"], sample, t, audio_a, ref_feats, kps, 0.9, 2.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_c), atol=1e-5)


def test_train_step_sharded_dp(tiny_pipeline):  # noqa: F811
    cfg = TrainConfig.stage("stage_1", learning_rate=1e-4, num_frames=2)
    params = tiny_pipeline.params
    tx, mask = make_optimizer(params, cfg)
    step_fn, _ = build_train_step(tiny_pipeline, cfg, tx, mask=mask)

    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp"))

    params = jax.device_put(params, repl)
    opt_state = tx.init(mask_tree(params, mask))
    opt_state = jax.device_put(opt_state, shard_opt_state_zero2(opt_state, mesh))
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    batch = _tiny_batch(np.random.default_rng(1), b=8, f=2)
    batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}

    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
