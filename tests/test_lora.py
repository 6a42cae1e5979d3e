"""LoRA fine-tuning (train/lora.py): placement, exact no-op init, factor
gradients vs direct autodiff through the merge, piecewise-trainer step
semantics, and peft-layout torch interop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vexpress_tpu.train.lora import (
    LoraConfig,
    LoraPiecewiseTrainer,
    build_lora_train_step,
    init_lora,
    lora_from_torch_state_dict,
    lora_mask,
    lora_to_torch_state_dict,
    merge_lora,
    project_grads,
)
from vexpress_tpu.train.train_step import TrainConfig, TrainState, build_train_step

from .test_pipeline_e2e import tiny_pipeline  # noqa: F401
from .test_train import _tiny_batch


def _count_target_kernels(params, module, targets=("to_q", "to_k", "to_v", "to_out_0")):
    n = 0
    flat = jax.tree_util.tree_flatten_with_path(params[module])[0]
    for path, leaf in flat:
        parts = [getattr(p, "key", "") for p in path]
        if len(parts) >= 2 and parts[-1] == "kernel" and parts[-2] in targets \
                and leaf.ndim == 2:
            n += 1
    return n


def _randomize_b(lora, seed=3):
    """init_lora zeroes lora_b (exact no-op start); tests of the gradient
    projection need a NON-trivial point, so fill B with small noise."""
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = getattr(path[-1], "key", "")
        if name == "lora_b":
            return (0.05 * rng.standard_normal(leaf.shape)).astype(np.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(fill, lora)


def test_init_is_exact_noop(tiny_pipeline):  # noqa: F811
    params = tiny_pipeline.params
    cfg = LoraConfig(rank=2)
    lora = init_lora(params, cfg)
    merged = merge_lora(params, lora, cfg)
    # identical structure, bit-identical values (B = 0 -> delta = 0; fp32 add
    # of an exact zero is exact)
    assert (jax.tree_util.tree_structure(merged)
            == jax.tree_util.tree_structure(params))
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = dict(jax.tree_util.tree_flatten_with_path(merged)[0])
    n_alias = 0
    for path, leaf in flat_p:
        m = flat_m[path]
        np.testing.assert_array_equal(np.asarray(m), np.asarray(leaf),
                                      err_msg=jax.tree_util.keystr(path))
        if m is leaf:
            n_alias += 1
    # the frozen base is aliased, not copied (all leaves except adapted kernels)
    n_adapted = sum(1 for p, _ in flat_p
                    if jax.tree_util.keystr(p).endswith("['kernel']")
                    and any(t in jax.tree_util.keystr(p)
                            for t in ("to_q", "to_k", "to_v", "to_out_0"))) \
        - _count_target_kernels(params, "vae") \
        - _count_target_kernels(params, "audio_projection") \
        - _count_target_kernels(params, "reference_net") \
        - _count_target_kernels(params, "wav2vec2")
    assert n_alias >= len(flat_p) - n_adapted


def test_placement_counts_and_errors(tiny_pipeline):  # noqa: F811
    params = tiny_pipeline.params
    lora = init_lora(params, LoraConfig(rank=2))
    n_pairs = sum(1 for p, _ in jax.tree_util.tree_flatten_with_path(lora)[0]
                  if jax.tree_util.keystr(p).endswith("['lora_a']"))
    assert n_pairs == _count_target_kernels(params, "denoising_unet")

    # include regex narrows placement (audio cross-attention only)
    lora_a2 = init_lora(params, LoraConfig(rank=2, include=r"/attn2/"))
    n_a2 = sum(1 for p, _ in jax.tree_util.tree_flatten_with_path(lora_a2)[0]
               if jax.tree_util.keystr(p).endswith("['lora_a']"))
    assert 0 < n_a2 < n_pairs
    for path, _ in jax.tree_util.tree_flatten_with_path(lora_a2)[0]:
        assert "attn2" in jax.tree_util.keystr(path)

    # both unets
    lora_both = init_lora(params, LoraConfig(
        rank=2, modules=("denoising_unet", "reference_net")))
    assert "reference_net" in lora_both

    with pytest.raises(ValueError, match="matched no kernels"):
        init_lora(params, LoraConfig(include=r"no_such_module_anywhere"))
    with pytest.raises(ValueError, match="not in params"):
        init_lora(params, LoraConfig(modules=("nonexistent",)))


def test_mask_marks_only_adapted_kernels(tiny_pipeline):  # noqa: F811
    params = tiny_pipeline.params
    cfg = LoraConfig(rank=2, include=r"/attn1/")
    lora = init_lora(params, cfg)
    mask = lora_mask(params, lora)
    assert jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(params)
    n_true = 0
    for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]:
        s = jax.tree_util.keystr(path)
        if v:
            n_true += 1
            assert "attn1" in s and s.endswith("['kernel']"), s
    n_pairs = sum(1 for p, _ in jax.tree_util.tree_flatten_with_path(lora)[0]
                  if jax.tree_util.keystr(p).endswith("['lora_a']"))
    assert n_true == n_pairs > 0


def test_factor_grads_match_autodiff_through_merge(tiny_pipeline):  # noqa: F811
    """The heart of the design: projecting the dense kernel gradients (what
    the piecewise chain produces) onto the factors must equal jax.grad of the
    loss w.r.t. the factors directly."""
    params = tiny_pipeline.params
    cfg = LoraConfig(rank=2, alpha=4.0)
    lora = _randomize_b(init_lora(params, cfg))
    tcfg = TrainConfig.stage("stage_2", num_frames=2)
    batch = _tiny_batch(np.random.default_rng(5), b=1, f=2)
    rng = jax.random.PRNGKey(11)

    import optax

    # ground truth: autodiff straight through the merge
    _, lora_loss = build_lora_train_step(tiny_pipeline, tcfg, optax.sgd(1e-3), cfg)
    loss_gt, grads_gt = jax.value_and_grad(lora_loss)(lora, batch, rng)

    # the piecewise-path computation: dense grads at the merged point, projected
    _, loss_fn = build_train_step(tiny_pipeline, tcfg, optax.sgd(1e-3))
    merged = merge_lora(params, lora, cfg)
    loss_dense, dense_grads = jax.value_and_grad(loss_fn)(merged, batch, rng)
    projected = project_grads({"denoising_unet": dense_grads["denoising_unet"]},
                              lora, cfg)

    np.testing.assert_allclose(float(loss_dense), float(loss_gt), rtol=1e-6)
    flat_gt = dict(jax.tree_util.tree_flatten_with_path(grads_gt)[0])
    flat_pr = dict(jax.tree_util.tree_flatten_with_path(projected)[0])
    assert set(flat_gt) == set(flat_pr)
    for path, g in flat_gt.items():
        np.testing.assert_allclose(
            np.asarray(flat_pr[path]), np.asarray(g), atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_lora_piecewise_trainer_step(tiny_pipeline):  # noqa: F811
    import optax

    params_before = tiny_pipeline.params
    cfg = LoraConfig(rank=2, alpha=4.0, include=r"/attn1/")
    tcfg = TrainConfig.stage("stage_2", num_frames=2)
    trainer = LoraPiecewiseTrainer(tiny_pipeline, tcfg, optax.adam(1e-2), cfg)
    state = TrainState(trainer.lora, trainer.tx.init(trainer.lora),
                       jnp.zeros((), jnp.int32))
    batch = _tiny_batch(np.random.default_rng(6), b=2, f=2)
    state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # factors moved; base params untouched (same objects)
    moved = 0
    for (p1, a), (_p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(state2.params)[0]):
        if not np.allclose(np.asarray(a), np.asarray(b)):
            moved += 1
    assert moved > 0
    assert tiny_pipeline.params is params_before

    # piecewise LoRA step == monolithic LoRA step (same loss at the same point)
    step_mono, _ = build_lora_train_step(
        tiny_pipeline, tcfg, optax.adam(1e-2), cfg)
    state_m = TrainState(trainer.lora, optax.adam(1e-2).init(trainer.lora),
                         jnp.zeros((), jnp.int32))
    _, metrics_m = step_mono(state_m, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics_m["loss"]),
                               rtol=1e-5)


def test_torch_state_dict_roundtrip(tiny_pipeline):  # noqa: F811
    params = tiny_pipeline.params
    cfg = LoraConfig(rank=2, alpha=16.0)
    lora = _randomize_b(init_lora(params, cfg))
    sd = lora_to_torch_state_dict(lora, cfg)

    # peft layout: lora_A.weight (r, in), lora_B.weight (out, r), torch-style
    # dotted module keys (list indices expanded)
    a_keys = [k for k in sd if k.endswith(".lora_A.weight")]
    b_keys = [k for k in sd if k.endswith(".lora_B.weight")]
    assert len(a_keys) == len(b_keys) > 0
    assert float(sd["lora_alpha"]) == 16.0
    k0 = a_keys[0]
    assert ".params." not in k0
    assert sd[k0].shape[0] == 2  # (r, in)
    assert sd[k0.replace("lora_A", "lora_B")].shape[1] == 2  # (out, r)

    tree, alpha = lora_from_torch_state_dict(sd, params)
    assert alpha == 16.0
    flat_in = dict(jax.tree_util.tree_flatten_with_path(lora)[0])
    flat_out = dict(jax.tree_util.tree_flatten_with_path(tree)[0])
    assert set(flat_in) == set(flat_out)
    for path, v in flat_in.items():
        np.testing.assert_array_equal(np.asarray(flat_out[path]), np.asarray(v),
                                      err_msg=jax.tree_util.keystr(path))

    # strictness: unknown adapter prefixes and bad shapes raise
    with pytest.raises(ValueError, match="matches no kernel"):
        lora_from_torch_state_dict(
            {"denoising_unet.nope.lora_A.weight": np.zeros((2, 4), np.float32),
             "denoising_unet.nope.lora_B.weight": np.zeros((4, 2), np.float32)},
            params)
    bad = dict(sd)
    bad[k0] = np.zeros((2, 9999), np.float32)
    with pytest.raises(ValueError, match="do not fit"):
        lora_from_torch_state_dict(bad, params)


def test_load_and_merge_passthrough_identity(tiny_pipeline, tmp_path):  # noqa: F811
    """load_and_merge_lora only routes adapted top-level modules through the
    merge program: untouched subtrees come back as the SAME buffers (no
    transient HBM copy; cli/infer.py relies on `is` to keep the save_memory
    host copies valid across the merge)."""
    from vexpress_tpu.io.torch_export import save_torch_checkpoint
    from vexpress_tpu.train.lora import load_and_merge_lora

    params = tiny_pipeline.params
    cfg = LoraConfig(rank=2, alpha=16.0, modules=("denoising_unet",))
    lora = _randomize_b(init_lora(params, cfg))
    path = str(tmp_path / "adapter.pth")
    save_torch_checkpoint(lora_to_torch_state_dict(lora, cfg), path)

    merged = load_and_merge_lora(params, path)
    assert set(merged) == set(params)
    # adapted module: new tree, values shifted by scale * A@B
    assert merged["denoising_unet"] is not params["denoising_unet"]
    # every other module passes through untouched, same object identity
    for k in params:
        if k != "denoising_unet":
            assert merged[k] is params[k], k
