"""Blockwise 8-bit AdamW (train/adam8bit.py) — the bitsandbytes AdamW8bit
analog the reference enables via solver.use_8bit_adam (train.py:464-472)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vexpress_tpu.train.adam8bit import (
    Adam8bitState,
    _QTensor,
    _dequantize_signed,
    _dequantize_sqrt,
    _quantize_signed,
    _quantize_sqrt,
    adam8bit,
)


def test_signed_roundtrip_relative_error():
    """mu-law companding: near-constant relative error across magnitudes."""
    rs = np.random.RandomState(0)
    x = (rs.choice([-1, 1], 4096) * 10.0 ** rs.uniform(-3, 0, 4096)).astype(np.float32)
    q = _quantize_signed(jnp.asarray(x), 256)
    assert q.codes.dtype == jnp.int8
    y = np.asarray(_dequantize_signed(q, x.shape))
    rel = np.abs(y - x) / np.abs(x)
    # elements above ~1% of block max keep ~2-3% relative accuracy
    blockmax = np.repeat(np.abs(x.reshape(-1, 256)).max(axis=1), 256)
    big = np.abs(x) > 0.01 * blockmax
    assert rel[big].max() < 0.05, rel[big].max()
    assert np.sign(y[big]).tolist() == np.sign(x[big]).tolist()


def test_sqrt_roundtrip_relative_error():
    rs = np.random.RandomState(1)
    # second moments span a huge dynamic range
    x = (10.0 ** rs.uniform(-12, -2, size=(4096,))).astype(np.float32)
    q = _quantize_sqrt(jnp.asarray(x), 256)
    assert q.codes.dtype == jnp.int8
    y = np.asarray(_dequantize_sqrt(q, x.shape))
    # relative error of the Adam denominator sqrt(v) stays small wherever
    # sqrt(v) is above ~1% of its block max
    r_true, r_q = np.sqrt(x), np.sqrt(np.maximum(y, 0))
    blockmax = np.repeat(r_true.reshape(-1, 256).max(axis=1), 256)
    big = r_true > 0.01 * blockmax
    rel = np.abs(r_q[big] - r_true[big]) / r_true[big]
    assert rel.max() < 0.05, rel.max()


def test_zero_blocks_roundtrip():
    x = jnp.zeros((512,), jnp.float32)
    assert np.asarray(_dequantize_signed(_quantize_signed(x, 256), x.shape)).max() == 0
    assert np.asarray(_dequantize_sqrt(_quantize_sqrt(x, 256), x.shape)).max() == 0


def test_trajectory_matches_adamw():
    """Optimizing a quadratic: adam8bit must track optax.adamw closely."""
    rs = np.random.RandomState(2)
    target = jnp.asarray(rs.randn(64, 80).astype(np.float32))
    params = {"w": jnp.zeros((64, 80), jnp.float32)}

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2)

    lr, wd = 1e-2, 1e-2
    tx_ref = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    tx_q = adam8bit(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd, min_quant_size=1)

    p_ref, p_q = params, params
    s_ref, s_q = tx_ref.init(p_ref), tx_q.init(p_q)

    def run(p, s, tx):
        for _ in range(50):
            g = jax.grad(loss_fn)(p)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p

    p_ref = run(p_ref, s_ref, tx_ref)
    p_q = run(p_q, s_q, tx_q)
    # both should approach the target similarly; parameter trajectories agree
    # to quantization noise
    diff = np.abs(np.asarray(p_ref["w"]) - np.asarray(p_q["w"])).max()
    scale = np.abs(np.asarray(p_ref["w"])).max()
    # ~6% worst-element drift after 50 steps of requantization noise
    # (mu-law ~2% relative/step on both momenta) — bnb-class behavior
    assert diff < 0.08 * scale + 1e-3, (diff, scale)
    assert float(loss_fn(p_q)) < 0.9 * float(loss_fn({"w": params["w"]}))


def test_state_is_int8_for_large_leaves():
    params = {"big": jnp.zeros((4096,), jnp.float32), "small": jnp.zeros((8,), jnp.float32)}
    tx = adam8bit(1e-3, min_quant_size=4096)
    s = tx.init(params)
    assert isinstance(s.mu["big"], _QTensor) and s.mu["big"].codes.dtype == jnp.int8
    assert isinstance(s.nu["big"], _QTensor) and s.nu["big"].codes.dtype == jnp.int8
    assert isinstance(s.mu["small"], jnp.ndarray) and s.mu["small"].dtype == jnp.float32
    # memory: int8 codes + fp32 scale per 256 elements ~= 1.016 B/elem
    nbytes = s.mu["big"].codes.size + s.mu["big"].scales.size * 4
    assert nbytes <= 4096 * 1.1


def test_composes_with_clip_and_masked_under_jit():
    params = {"a": jnp.ones((4096,)), "b": jnp.ones((16,))}
    mask = {"a": True, "b": False}
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.masked(adam8bit(1e-2), mask),
    )
    s = tx.init(params)

    @jax.jit
    def step(p, s):
        # frozen leaves get zero grads in the real train step (stop_gradient,
        # train_step.py) — optax.masked passes masked-out updates through raw
        g = {"a": jnp.ones_like(p["a"]), "b": jnp.zeros_like(p["b"])}
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    p1, s1 = step(params, s)
    p2, _ = step(p1, s1)
    assert not np.allclose(np.asarray(p1["a"]), 1.0)  # updated
    assert np.allclose(np.asarray(p1["b"]), 1.0)  # masked out
    assert np.isfinite(np.asarray(p2["a"])).all()


def test_make_optimizer_8bit_wiring():
    from vexpress_tpu.train.train_step import TrainConfig, make_optimizer

    params = {"denoising_unet": {"params": {"w": jnp.zeros((4096,), jnp.float32)}}}
    cfg = TrainConfig(reduce_optimizer_memory=True)
    tx, _ = make_optimizer(params, cfg)
    s = tx.init(params)
    leaves = jax.tree_util.tree_leaves(s)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves), "no int8 state found"


def test_lr_schedule_alignment_matches_adamw():
    """With a callable lr schedule and quantization disabled (tiny leaves stay
    fp32), adam8bit must be a bit-for-bit drop-in for optax.adamw — including
    the schedule lookup step index (regression: lr was read at count+1,
    shifting every step to the next schedule value)."""
    schedule = optax.linear_schedule(init_value=1e-2, end_value=1e-4, transition_steps=5)
    tx_ref = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
    tx_q = adam8bit(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
                    min_quant_size=10**9)

    rs = np.random.RandomState(3)
    p_ref = p_q = {"w": jnp.asarray(rs.randn(4, 6).astype(np.float32))}
    s_ref, s_q = tx_ref.init(p_ref), tx_q.init(p_q)
    for step in range(8):
        g = {"w": jnp.asarray(rs.randn(4, 6).astype(np.float32))}
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        u_q, s_q = tx_q.update(g, s_q, p_q)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_q = optax.apply_updates(p_q, u_q)
        np.testing.assert_allclose(
            np.asarray(u_q["w"]), np.asarray(u_ref["w"]), atol=1e-7, rtol=1e-6,
            err_msg=f"step {step}")
