"""Multi-device tests on the virtual 8-device CPU mesh: window-parallel
inference step and ZeRO-2 optimizer-state sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vexpress_tpu.diffusion.ddim import DDIMScheduler
from vexpress_tpu.parallel.mesh import (
    create_mesh,
    shard_opt_state_zero2,
    window_parallel_step,
)
from vexpress_tpu.pipelines.context import compute_context_windows
from vexpress_tpu.pipelines.pipeline import build_blended_denoise_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_window_parallel_step_matches_single_device():
    L, size, overlap = 64, 8, 2
    windows, inv = compute_context_windows(L, size, overlap)
    sched = DDIMScheduler()
    n_steps = 3
    rng = np.random.default_rng(0)
    lat0 = jnp.asarray(rng.normal(size=(L, 4, 4, 4)).astype(np.float32))

    def predict(lat, t, w_idx, cond):
        mixed = jnp.mean(lat, axis=1, keepdims=True) + 0.1 * lat
        return jnp.tanh(mixed + 0.001 * t)

    single = build_blended_denoise_step(predict, sched, windows, inv, n_steps, window_group=2)
    mesh = create_mesh()
    multi = jax.jit(window_parallel_step(predict, sched, windows, inv, n_steps, mesh, window_group=1))

    lat_s, lat_m = lat0, lat0
    for t in sched.timesteps(n_steps):
        tt = jnp.asarray(int(t))
        lat_s = single(lat_s, tt, None)
        lat_m = multi(lat_m, tt, None)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_m), atol=1e-5, rtol=1e-5)


def test_zero2_opt_state_sharding():
    mesh = create_mesh()
    params = {
        "dense": {"kernel": jnp.zeros((64, 32)), "bias": jnp.zeros((32,))},
        "scalar": jnp.zeros(()),
        "odd": jnp.zeros((7, 3)),  # not divisible by 8 -> replicated
    }
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    shardings = shard_opt_state_zero2(state, mesh)
    state = jax.device_put(state, shardings)

    mu = state[0].mu
    # kernel sharded over largest divisible axis
    sh = mu["dense"]["kernel"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("dp", None)
    assert mu["odd"].sharding.spec == jax.sharding.PartitionSpec()

    # a sharded update still works under jit
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def update(g, s, p):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u), s2

    new_params, new_state = update(grads, state, params)
    assert np.isfinite(np.asarray(new_params["dense"]["kernel"])).all()
