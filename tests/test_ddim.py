"""DDIM scheduler: closed-form invariants and denoise-loop sanity.

The reference uses diffusers DDIMScheduler with the inference_v2.yaml kwargs;
these tests pin the semantics (beta table, zero-SNR rescale, trailing spacing,
v-prediction step algebra, add_noise/get_velocity identities)."""

import numpy as np
import jax.numpy as jnp

from vexpress_tpu.diffusion.ddim import DDIMScheduler, SchedulerConfig


def make(**kw):
    return DDIMScheduler(SchedulerConfig(**kw))


def test_beta_table_scaled_linear():
    s = make(rescale_betas_zero_snr=False)
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(s.betas, betas, rtol=1e-6)


def test_zero_snr_rescale_terminal():
    s = make(rescale_betas_zero_snr=True)
    assert s.alphas_cumprod[-1] == 0.0
    # first alpha_bar is preserved by the rescale construction
    s0 = make(rescale_betas_zero_snr=False)
    np.testing.assert_allclose(s.alphas_cumprod[0], s0.alphas_cumprod[0], rtol=1e-5)
    assert np.all(np.diff(s.alphas_cumprod) < 0)


def test_trailing_timesteps():
    s = make()
    ts = s.timesteps(25)
    assert ts[0] == 999 and ts[-1] == 39 and len(ts) == 25
    assert np.all(np.diff(ts) == -40)


def test_leading_timesteps_offset():
    s = make(timestep_spacing="leading", steps_offset=1)
    ts = s.timesteps(25)
    assert len(ts) == 25 and ts[-1] == 1 and ts[0] == 961


def test_add_noise_get_velocity_consistency():
    s = make(rescale_betas_zero_snr=False)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    xt = s.add_noise(x0, noise, t)
    v = s.get_velocity(x0, noise, t)
    a = s.alphas_cumprod[np.asarray(t)].reshape(-1, 1, 1, 1)
    # identity: sqrt(a)*xt - sqrt(1-a)*... recovers x0: x0 = sqrt(a)*xt - sqrt(1-a)*v
    x0_rec = np.sqrt(a) * np.asarray(xt) - np.sqrt(1 - a) * np.asarray(v)
    np.testing.assert_allclose(x0_rec, np.asarray(x0), atol=1e-5)


def test_step_vpred_perfect_model_recovers_x0():
    """With a model that predicts the exact velocity, iterating DDIM from x_T
    reaches x_0 (deterministic sampler consistency)."""
    s = make()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 2, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 2, 4, 4)).astype(np.float32))

    n_steps = 25
    ts = s.timesteps(n_steps)
    # start from x_T: with zero-SNR, alpha_bar(999) = 0 -> x_T = noise
    sample = s.add_noise(x0, noise, jnp.asarray([int(ts[0])]))
    for t in ts:
        v = s.get_velocity(x0, noise, jnp.asarray([int(t)]))
        sample = s.step(v, jnp.asarray(int(t)), sample, n_steps)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_step_epsilon_matches_vpred_equivalence():
    """epsilon- and v-parameterizations of the same underlying (x0, noise) pair
    must produce identical DDIM trajectories."""
    se = make(prediction_type="epsilon", rescale_betas_zero_snr=False)
    sv = make(prediction_type="v_prediction", rescale_betas_zero_snr=False)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 2, 2, 2)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 2, 2, 2)).astype(np.float32))
    t = 489
    xt = se.add_noise(x0, noise, jnp.asarray([t]))
    out_e = se.step(noise, jnp.asarray(t), xt, 25)
    v = sv.get_velocity(x0, noise, jnp.asarray([t]))
    out_v = sv.step(v, jnp.asarray(t), xt, 25)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_v), atol=1e-5)


def test_snr():
    s = make(rescale_betas_zero_snr=False)
    t = jnp.asarray([0, 500, 999])
    snr = np.asarray(s.snr(t))
    a = s.alphas_cumprod[np.asarray(t)]
    np.testing.assert_allclose(snr, a / (1 - a), rtol=1e-5)


def test_eta_stochastic_step():
    """eta>0 (stochastic DDIM, Song et al. eq. 12): variance of prev_sample
    around the deterministic direction equals sigma_t^2; eta=0 unchanged."""
    import jax

    sched = DDIMScheduler(prediction_type="epsilon", rescale_betas_zero_snr=False)
    n_steps = 10
    t = int(sched.timesteps(n_steps)[3])
    x = jnp.ones((2, 4, 4, 1), jnp.float32) * 0.3
    eps = jnp.ones_like(x) * 0.1

    det = sched.step(eps, t, x, n_steps)

    # expected sigma_t
    a_t = float(sched.alphas_cumprod[t])
    t_prev = t - sched.config.num_train_timesteps // n_steps
    a_prev = float(sched.alphas_cumprod[t_prev]) if t_prev >= 0 else float(sched.final_alpha_cumprod)
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    eta = 0.7
    sigma = eta * np.sqrt(var)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    outs = np.stack([np.asarray(sched.step(eps, t, x, n_steps, eta=eta, noise_key=k))
                     for k in keys])
    std = outs.std(axis=0).mean()
    assert abs(std - sigma) / sigma < 0.15, (std, sigma)

    # the mean drifts from the eta=0 output only via the shrunk direction coeff
    expected_dir = np.sqrt(max(1 - a_prev - sigma**2, 0.0))
    manual_mean = (np.sqrt(a_prev) * np.asarray((x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t))
                   + expected_dir * np.asarray(eps))
    # mean of 256 draws fluctuates with std sigma/16; allow 5 of those
    np.testing.assert_allclose(outs.mean(axis=0), manual_mean, atol=5 * sigma / 16)

    # eta requires a key
    import pytest
    with pytest.raises(ValueError):
        sched.step(eps, t, x, n_steps, eta=eta)
    assert np.isfinite(np.asarray(det)).all()
