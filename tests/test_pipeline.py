"""Pipeline logic tests: context windows, audio windowing, and equivalence of
the batched blended denoise step with the reference's sequential loop."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from vexpress_tpu.diffusion.ddim import DDIMScheduler
from vexpress_tpu.pipelines.audio import audio_frame_windows, interpolate_linear
from vexpress_tpu.pipelines.context import (
    compute_context_windows,
    compute_num_context,
    compute_video_length,
    uniform_context_windows,
)
from vexpress_tpu.pipelines.pipeline import build_blended_denoise_step


def test_context_windows_static_schedule():
    windows, inv = compute_context_windows(64, 24, 4)
    assert windows.shape == (3, 24)
    np.testing.assert_array_equal(windows[0], np.arange(0, 24))
    np.testing.assert_array_equal(windows[1], np.arange(20, 44))
    np.testing.assert_array_equal(windows[2], np.arange(40, 64))
    # overlap frames are covered twice
    assert inv[20] == 0.5 and inv[0] == 1.0 and inv[43] == 0.5 and inv[63] == 1.0


def test_video_length_trimming():
    # inference.py:255-264 semantics
    for init_len in (64, 70, 83, 930):
        n = compute_num_context(init_len, 24, 4)
        vl = compute_video_length(init_len, 24, 4)
        assert vl <= init_len
        assert vl == (n - 1) * 20 + 24
        windows, _ = compute_context_windows(vl, 24, 4)
        assert windows.shape[0] == n


def test_uniform_jitter_windows_valid():
    for step in range(1, 6):
        for wins in [uniform_context_windows(step, 50, 24, 3, 4, closed_loop=False)]:
            for w in wins:
                assert len(w) == 24
                assert all(0 <= e < 50 for e in w)


def test_interpolate_linear_matches_torch():
    x = np.random.default_rng(0).normal(size=(13, 5)).astype(np.float32)
    for out_len in (7, 26, 40):
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(1, 0)[None], size=out_len, mode="linear"
            )[0]
            .permute(1, 0)
            .numpy()
        )
        out = np.asarray(interpolate_linear(jnp.asarray(x), out_len))
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_audio_frame_windows_matches_reference_math():
    """Mirror of v_express_pipeline.py:374-407 in numpy."""
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(40, 6)).astype(np.float32)
    video_length, num_pad = 16, 2
    out = np.asarray(audio_frame_windows(jnp.asarray(emb), video_length, num_pad))
    assert out.shape == (video_length, 10, 6)

    # reference computation in torch
    t = torch.from_numpy(emb)
    interp = torch.nn.functional.interpolate(
        t.permute(1, 0)[None], size=2 * video_length, mode="linear"
    )[0].permute(1, 0)
    padded = torch.cat(
        [torch.zeros(2 * num_pad, 6), interp, torch.zeros(2 * num_pad, 6)], dim=0
    )
    for i in range(video_length):
        start, end = i, i + 2 * num_pad
        ref_win = padded[2 * start : 2 * (end + 1)]
        np.testing.assert_allclose(out[i], ref_win.numpy(), atol=1e-6)


def test_blended_step_equivalence_with_sequential_reference_loop():
    """The batched scatter-add step must equal the reference's sequential
    per-window loop with per-frame counters and incremental DDIM stepping
    (v_express_pipeline.py:527-577), for an arbitrary deterministic model."""
    L, size, overlap = 44, 8, 2
    windows, inv = compute_context_windows(L, size, overlap)
    n_steps = 5
    sched = DDIMScheduler()
    rng = np.random.default_rng(0)
    h = w = 4
    lat0 = rng.normal(size=(L, h, w, 4)).astype(np.float32)

    # toy "model": depends on window content and t (deterministic, frame-mixed)
    def model_np(win_lat, t):
        mixed = win_lat.mean(axis=0, keepdims=True) + 0.1 * win_lat
        return np.tanh(mixed + 0.001 * float(t))

    def predict(lat, t, w_idx, cond):
        mixed = jnp.mean(lat, axis=1, keepdims=True) + 0.1 * lat
        return jnp.tanh(mixed + 0.001 * t)

    # --- batched implementation under test
    step = build_blended_denoise_step(predict, sched, windows, inv, n_steps, window_group=2)
    lat_batched = jnp.asarray(lat0)
    for t in sched.timesteps(n_steps):
        lat_batched = step(lat_batched, jnp.asarray(int(t), jnp.float32), None)
    lat_batched = np.asarray(lat_batched)

    # --- reference-style sequential loop (numpy, per-frame bookkeeping)
    lat_seq = lat0.copy()
    counts = (1.0 / inv).round().astype(int)
    for t in sched.timesteps(n_steps):
        context_counter = np.zeros(L, dtype=int)
        noise_preds = [None] * L
        for win in windows:
            win_lat = lat_seq[win]
            pred = model_np(win_lat, int(t)) / counts[win][:, None, None, None]
            step_ids, step_preds = [], []
            context_counter[win] += 1
            for j, frame in enumerate(win):
                if noise_preds[frame] is None:
                    noise_preds[frame] = pred[j]
                else:
                    noise_preds[frame] = noise_preds[frame] + pred[j]
                if context_counter[frame] == counts[frame]:
                    step_ids.append(frame)
                    step_preds.append(noise_preds[frame])
                    noise_preds[frame] = None
            if step_ids:
                sp = jnp.asarray(np.stack(step_preds))
                sl = jnp.asarray(lat_seq[step_ids])
                out = sched.step(sp, jnp.asarray(int(t), jnp.float32), sl, n_steps)
                lat_seq[step_ids] = np.asarray(out)

    np.testing.assert_allclose(lat_batched, lat_seq, atol=1e-5, rtol=1e-5)
