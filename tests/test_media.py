"""Device-side media post-processing (pipelines/media.py): the 3x3x3 median
flicker filter (reference pipelines/utils.py:46-61) and its chunked-static
variant."""

import numpy as np
import jax.numpy as jnp

from vexpress_tpu.pipelines.media import median_filter_3d, median_filter_3d_chunked


def _median_ref(video: np.ndarray) -> np.ndarray:
    """Clean-room numpy reference: per-channel 3x3x3 median, reflect pad."""
    f, h, w, c = video.shape
    v = video.transpose(0, 3, 1, 2)  # (F, C, H, W)
    v = np.pad(v, ((1, 1), (0, 0), (1, 1), (1, 1)), mode="reflect")
    out = np.empty((f, c, h, w), video.dtype)
    for i in range(f):
        block = v[i : i + 3]  # (3, C, H+2, W+2)
        patches = [
            block[:, :, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
        ]
        out[i] = np.median(np.stack(patches).reshape(27, c, h, w), axis=0)
    return out.transpose(0, 2, 3, 1)


def test_median_filter_matches_numpy_reference():
    rng = np.random.default_rng(0)
    video = rng.uniform(0, 1, (5, 8, 6, 3)).astype(np.float32)
    out = np.asarray(median_filter_3d(jnp.asarray(video)))
    np.testing.assert_allclose(out, _median_ref(video), atol=1e-6)


def test_median_filter_chunked_matches_full():
    rng = np.random.default_rng(1)
    for f in (7, 8, 9, 16):
        video = rng.uniform(0, 1, (f, 8, 6, 3)).astype(np.float32)
        full = np.asarray(median_filter_3d(jnp.asarray(video)))
        chunked = np.asarray(median_filter_3d_chunked(jnp.asarray(video), chunk=4))
        np.testing.assert_allclose(chunked, full, atol=1e-6, err_msg=f"f={f}")


def test_decode_latents_pipelined_filter_every_tail_length():
    """The pipelined decode->filter->uint8 path must be bit-exact vs. the
    whole-video filter for EVERY video_length % chunk, including the core==1
    tail (regression: a positional right-halo slice p[core-2:core-1] is empty
    when the last chunk holds a single frame, silently dropping it) and
    core==chunk. Identity 'decode' isolates the halo/indexing logic."""
    import types

    import jax

    from vexpress_tpu.pipelines.pipeline import VExpressPipeline

    obj = types.SimpleNamespace(
        params={"vae": None},
        _decode_chunk=lambda p_vae, sl: sl,
        _to_uint8=jax.jit(
            lambda v: (jnp.clip(v.astype(jnp.float32), 0, 1) * 255).astype(jnp.uint8)
        ),
    )
    rng = np.random.default_rng(0)
    for f in (2, 3, 4, 5, 8, 9, 12, 13):  # cores 1..chunk, single/multi chunk
        video = jnp.asarray(rng.uniform(0, 1, (f, 16, 24, 3)).astype(np.float32))
        ref = np.asarray(
            (jnp.clip(median_filter_3d(video), 0, 1) * 255).astype(np.uint8)
        )
        got = VExpressPipeline.decode_latents(
            obj, video, chunk=4, median_filter=True, as_uint8=True
        )
        assert got.shape == ref.shape, (f, got.shape, ref.shape)
        assert (got == ref).all(), f
        raw = np.asarray((jnp.clip(video, 0, 1) * 255).astype(np.uint8))
        got_raw = VExpressPipeline.decode_latents(
            obj, video, chunk=4, median_filter=False, as_uint8=True
        )
        assert (got_raw == raw).all(), f
