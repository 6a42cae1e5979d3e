"""End-to-end pipeline smoke test with tiny random-init models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vexpress_tpu.models.unet_3d import UNetConfig
from vexpress_tpu.models.vae import VAEConfig
from vexpress_tpu.models.wav2vec2 import Wav2Vec2Config
from vexpress_tpu.pipelines.pipeline import PipelineModels, VExpressPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    models = PipelineModels(
        unet_config=UNetConfig(
            block_out_channels=(8, 16, 16, 16),
            attention_head_dim=2,
            cross_attention_dim=12,
            norm_num_groups=4,
            motion_num_attention_heads=2,
            motion_max_len=8,
        ),
        vae_config=VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1, norm_num_groups=4),
        wav2vec2_config=Wav2Vec2Config(
            hidden_size=16,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=32,
            conv_dim=(8, 8),
            conv_kernel=(10, 3),
            conv_stride=(5, 2),
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        ),
        audio_projection_kwargs=dict(
            dim=16, depth=1, dim_head=4, heads=2, num_queries=5,
            embedding_dim=16, output_dim=12, max_seq_len=10,
        ),
        guider_kwargs=dict(conditioning_embedding_channels=8, block_out_channels=(4, 4, 8, 8)),
    )

    key = jax.random.PRNGKey(0)
    H = W = 64
    h = w = H // 8
    pipe_shell = VExpressPipeline(models, params={})
    params = {}
    params["vae"] = pipe_shell.vae.init(key, jnp.zeros((1, H, W, 3)))
    params["reference_net"] = pipe_shell.reference_net.init(
        key, jnp.zeros((1, h, w, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 12))
    )
    shapes = models.unet_config.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.zeros((1, l, c)) for l, c in shapes)
    params["denoising_unet"] = pipe_shell.denoising_unet.init(
        key, jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 5, 12)), ref_feats, jnp.zeros((1, 2, h, w, 8)),
    )
    params["v_kps_guider"] = pipe_shell.v_kps_guider.init(key, jnp.zeros((1, 1, H, W, 3)))
    params["wav2vec2"] = pipe_shell.audio_encoder.init(key, jnp.zeros((1, 1600)))
    params["audio_projection"] = pipe_shell.audio_projection.init(key, jnp.zeros((1, 10, 16)))
    return VExpressPipeline(models, params)


def test_pipeline_generates_video(tiny_pipeline):
    rng = np.random.default_rng(0)
    H = W = 64
    L = 12  # 2 windows of 8 with overlap 4
    video = tiny_pipeline(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(6400,)).astype(np.float32),
        width=W,
        height=H,
        video_length=L,
        num_inference_steps=2,
        guidance_scale=2.0,
        context_frames=8,
        context_overlap=4,
        window_group=2,
    )
    assert video.shape == (L, H, W, 3)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_pipeline_no_cfg_path(tiny_pipeline):
    rng = np.random.default_rng(1)
    H = W = 64
    L = 8
    video = tiny_pipeline(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(4000,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=1.0,  # no CFG
        context_frames=8, context_overlap=4,
    )
    assert video.shape == (L, H, W, 3)
    assert np.isfinite(video).all()


def test_streamed_matches_fused(tiny_pipeline):
    rng = np.random.default_rng(2)
    H = W = 64
    L = 12
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(6400,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4, window_group=2,
        return_latents=True,
    )
    lat_streamed = tiny_pipeline(mode="streamed", **kwargs)
    lat_fused = tiny_pipeline(mode="fused", **kwargs)
    np.testing.assert_allclose(lat_streamed, lat_fused, atol=1e-5, rtol=1e-5)


def test_uint8_kps_and_output(tiny_pipeline):
    """uint8 kps input (raw upload, device-side normalize) matches the float
    path; output_uint8 is the quantization of the float output."""
    rng = np.random.default_rng(9)
    H = W = 64
    L = 10
    kps_u8 = rng.integers(0, 256, (L, H, W, 3), dtype=np.uint8)
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(5333,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4,
    )
    lat_u8 = tiny_pipeline(kps_images=kps_u8, return_latents=True, **kwargs)
    lat_f = tiny_pipeline(kps_images=kps_u8.astype(np.float32) / 255.0,
                          return_latents=True, **kwargs)
    np.testing.assert_allclose(lat_u8, lat_f, atol=1e-5, rtol=1e-5)

    vid_f = tiny_pipeline(kps_images=kps_u8, median_filter=True, **kwargs)
    vid_u8 = tiny_pipeline(kps_images=kps_u8, median_filter=True,
                           output_uint8=True, **kwargs)
    assert vid_u8.dtype == np.uint8 and vid_f.dtype == np.float32
    expected = (np.clip(vid_f, 0, 1) * 255).astype(np.uint8)
    # float->uint8 rounding at the exact bin edges may differ by 1
    assert np.abs(vid_u8.astype(np.int16) - expected.astype(np.int16)).max() <= 1


def test_save_memory_matches_streamed(tiny_pipeline):
    """Host-resident kps conditioning (--save_gpu_memory analog) is exact:
    gathering window groups on host then shipping equals device-side gather."""
    rng = np.random.default_rng(7)
    H = W = 64
    L = 12
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(6400,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4, window_group=2,
        return_latents=True,
    )
    lat_normal = tiny_pipeline(mode="streamed", **kwargs)
    lat_host = tiny_pipeline(mode="streamed", save_memory=True, **kwargs)
    np.testing.assert_allclose(lat_host, lat_normal, atol=1e-5, rtol=1e-5)


def test_shape_bucketing_conditioning(tiny_pipeline):
    """Bucketed conditioning (SURVEY §7 static shapes): chunked kps features
    are exact; bucketed audio equals the unbucketed path when the waveform
    already fills a bucket, and stays well-formed when padded."""
    rng = np.random.default_rng(11)
    L, H, W = 12, 64, 64

    kps = jnp.asarray(rng.uniform(size=(L, H, W, 3)).astype(np.float32))
    a = tiny_pipeline._kps_features(kps)
    b = tiny_pipeline._kps_features_chunked(kps, chunk=5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    wf = rng.normal(size=(6400,)).astype(np.float32)
    tok_exact = tiny_pipeline._audio_tokens(jnp.asarray(wf), L, 2)
    tok_nopad = tiny_pipeline._audio_tokens_bucketed(wf, L, 2, bucket_s=6400 / 16000,
                                                     proj_chunk=5)
    np.testing.assert_allclose(np.asarray(tok_nopad), np.asarray(tok_exact),
                               atol=5e-5, rtol=1e-4)

    tok_padded = tiny_pipeline._audio_tokens_bucketed(wf, L, 2, bucket_s=1.0, proj_chunk=5)
    assert tok_padded.shape == tok_exact.shape
    assert np.isfinite(np.asarray(tok_padded)).all()


def test_sharded_matches_streamed(tiny_pipeline):
    """Window-parallel (mesh-sharded) inference with the REAL UNet must match
    the single-device streamed path (VERDICT r1 item 3). Windows are sharded
    over the 8-CPU mesh; weighted noise predictions are psum'd."""
    from vexpress_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(6)
    H = W = 64
    L = 12
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(6400,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4,
        return_latents=True,
    )
    lat_streamed = tiny_pipeline(mode="streamed", **kwargs)
    lat_sharded = tiny_pipeline(mode="sharded", mesh=create_mesh(), **kwargs)
    np.testing.assert_allclose(lat_sharded, lat_streamed, atol=1e-5, rtol=1e-5)


def test_piecewise_matches_monolithic(tiny_pipeline):
    """Per-block UNet execution must equal the monolithic apply exactly."""
    import jax
    from vexpress_tpu.models.piecewise import PiecewiseUNetRunner

    cfg = tiny_pipeline.m.unet_config
    rng = np.random.default_rng(3)
    B, F, h, w = 2, 3, 8, 8
    shapes = cfg.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.asarray(rng.normal(size=(B, l, c)).astype(np.float32)) for l, c in shapes)
    sample = jnp.asarray(rng.normal(size=(B, F, h, w, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    audio = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))
    kps = jnp.asarray(rng.normal(size=(B, F, h, w, 8)).astype(np.float32))
    params = tiny_pipeline.params["denoising_unet"]

    mono = tiny_pipeline.denoising_unet.apply(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    runner = PiecewiseUNetRunner(cfg)
    piece = runner.unet3d(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    np.testing.assert_allclose(np.asarray(piece), np.asarray(mono), atol=2e-5, rtol=2e-5)

    # reference net too
    rparams = tiny_pipeline.params["reference_net"]
    lat = jnp.asarray(rng.normal(size=(1, h, w, 4)).astype(np.float32))
    ctx = jnp.zeros((1, 1, 12))
    out_m, banks_m = tiny_pipeline.reference_net.apply(rparams, lat, jnp.zeros((1,), jnp.int32), ctx)
    out_p, banks_p = runner.reference_net(rparams, lat, jnp.zeros((1,), jnp.int32), ctx)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_m), atol=2e-5, rtol=2e-5)
    assert len(banks_p) == len(banks_m)
    for bp, bm in zip(banks_p, banks_m):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bm), atol=2e-5, rtol=2e-5)


def test_pipeline_piecewise_e2e(tiny_pipeline):
    rng = np.random.default_rng(4)
    H = W = 64
    L = 8
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(4000,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4, return_latents=True,
    )
    lat_piece = tiny_pipeline(piecewise=True, **kwargs)
    lat_mono = tiny_pipeline(piecewise=False, **kwargs)
    # same math, different program boundaries: XLA fusion noise (~4e-5 after
    # two DDIM steps; single-forward parity is tighter, tested above)
    np.testing.assert_allclose(lat_piece, lat_mono, atol=1e-4, rtol=1e-4)


def test_decode_pipelined_uint8_matches_full_filter(tiny_pipeline):
    """The pipelined decode->filter->download path (decode of chunk i+1
    enqueued before chunk i's filter + async download) must reproduce the
    decode-everything-then-filter result exactly."""
    from vexpress_tpu.pipelines.media import median_filter_3d

    pipe = tiny_pipeline
    lat = jax.random.normal(jax.random.PRNGKey(7), (11, 8, 8, 4), jnp.float32)

    # reference: full decode, whole-video filter, uint8
    ref_video = pipe.decode_latents(lat, chunk=4, median_filter=False, as_uint8=False)
    ref = np.asarray(
        (jnp.clip(median_filter_3d(jnp.asarray(ref_video)), 0, 1) * 255).astype(jnp.uint8))

    got = pipe.decode_latents(lat, chunk=4, median_filter=True, as_uint8=True)
    assert got.dtype == np.uint8 and got.shape == ref.shape
    # uint8 rounding at chunk boundaries can differ by 1 lsb at most
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, \
        np.abs(got.astype(int) - ref.astype(int)).max()

    got_raw = pipe.decode_latents(lat, chunk=4, median_filter=False, as_uint8=True)
    ref_raw = np.asarray((jnp.clip(jnp.asarray(ref_video), 0, 1) * 255).astype(jnp.uint8))
    assert np.array_equal(got_raw, ref_raw)


def test_piecewise_fused_tail_matches_unfused(tiny_pipeline, monkeypatch):
    """VEXPRESS_FUSE_TAIL merges down_3+mid+up_0 into one program; outputs
    must match the unfused per-block execution exactly (same params, same
    math, only program boundaries differ)."""
    from vexpress_tpu.models.piecewise import PiecewiseUNetRunner

    cfg = tiny_pipeline.m.unet_config
    rng = np.random.default_rng(9)
    B, F, h, w = 2, 3, 8, 8
    shapes = cfg.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.asarray(rng.normal(size=(B, l, c)).astype(np.float32)) for l, c in shapes)
    sample = jnp.asarray(rng.normal(size=(B, F, h, w, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    audio = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))
    kps = jnp.asarray(rng.normal(size=(B, F, h, w, 8)).astype(np.float32))
    params = tiny_pipeline.params["denoising_unet"]

    monkeypatch.setenv("VEXPRESS_FUSE_TAIL", "1")
    fused = PiecewiseUNetRunner(cfg).unet3d(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    monkeypatch.setenv("VEXPRESS_FUSE_TAIL", "0")
    unfused = PiecewiseUNetRunner(cfg).unet3d(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=1e-6, rtol=1e-6)


def test_length_bucketing_is_exact(tiny_pipeline):
    """shape_bucketing pads the latent/conditioning buffers to a frame bucket
    so the L-shaped glue programs (gather/scatter/DDIM) are reused across clip
    lengths. The window schedule stays on the true length, so the result must
    be identical to the unbucketed run."""
    rng = np.random.default_rng(11)
    H = W = 64
    L = 9  # pads to 32
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(4800,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4, return_latents=True,
        piecewise=False,
    )
    lat_plain = tiny_pipeline(shape_bucketing=False, **kwargs)
    lat_bucketed = tiny_pipeline(shape_bucketing=True, **kwargs)
    assert lat_bucketed.shape[0] == L
    np.testing.assert_allclose(lat_bucketed, lat_plain, atol=1e-5, rtol=1e-5)
