"""THE composition parity test (VERDICT r4 "What's missing" #1): the
reference's WHOLE inference path — `VExpressPipeline.mean_overlap` loaded
VERBATIM from /root/reference/pipelines/v_express_pipeline.py (:409-589,
conditioning :343-407, CFG bank zero-prepend via mutual_self_attention.py:
357-363) over the VERBATIM reference modules (unet_2d_condition.py, unet_3d.py,
unet_3d_blocks.py, motion_module.py, attention.py, ...) with the pure-torch
diffusers stub — against our `VExpressPipeline.__call__` with SHARED random
weights (imported through the production `io/torch_import.py` mapping) and the
SAME initial noise draw.

Module-level parity (UNets, blocks, guider, audio projection, wav2vec2,
context scheduler, kps) was proven in rounds 1-4; the blended-window step was
proven equivalent to the sequential loop; this closes the last gap: the
COMPOSITION (conditioning -> reference-net write -> CFG bank update ->
windowed blended denoise -> DDIM v-pred/zero-SNR -> frame decode) matches the
reference end to end, in streamed AND piecewise modes, with and without CFG.

Everything fp32, tiny shapes (64x64 frames, 8x8 latents, 12 frames, 2 DDIM
steps), channels >= 32 because the reference motion module hardcodes
GroupNorm(32) (motion_module.py:119)."""

import importlib
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from .oracles.torch_vae import OVAE
from .test_reference_oracle_neural import _ref, _randomize_
from .utils import flax_params_from_torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "pipelines")),
    reason="reference tree not mounted")

# tiny-but-structured geometry (32-divisible channels: the verbatim motion
# module hardcodes GroupNorm(32); cross dim 768 because the reference
# hardcodes the dummy text context torch.zeros((1, 1, 768)) at
# v_express_pipeline.py:501)
CH = (32, 64, 64, 64)
CROSS = 768
HEADS = 2
W2V_HIDDEN = 16
H = W = 64
L, CTX, OVL, STEPS = 12, 8, 4, 2

MOTION_KW = dict(
    num_attention_heads=2,
    num_transformer_block=1,
    attention_block_types=("Temporal_Self", "Temporal_Self"),
    temporal_position_encoding=True,
    temporal_position_encoding_max_len=8,
    temporal_attention_dim_div=1,
)

W2V_KW = dict(
    hidden_size=W2V_HIDDEN,
    num_hidden_layers=1,
    num_attention_heads=2,
    intermediate_size=32,
    conv_dim=(8, 8),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)

APROJ_KW = dict(dim=16, depth=1, dim_head=4, heads=2, num_queries=5,
                embedding_dim=W2V_HIDDEN, output_dim=CROSS, max_seq_len=10)

GUIDER_KW = dict(conditioning_embedding_channels=CH[0],
                 block_out_channels=(4, 4, 8, 8))

VAE_CH = (8, 16, 16, 16)


def _load_ref_pipeline_module():
    """Verbatim-import the reference pipeline package: registers a `modules`
    alias (the pipeline does `from modules import ReferenceAttentionControl`)
    re-exporting the already-verbatim-loaded vx_ref_modules classes, then a
    namespace package over /root/reference/pipelines."""
    if "modules" not in sys.modules:
        alias = types.ModuleType("modules")
        alias.__vx_ref_alias__ = True
        for fname, cname in [
            ("unet_2d_condition", "UNet2DConditionModel"),
            ("unet_3d", "UNet3DConditionModel"),
            ("v_kps_guider", "VKpsGuider"),
            ("audio_projection", "AudioProjection"),
            ("mutual_self_attention", "ReferenceAttentionControl"),
        ]:
            setattr(alias, cname, getattr(_ref(fname), cname))
        sys.modules["modules"] = alias
    if "vx_ref_pipelines" not in sys.modules:
        spec = importlib.machinery.ModuleSpec("vx_ref_pipelines", None,
                                              is_package=True)
        spec.submodule_search_locations = [os.path.join(REF, "pipelines")]
        sys.modules["vx_ref_pipelines"] = importlib.util.module_from_spec(spec)
    return importlib.import_module("vx_ref_pipelines.v_express_pipeline")


class _VaeAdapter(torch.nn.Module):
    """diffusers AutoencoderKL facade over the clean-room OVAE oracle (the
    reference uses stock sd-vae-ft-mse, outside its repo): encode().latent_
    dist.mean / decode().sample / config.block_out_channels / device."""

    def __init__(self, ovae):
        super().__init__()
        self.ovae = ovae
        from .diffusers_stub import FrozenDict
        self.config = FrozenDict(block_out_channels=VAE_CH)

    @property
    def device(self):
        return torch.device("cpu")

    @property
    def dtype(self):
        return torch.float32

    def encode(self, x):
        mean = self.ovae.encode_mean(x)
        return types.SimpleNamespace(
            latent_dist=types.SimpleNamespace(mean=mean))

    def decode(self, z):
        return types.SimpleNamespace(sample=self.ovae.decode(z))


@pytest.fixture(scope="module")
def pipelines():
    """(torch reference pipeline, our pipeline) with shared random weights."""
    ref_pipe_mod = _load_ref_pipeline_module()
    from transformers import (Wav2Vec2Config as HFW2VConfig,
                              Wav2Vec2FeatureExtractor,
                              Wav2Vec2Model as HFW2VModel)

    from .diffusers_stub import DDIMScheduler as TorchDDIM

    u2d_mod = _ref("unet_2d_condition")
    u3d_mod = _ref("unet_3d")

    torch.manual_seed(0)
    u2d = u2d_mod.UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4, block_out_channels=CH,
        layers_per_block=2, attention_head_dim=HEADS,
        cross_attention_dim=CROSS, norm_num_groups=32)
    u3d = u3d_mod.UNet3DConditionModel(
        sample_size=8, in_channels=4, out_channels=4, block_out_channels=CH,
        layers_per_block=2, attention_head_dim=HEADS,
        cross_attention_dim=CROSS, norm_num_groups=32,
        use_inflated_groupnorm=True, unet_use_cross_frame_attention=False,
        unet_use_temporal_attention=False, use_motion_module=True,
        motion_module_resolutions=(1, 2, 4, 8), motion_module_mid_block=True,
        motion_module_decoder_only=False, motion_module_type="Vanilla",
        motion_module_kwargs=MOTION_KW)
    guider = _ref("v_kps_guider").VKpsGuider(**GUIDER_KW)
    aproj = _ref("audio_projection").AudioProjection(**APROJ_KW)
    w2v = HFW2VModel(HFW2VConfig(
        do_stable_layer_norm=False, feat_extract_norm="group",
        feat_extract_activation="gelu", hidden_act="gelu", hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0, **W2V_KW))
    ovae = OVAE(chs=VAE_CH, layers=2, groups=4, latent=4)

    # randomize everything (incl. the reference's zero-initialized outputs:
    # a zero guider/attn2/motion proj_out would silently hide those paths)
    for i, m in enumerate((u2d, u3d, guider, aproj, w2v, ovae)):
        _randomize_(m, seed=100 + i)
        m.eval()

    scheduler = TorchDDIM(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", clip_sample=False, steps_offset=1,
        prediction_type="v_prediction", rescale_betas_zero_snr=True,
        timestep_spacing="trailing")
    processor = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)

    torch_pipe = ref_pipe_mod.VExpressPipeline(
        vae=_VaeAdapter(ovae), reference_net=u2d, denoising_unet=u3d,
        v_kps_guider=guider, audio_processor=processor, audio_encoder=w2v,
        audio_projection=aproj, scheduler=scheduler)

    # --- ours, weights imported through the production torch-key mapping
    from vexpress_tpu.models.unet_3d import UNetConfig
    from vexpress_tpu.models.vae import VAEConfig
    from vexpress_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                              convert_wav2vec2_state_dict)
    from vexpress_tpu.pipelines.pipeline import PipelineModels, VExpressPipeline

    models = PipelineModels(
        unet_config=UNetConfig(
            block_out_channels=CH, attention_head_dim=HEADS,
            cross_attention_dim=CROSS, norm_num_groups=32,
            motion_num_attention_heads=2, motion_max_len=8),
        vae_config=VAEConfig(block_out_channels=VAE_CH, layers_per_block=2,
                             norm_num_groups=4),
        wav2vec2_config=Wav2Vec2Config(do_normalize=True, **W2V_KW),
        audio_projection_kwargs=APROJ_KW,
        guider_kwargs=GUIDER_KW,
    )
    # V-Express nulls the reference net's final norm (unet_2d_condition.py:650
    # `self.conv_norm_out = None`) — its conv output is never consumed (only
    # the attention banks are), so the verbatim state_dict lacks those two
    # tensors; give our module identity values.
    ref_params = flax_params_from_torch(u2d)
    ref_params["params"]["conv_norm_out"] = {
        "scale": np.ones((CH[0],), np.float32),
        "bias": np.zeros((CH[0],), np.float32),
    }
    params = {
        "vae": flax_params_from_torch(ovae),
        "reference_net": ref_params,
        "denoising_unet": flax_params_from_torch(u3d),
        "v_kps_guider": flax_params_from_torch(guider),
        "wav2vec2": {"params": convert_wav2vec2_state_dict(w2v.state_dict())},
        "audio_projection": flax_params_from_torch(aproj),
    }
    ours = VExpressPipeline(models, params)
    return torch_pipe, ours


def _inputs(seed=3):
    rng = np.random.default_rng(seed)
    ref_img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    kps = rng.uniform(size=(L, H, W, 3)).astype(np.float32)
    wave = (0.1 * rng.standard_normal(L * 16000 // 30 + 40)).astype(np.float32)
    return ref_img, kps, wave


def _run_torch(torch_pipe, guidance_scale, seed=7):
    ref_img, kps, wave = _inputs()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        vid = torch_pipe(
            reference_image=ref_img, kps_images=[kps[i] for i in range(L)],
            audio_waveform=wave, width=W, height=H, video_length=L,
            num_inference_steps=STEPS, guidance_scale=guidance_scale,
            context_frames=CTX, context_overlap=OVL,
            reference_attention_weight=0.95, audio_attention_weight=3.0,
            generator=g)
    # (1, 3, L, H, W) [0,1] -> (L, H, W, 3)
    return vid[0].permute(1, 2, 3, 0).numpy()


def _shared_noise(seed=7):
    """Replicate the reference's only generator draw (prepare_latents)."""
    noise = torch.randn((1, 4, L, H // 8, W // 8),
                        generator=torch.Generator().manual_seed(seed))
    return noise[0].permute(1, 2, 3, 0).numpy()  # (L, h, w, 4)


def _run_ours(ours, guidance_scale, **kw):
    ref_img, kps, wave = _inputs()
    return np.asarray(ours(
        reference_image=ref_img, kps_images=kps, audio_waveform=wave,
        width=W, height=H, video_length=L, num_inference_steps=STEPS,
        guidance_scale=guidance_scale, context_frames=CTX,
        context_overlap=OVL, reference_attention_weight=0.95,
        audio_attention_weight=3.0, latents=_shared_noise(), **kw))


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def torch_video_cfg(pipelines):
    return _run_torch(pipelines[0], guidance_scale=2.0)


def test_full_pipeline_matches_reference_streamed(pipelines, torch_video_cfg):
    """conditioning -> CFG -> blended windows -> DDIM -> decode, streamed."""
    video = _run_ours(pipelines[1], guidance_scale=2.0, mode="streamed")
    assert video.shape == torch_video_cfg.shape == (L, H, W, 3)
    psnr = _psnr(video, torch_video_cfg)
    assert psnr > 45.0, f"streamed vs reference loop: PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(video, torch_video_cfg, atol=7e-3, rtol=0)


def test_full_pipeline_matches_reference_piecewise(pipelines, torch_video_cfg):
    """Same, through the per-block piecewise UNet execution path (the
    production TPU mode)."""
    video = _run_ours(pipelines[1], guidance_scale=2.0, mode="streamed",
                      piecewise=True)
    psnr = _psnr(video, torch_video_cfg)
    assert psnr > 45.0, f"piecewise vs reference loop: PSNR {psnr:.1f} dB"


def test_full_pipeline_matches_reference_no_cfg(pipelines):
    """guidance_scale <= 1: the reference skips CFG entirely (no uncond
    half, no bank zero-prepend); our fast path must match it too."""
    ref_video = _run_torch(pipelines[0], guidance_scale=1.0)
    video = _run_ours(pipelines[1], guidance_scale=1.0, mode="streamed")
    psnr = _psnr(video, ref_video)
    assert psnr > 45.0, f"no-CFG vs reference loop: PSNR {psnr:.1f} dB"
