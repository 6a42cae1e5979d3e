"""Full-model numerical parity: tiny-config reference 2D UNet, 3D denoising
UNet, VKpsGuider, and AudioProjection vs clean-room torch oracles — including
the torch-checkpoint key mapping."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vexpress_tpu.models.unet_2d import ReferenceUNet2D
from vexpress_tpu.models.unet_3d import DenoisingUNet3D, UNetConfig
from vexpress_tpu.models.vkps_guider import VKpsGuider
from vexpress_tpu.models.audio_projection import AudioProjection

from .oracles.torch_unet import OUNet
from .oracles.torch_conditioning import OAudioProjection, OVKpsGuider
from .utils import assert_close, flax_params_from_torch, t2j

torch.manual_seed(0)

TINY = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=2,
    attention_head_dim=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    norm_eps=1e-5,
    use_motion_module=True,
    motion_module_mid_block=True,
    motion_heads=2,
    motion_blocks=1,
    motion_max_len=8,
)

TINY_CFG = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=2,
    attention_head_dim=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    norm_eps=1e-5,
    use_motion_module=True,
    motion_module_mid_block=True,
    motion_num_attention_heads=2,
    motion_num_transformer_block=1,
    motion_max_len=8,
)


def test_reference_unet_2d_parity():
    o = OUNet(TINY, temporal=False).eval()
    B, H, W = 2, 16, 16
    x = torch.randn(B, 4, H, W)
    t = torch.zeros(B, dtype=torch.long)
    ctx = torch.zeros(B, 1, 12)
    with torch.no_grad():
        ref_out, ref_banks = o(x, t, ctx)

    m = ReferenceUNet2D(TINY_CFG)
    params = flax_params_from_torch(o)
    out, banks = m.apply(params, jnp.asarray(t2j(x)), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))

    assert len(banks) == len(ref_banks) == TINY_CFG.num_ref_features
    for i, (bj, bt) in enumerate(zip(banks, ref_banks)):
        assert_close(bj, bt.numpy(), atol=1e-4, rtol=1e-4, msg=f"bank {i}")
    assert_close(out, t2j(ref_out), atol=1e-4, rtol=1e-4)


def test_denoising_unet_3d_parity():
    o = OUNet(TINY, temporal=True).eval()
    B, F, H, W = 2, 3, 16, 16
    x = torch.randn(B * F, 4, H, W)
    t = torch.randint(0, 1000, (B,))
    audio = torch.randn(B * F, 5, 12)
    kps = torch.randn(B * F, 8, H, W)

    # reference features, one per cross-attn block, shaped per block resolution
    shapes = TINY_CFG.ref_feature_shapes(H, W)
    ref_feats = [torch.randn(B, l, c) for (l, c) in shapes]
    ref_feats_rep = [r.repeat_interleave(F, dim=0) for r in ref_feats]

    with torch.no_grad():
        ref_out = o(x, t, audio, ref_feats_rep, kps_features=kps,
                    ref_scale=0.9, audio_scale=2.0, frames=F)

    m = DenoisingUNet3D(TINY_CFG)
    params = flax_params_from_torch(o)
    out = m.apply(
        params,
        jnp.asarray(t2j(x)).reshape(B, F, H, W, 4),
        jnp.asarray(t.numpy()),
        jnp.asarray(audio.numpy()).reshape(B, F, 5, 12),
        tuple(jnp.asarray(r.numpy()) for r in ref_feats),
        jnp.asarray(t2j(kps)).reshape(B, F, H, W, 8),
        0.9,
        2.0,
    )
    ref_np = t2j(ref_out).reshape(B, F, H, W, 4)
    assert_close(out, ref_np, atol=2e-4, rtol=2e-4)


def test_zero_uncond_kv_shortcut_exact():
    """The CFG fast path (skip the uncond half of attn1_5/attn2, whose KV are
    all-zero) must match the full computation exactly: zero KV means uniform
    softmax times zero values, so the attention output is to_out's bias."""
    B, F, H, W = 2, 3, 16, 16  # B = CFG pair [uncond; cond]
    m = DenoisingUNet3D(TINY_CFG)
    key = jax.random.PRNGKey(7)
    shapes = TINY_CFG.ref_feature_shapes(H, W)

    lat = jax.random.normal(key, (1, F, H, W, 4))
    lat = jnp.concatenate([lat, lat], axis=0)
    aud = jax.random.normal(jax.random.PRNGKey(1), (1, F, 5, 12))
    aud = jnp.concatenate([jnp.zeros_like(aud), aud], axis=0)
    kps = jax.random.normal(jax.random.PRNGKey(2), (1, F, H, W, 8))
    kps = jnp.concatenate([jnp.zeros_like(kps), kps], axis=0)
    refs = tuple(
        jnp.concatenate([jnp.zeros((1, l, c)), jax.random.normal(jax.random.PRNGKey(3 + i), (1, l, c))])
        for i, (l, c) in enumerate(shapes)
    )
    t = jnp.asarray([17, 17])

    params = m.init(jax.random.PRNGKey(0), lat, t, aud, refs, kps, 0.9, 2.0)
    full = m.apply(params, lat, t, aud, refs, kps, 0.9, 2.0, zero_uncond_kv=False)
    fast = m.apply(params, lat, t, aud, refs, kps, 0.9, 2.0, zero_uncond_kv=True)
    # same math; tolerance covers XLA fusion/reassociation noise between the
    # two traces (observed max ~2e-6 in fp32)
    assert_close(fast, full, atol=1e-5, rtol=1e-5)


def test_ref_feature_shapes_match_reference_net_banks():
    o = OUNet(TINY, temporal=False).eval()
    B, H, W = 1, 16, 16
    with torch.no_grad():
        _, banks = o(torch.randn(B, 4, H, W), torch.zeros(B, dtype=torch.long), torch.zeros(B, 1, 12))
    shapes = TINY_CFG.ref_feature_shapes(H, W)
    assert len(banks) == len(shapes)
    for bank, (l, c) in zip(banks, shapes):
        assert tuple(bank.shape) == (B, l, c)


def test_vkps_guider_parity():
    o = OVKpsGuider(embed_channels=8, block_out_channels=(4, 4, 8, 8)).eval()
    B, F, H, W = 1, 2, 16, 16
    x = torch.rand(B * F, 3, H, W)
    with torch.no_grad():
        ref = o(x)
    m = VKpsGuider(conditioning_embedding_channels=8, block_out_channels=(4, 4, 8, 8))
    out = m.apply(flax_params_from_torch(o), jnp.asarray(t2j(x)).reshape(B, F, H, W, 3))
    assert_close(out.reshape(B * F, H // 8, W // 8, 8), t2j(ref), atol=1e-5, rtol=1e-5)


def test_vkps_guider_zero_init_output():
    m = VKpsGuider(conditioning_embedding_channels=8, block_out_channels=(4, 4, 8, 8))
    x = jnp.ones((1, 2, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert np.abs(np.asarray(out)).max() == 0.0


def test_audio_projection_parity():
    o = OAudioProjection(dim=16, depth=2, dim_head=4, heads=2, num_queries=5,
                         embedding_dim=12, output_dim=12, ff_mult=2, max_seq_len=10).eval()
    x = torch.randn(6, 10, 12)
    with torch.no_grad():
        ref = o(x)
    m = AudioProjection(dim=16, depth=2, dim_head=4, heads=2, num_queries=5,
                        embedding_dim=12, output_dim=12, ff_mult=2, max_seq_len=10)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy(), atol=1e-5, rtol=1e-5)


def test_unet_config_from_diffusers_json(tmp_path):
    # a real SD1.5 UNet config.json shape (reference inference.py:30,77-90)
    cfg = {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280, 1280],
        "layers_per_block": 2, "attention_head_dim": 8,
        "cross_attention_dim": 768, "norm_num_groups": 32, "norm_eps": 1e-5,
        "flip_sin_to_cos": True, "freq_shift": 0,
        "sample_size": 64, "act_fn": "silu",  # extra keys must be ignored
    }
    p = tmp_path / "config.json"
    p.write_text(__import__("json").dumps(cfg))
    c = UNetConfig.from_diffusers_json(str(p))
    assert c.block_out_channels == (320, 640, 1280, 1280)
    assert c.cross_attention_dim == 768 and c.attention_head_dim == 8
    assert c == UNetConfig.from_diffusers_json(str(p))  # deterministic
    # overrides win over file values
    assert UNetConfig.from_diffusers_json(str(p), cross_attention_dim=32).cross_attention_dim == 32


def test_fusion_blocks_midup_bank_accounting():
    """fusion_blocks="midup" (mutual_self_attention.py:286-305): the reference
    net captures — and the denoising net consumes — exactly
    1 + 3*(layers_per_block+1) banks: the mid+up slice of the full ordering.
    The 2D sample output is unchanged (capture is observation-only)."""
    import dataclasses

    cfg = dataclasses.replace(TINY_CFG, fusion_blocks="midup")
    lp = cfg.layers_per_block
    assert cfg.num_ref_features == 1 + 3 * (lp + 1)
    n_down = 3 * lp
    assert TINY_CFG.num_ref_features == n_down + cfg.num_ref_features
    assert cfg.ref_feature_shapes(16, 16) == TINY_CFG.ref_feature_shapes(16, 16)[n_down:]

    o = OUNet(TINY, temporal=False).eval()
    params = flax_params_from_torch(o)
    x = jnp.asarray(t2j(torch.randn(1, 4, 16, 16, generator=torch.Generator().manual_seed(5))))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 12))

    out_f, banks_f = ReferenceUNet2D(TINY_CFG).apply(params, x, t, ctx)
    out_m, banks_m = ReferenceUNet2D(cfg).apply(params, x, t, ctx)
    assert len(banks_m) == cfg.num_ref_features
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_f), atol=1e-6, rtol=1e-6)
    for i, (bm, bf) in enumerate(zip(banks_m, banks_f[n_down:])):
        np.testing.assert_array_equal(np.asarray(bm), np.asarray(bf), err_msg=f"bank {i}")


def test_fusion_blocks_midup_denoiser_and_piecewise():
    """The midup denoising net runs on the midup bank set (monolithic and
    piecewise paths agree); down blocks take the plain unfused forward."""
    import dataclasses

    from vexpress_tpu.models.piecewise import PiecewiseUNetRunner

    cfg = dataclasses.replace(TINY_CFG, fusion_blocks="midup")
    rng = np.random.default_rng(9)
    B, F, h, w = 2, 2, 8, 8
    shapes = cfg.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.asarray(rng.normal(size=(B, l, c)).astype(np.float32)) for l, c in shapes)
    sample = jnp.asarray(rng.normal(size=(B, F, h, w, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    audio = jnp.asarray(rng.normal(size=(B, F, 5, 12)).astype(np.float32))
    kps = jnp.asarray(rng.normal(size=(B, F, h, w, 8)).astype(np.float32))

    net = DenoisingUNet3D(cfg)
    key = jax.random.PRNGKey(0)
    params = net.init(key, sample, t, audio, ref_feats, kps)
    mono = net.apply(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    assert np.isfinite(np.asarray(mono)).all()

    piece = PiecewiseUNetRunner(cfg).unet3d(params, sample, t, audio, ref_feats, kps, 0.9, 2.0)
    np.testing.assert_allclose(np.asarray(piece), np.asarray(mono), atol=2e-5, rtol=2e-5)

    # wrong bank count (the full set) must fail loudly
    full_shapes = TINY_CFG.ref_feature_shapes(h, w)
    full_feats = tuple(jnp.zeros((B, l, c)) for l, c in full_shapes)
    try:
        net.apply(params, sample, t, audio, full_feats, kps)
        raise AssertionError("expected ValueError for full bank set on midup net")
    except ValueError as e:
        assert "num_ref_features" in str(e)


def test_fusion_blocks_validation():
    import dataclasses

    import pytest

    with pytest.raises(ValueError, match="fusion_blocks"):
        dataclasses.replace(TINY_CFG, fusion_blocks="bogus")
