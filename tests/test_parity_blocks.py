"""Numerical parity of core blocks vs clean-room torch oracles (fp32 CPU)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vexpress_tpu.ops.attention import Attention
from vexpress_tpu.ops.layers import FeedForward, get_timestep_embedding
from vexpress_tpu.models.blocks import ResnetBlock, SpatialTransformer
from vexpress_tpu.models.motion_module import TemporalMotionModule

from .oracles.torch_modules import (
    OAttention,
    OFeedForward,
    OMotionModule,
    OResnetBlock,
    OSpatialTransformer,
)
from .oracles.torch_unet import timestep_embedding
from .utils import assert_close, flax_params_from_torch, t2j

torch.manual_seed(0)


def test_attention_self():
    o = OAttention(query_dim=32, heads=4, dim_head=8).eval()
    x = torch.randn(2, 10, 32)
    with torch.no_grad():
        ref = o(x)
    m = Attention(query_dim=32, heads=4, dim_head=8)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy())


def test_attention_cross_and_kv_broadcast():
    o = OAttention(query_dim=32, heads=4, dim_head=8, cross_dim=12).eval()
    kv = torch.randn(2, 7, 12)
    x = torch.randn(6, 10, 32)  # 2 videos x 3 frames folded
    kv_rep = kv.repeat_interleave(3, dim=0)
    with torch.no_grad():
        ref = o(x, kv_rep)
    m = Attention(query_dim=32, heads=4, dim_head=8)
    params = flax_params_from_torch(o)
    # explicit per-frame kv
    out = m.apply(params, jnp.asarray(x.numpy()), jnp.asarray(kv_rep.numpy()))
    assert_close(out, ref.numpy())
    # shared kv with implicit query grouping (no KV materialization)
    out2 = m.apply(params, jnp.asarray(x.numpy()), jnp.asarray(kv.numpy()))
    assert_close(out2, ref.numpy())


def test_feedforward_geglu():
    o = OFeedForward(24).eval()
    x = torch.randn(3, 5, 24)
    with torch.no_grad():
        ref = o(x)
    out = FeedForward(24).apply(flax_params_from_torch(o), jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy())


def test_timestep_embedding():
    t = torch.tensor([0, 1, 10, 999])
    ref = timestep_embedding(t, 32)
    out = get_timestep_embedding(jnp.asarray(t.numpy()), 32)
    assert_close(out, ref.numpy())


@pytest.mark.parametrize("in_ch,out_ch", [(16, 16), (16, 32)])
def test_resnet_block(in_ch, out_ch):
    o = OResnetBlock(in_ch, out_ch, temb_ch=8, groups=4, eps=1e-5).eval()
    x = torch.randn(2, in_ch, 6, 6)
    temb = torch.randn(2, 8)
    with torch.no_grad():
        ref = o(x, temb)
    m = ResnetBlock(out_ch, eps=1e-5, groups=4)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(t2j(x)), jnp.asarray(temb.numpy()))
    assert_close(out, t2j(ref))


def test_spatial_transformer_reference_mode():
    o = OSpatialTransformer(16, heads=2, cross_dim=12, groups=4, temporal=False).eval()
    x = torch.randn(2, 16, 4, 4)
    ctx = torch.randn(2, 1, 12)
    with torch.no_grad():
        ref, banks_ref = o(x, ctx)
    m = SpatialTransformer(16, heads=2, temporal=False, groups=4)
    out, banks = m.apply(flax_params_from_torch(o), jnp.asarray(t2j(x)), jnp.asarray(ctx.numpy()))
    assert_close(out, t2j(ref))
    assert len(banks) == len(banks_ref) == 1
    assert_close(banks[0], banks_ref[0].numpy())


def test_spatial_transformer_temporal_mode():
    B, F = 2, 3
    o = OSpatialTransformer(16, heads=2, cross_dim=12, groups=4, temporal=True).eval()
    x = torch.randn(B * F, 16, 4, 4)
    audio = torch.randn(B * F, 5, 12)
    ref_kv = torch.randn(B, 9, 16)
    with torch.no_grad():
        ref = o(x, audio, ref_kv.repeat_interleave(F, dim=0), 0.9, 2.0)
    m = SpatialTransformer(16, heads=2, temporal=True, groups=4)
    out = m.apply(
        flax_params_from_torch(o),
        jnp.asarray(t2j(x)),
        jnp.asarray(audio.numpy()),
        (jnp.asarray(ref_kv.numpy()),),
        jnp.float32(0.9),
        jnp.float32(2.0),
    )
    assert_close(out, t2j(ref))


def test_spatial_transformer_attn_temp_parity():
    """Optional attn_temp branch (attention.py:380-395): post-FF per-pixel
    temporal self-attention. Output projection randomized so the branch is
    non-trivial."""
    B, F = 2, 3
    o = OSpatialTransformer(16, heads=2, cross_dim=12, groups=4, temporal=True,
                            use_temporal_attention=True).eval()
    with torch.no_grad():
        o.transformer_blocks[0].attn_temp.to_out[0].weight.normal_(0, 0.1)
    x = torch.randn(B * F, 16, 4, 4)
    audio = torch.randn(B * F, 5, 12)
    ref_kv = torch.randn(B, 9, 16)
    with torch.no_grad():
        ref = o(x, audio, ref_kv.repeat_interleave(F, dim=0), 0.9, 2.0, F)
    m = SpatialTransformer(16, heads=2, temporal=True, use_temporal_attention=True, groups=4)
    out = m.apply(
        flax_params_from_torch(o),
        jnp.asarray(t2j(x)),
        jnp.asarray(audio.numpy()),
        (jnp.asarray(ref_kv.numpy()),),
        jnp.float32(0.9),
        jnp.float32(2.0),
        False,
        F,
    )
    assert_close(out, t2j(ref))


def test_attn_temp_zero_init_is_identity():
    """A freshly initialized attn_temp branch (zero to_out kernel) must not
    change the block output vs the branch-off configuration."""
    import jax

    x = jnp.asarray(np.random.default_rng(3).normal(size=(6, 16, 4, 4)).astype(np.float32))
    audio = jnp.asarray(np.random.default_rng(4).normal(size=(6, 5, 12)).astype(np.float32))
    ref_kv = (jnp.asarray(np.random.default_rng(5).normal(size=(2, 9, 16)).astype(np.float32)),)
    x_j = jnp.transpose(x, (0, 2, 3, 1))

    m_off = SpatialTransformer(16, heads=2, temporal=True, groups=4)
    m_on = SpatialTransformer(16, heads=2, temporal=True, use_temporal_attention=True, groups=4)
    p_on = m_on.init(jax.random.PRNGKey(0), x_j, audio, ref_kv, 0.9, 2.0, False, 3)
    # strip the attn_temp/norm_temp params to init the branch-off module
    p_off = jax.tree_util.tree_map(lambda x: x, p_on)
    blk = p_off["params"]["transformer_blocks_0"]
    p_off = {"params": {**p_on["params"],
                        "transformer_blocks_0": {k: v for k, v in blk.items()
                                                 if k not in ("attn_temp", "norm_temp")}}}
    out_on = m_on.apply(p_on, x_j, audio, ref_kv, 0.9, 2.0, False, 3)
    out_off = m_off.apply(p_off, x_j, audio, ref_kv, 0.9, 2.0, False, 3)
    assert_close(out_on, out_off, atol=1e-6, rtol=1e-6)


def test_motion_module():
    B, F = 2, 4
    o = OMotionModule(16, heads=2, num_blocks=1, max_len=8, groups=4).eval()
    x = torch.randn(B * F, 16, 4, 4)
    with torch.no_grad():
        ref = o(x, F)
    m = TemporalMotionModule(16, heads=2, num_transformer_block=1, max_len=8, groups=4)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(t2j(x)), F)
    assert_close(out, t2j(ref))


def test_motion_module_zero_init_is_identity():
    import jax

    m = TemporalMotionModule(16, heads=2, num_transformer_block=1, max_len=8, groups=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4, 4, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, 2)
    out = m.apply(params, x, 2)
    assert_close(out, x)


def test_sdpa_chunked_matches_full():
    from vexpress_tpu.ops.attention import sdpa
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 100, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 37, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 37, 32)).astype(np.float32))
    full = sdpa(q, k, v, heads=4, q_chunk=100)
    chunked = sdpa(q, k, v, heads=4, q_chunk=16)  # pad path: 100 = 6*16 + 4
    assert_close(chunked, full, atol=1e-6, rtol=1e-6)


def test_sdpa_fast_layouts_match_reference():
    """The tiny-KV (audio attn2) and short-sequence (temporal motion) layout
    specializations are exact rewrites of the einsum reference path."""
    from vexpress_tpu.ops.attention import _attend, _attend_short, _attend_tiny_kv

    rng = np.random.default_rng(1)
    H, D = 4, 8

    # tiny KV: lq large, lk = 5 (audio tokens)
    q = jnp.asarray(rng.normal(size=(2, 100, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 5, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 5, H, D)).astype(np.float32))
    assert_close(_attend_tiny_kv(q, k, v, 0.3), _attend(q, k, v, 0.3),
                 atol=1e-6, rtol=1e-6)

    # short sequence: lq = lk = 24 (motion module frames)
    q = jnp.asarray(rng.normal(size=(6, 24, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(6, 24, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(6, 24, H, D)).astype(np.float32))
    assert_close(_attend_short(q, k, v, 0.3), _attend(q, k, v, 0.3),
                 atol=1e-6, rtol=1e-6)


def test_gelu_dtype_aware():
    """gelu() is bit-exact erf-GELU in fp32 (torch parity) and within ~1 ulp
    of erf-GELU in bf16, where the tanh approximation is used for speed
    (3.1 ms -> 0.6 ms per SD FeedForward on v5e)."""
    import jax
    from vexpress_tpu.ops.layers import gelu

    x = jnp.asarray(np.linspace(-6, 6, 193), jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    assert bool((gelu(x) == exact).all())

    xb = x.astype(jnp.bfloat16)
    got = np.asarray(gelu(xb), np.float32)
    ref = np.asarray(exact, np.float32)
    # one bf16 ulp at |y| <= 6 is 0.03125; tanh-approx error stays below it
    assert np.abs(got - ref).max() <= 0.032, np.abs(got - ref).max()
