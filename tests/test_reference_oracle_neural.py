"""Numerical parity against the reference repo's ACTUAL torch module code.

Most reference neural modules import diffusers (not installed here), so round-1
parity used clean-room oracles — leaving a circularity risk (VERDICT weak #5:
implementation and oracle share an author). Three reference files need no real
diffusers code, though:

  modules/resnet.py            — pure torch + einops
  modules/v_kps_guider.py      — needs only ModelMixin (= nn.Module) + zero_module
  modules/audio_projection.py  — needs only ModelMixin

This file loads those files verbatim from /root/reference with a 2-line
ModelMixin stub and parity-tests our flax modules against them with shared
random weights, breaking the circularity for VKpsGuider, AudioProjection
(incl. PerceiverAttention + perceiver FF), ResnetBlock3D, InflatedConv3d,
InflatedGroupNorm, Upsample3D and Downsample3D. Skipped when /root/reference
is absent."""

import importlib
import importlib.machinery
import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from .utils import assert_close, flax_params_from_torch

REF = "/root/reference"
PKG = "vx_ref_modules"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "modules")), reason="reference tree not mounted"
)


def _install_ref_package():
    """Register /root/reference/modules as an importable package, backed by the
    pure-torch diffusers stub (tests/diffusers_stub.py) so the reference's
    core files (attention.py, motion_module.py, mutual_self_attention.py)
    load VERBATIM — not just the diffusers-free ones."""
    if PKG in sys.modules:
        return
    from . import diffusers_stub

    diffusers_stub.install()

    spec = importlib.machinery.ModuleSpec(PKG, None, is_package=True)
    spec.submodule_search_locations = [os.path.join(REF, "modules")]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[PKG] = pkg


def _ref(name):
    _install_ref_package()
    return importlib.import_module(f"{PKG}.{name}")


def _randomize_(module, seed):
    """In-place random weights (the reference zero-inits some convs; parity on
    all-zero outputs would prove nothing)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return module


def _t5j(x):
    """torch (B, C, F, H, W) -> ours (B, F, H, W, C) numpy."""
    return x.detach().numpy().transpose(0, 2, 3, 4, 1)


def test_vkps_guider_matches_reference_code():
    ref_mod = _ref("v_kps_guider")
    from vexpress_tpu.models.vkps_guider import VKpsGuider

    chans = (4, 8, 8, 16)
    o = _randomize_(
        ref_mod.VKpsGuider(conditioning_embedding_channels=24, block_out_channels=chans),
        seed=0,
    ).eval()
    x = torch.randn(1, 3, 2, 16, 16, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref_out = o(x)

    m = VKpsGuider(conditioning_embedding_channels=24, block_out_channels=chans)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(_t5j(x)))
    assert_close(out, _t5j(ref_out))


@pytest.mark.parametrize("seq", [10, 7])
def test_audio_projection_matches_reference_code(seq):
    ref_mod = _ref("audio_projection")
    from vexpress_tpu.models.audio_projection import AudioProjection

    cfg = dict(dim=32, depth=2, dim_head=8, heads=4, num_queries=5,
               embedding_dim=16, output_dim=24, ff_mult=2, max_seq_len=10)
    o = _randomize_(ref_mod.AudioProjection(**cfg), seed=2).eval()
    x = torch.randn(3, seq, cfg["embedding_dim"], generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref_out = o(x)

    m = AudioProjection(**cfg)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(x.numpy()))
    assert_close(out, ref_out.numpy(), atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("in_ch,out_ch", [(16, 16), (16, 32)])
def test_resnet_block3d_matches_reference_code(in_ch, out_ch):
    ref_mod = _ref("resnet")
    from vexpress_tpu.models.blocks import ResnetBlock

    B, F = 2, 3
    o = _randomize_(
        ref_mod.ResnetBlock3D(
            in_channels=in_ch, out_channels=out_ch, temb_channels=8,
            groups=4, eps=1e-5, use_inflated_groupnorm=True,
        ),
        seed=4,
    ).eval()
    x = torch.randn(B, in_ch, F, 6, 6, generator=torch.Generator().manual_seed(5))
    temb = torch.randn(B, 8, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        ref_out = o(x, temb)

    # ours folds frames into batch: (b c f h w) -> ((b f) h w c), frame fastest
    m = ResnetBlock(out_ch, eps=1e-5, groups=4)
    x_j = _t5j(x).reshape(B * F, 6, 6, in_ch)
    temb_j = np.repeat(temb.numpy(), F, axis=0)
    out = m.apply(flax_params_from_torch(o), jnp.asarray(x_j), jnp.asarray(temb_j))
    assert_close(out.reshape(B, F, 6, 6, out_ch), _t5j(ref_out))


def test_up_down_sample_match_reference_code():
    ref_mod = _ref("resnet")
    from vexpress_tpu.models.blocks import Downsample, Upsample

    B, F, C = 1, 2, 8
    x = torch.randn(B, C, F, 8, 8, generator=torch.Generator().manual_seed(7))
    x_j = jnp.asarray(_t5j(x).reshape(B * F, 8, 8, C))

    o_up = _randomize_(ref_mod.Upsample3D(C, use_conv=True), seed=8).eval()
    with torch.no_grad():
        ref_up = o_up(x)
    up = Upsample(C).apply(flax_params_from_torch(o_up), x_j)
    assert_close(up.reshape(B, F, 16, 16, C), _t5j(ref_up))

    o_down = _randomize_(ref_mod.Downsample3D(C, use_conv=True), seed=9).eval()
    with torch.no_grad():
        ref_down = o_down(x)
    down = Downsample(C).apply(flax_params_from_torch(o_down), x_j)
    assert_close(down.reshape(B, F, 4, 4, C), _t5j(ref_down))
