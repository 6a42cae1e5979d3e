"""VAE parity vs torch oracle (tiny config)."""

import torch
import jax.numpy as jnp

from vexpress_tpu.models.vae import AutoencoderKL, VAEConfig

from .oracles.torch_vae import OVAE
from .utils import assert_close, flax_params_from_torch, t2j

torch.manual_seed(0)

CFG = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=2, norm_num_groups=4)


def _models():
    o = OVAE(chs=(8, 16, 16, 16), layers=2, groups=4, latent=4).eval()
    m = AutoencoderKL(CFG)
    params = flax_params_from_torch(o)
    return o, m, params


def test_vae_encode_parity():
    o, m, params = _models()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = o.encode_mean(x)
    out = m.apply(params, jnp.asarray(t2j(x)), method=AutoencoderKL.encode)
    assert ref.shape == (2, 4, 4, 4)
    assert_close(out, t2j(ref), atol=1e-4, rtol=1e-4)


def test_vae_decode_parity():
    o, m, params = _models()
    z = torch.randn(2, 4, 4, 4)
    with torch.no_grad():
        ref = o.decode(z)
    out = m.apply(params, jnp.asarray(t2j(z)), method=AutoencoderKL.decode)
    assert ref.shape == (2, 3, 32, 32)
    assert_close(out, t2j(ref), atol=1e-4, rtol=1e-4)
