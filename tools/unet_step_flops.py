#!/usr/bin/env python
"""One-off: count the REAL FLOPs of one production denoise window step with
XLA's own cost model (jit(...).lower(...).cost_analysis() on CPU — shapes
only, nothing executes). Feeds the achieved-MFU line in bench.py:

    whole_step_mfu = flops / step_seconds / 197e12   (v5e bf16 peak)

Production window-step geometry (bench.py / reference inference defaults):
CFG batch 2 x 24-frame window, 64x64 latents, SD1.5 UNet + motion modules,
audio tokens (48, 5, 768), 16 reference banks at full fusion.
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from vexpress_tpu.io.loaders import default_pipeline_models  # noqa: E402


def main():
    models = default_pipeline_models(dtype=jnp.bfloat16)
    cfg = models.unet_config
    h = w = 64
    win = 24
    b = 2  # CFG
    la = 5

    from vexpress_tpu.models.unet_3d import DenoisingUNet3D

    unet = DenoisingUNet3D(cfg, dtype=jnp.bfloat16)
    shapes = cfg.ref_feature_shapes(h, w)
    sample = jax.ShapeDtypeStruct((b, win, h, w, 4), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((b,), jnp.int32)
    audio = jax.ShapeDtypeStruct((b, win, la, cfg.cross_attention_dim), jnp.bfloat16)
    refs = tuple(jax.ShapeDtypeStruct((b, l, c), jnp.bfloat16) for l, c in shapes)
    kps = jax.ShapeDtypeStruct((b, win, h, w, cfg.block_out_channels[0]), jnp.bfloat16)

    params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), sample, t, audio,
                            refs, kps)

    def fwd(p, s, tt, a, r, k):
        return unet.apply(p, s, tt, a, r, k, 0.95, 3.0, zero_uncond_kv=True)

    lowered = jax.jit(fwd).lower(params, sample, t, audio, refs, kps)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops")
    print(json.dumps({
        "window_step_gflops": round(flops / 1e9, 1) if flops else None,
        "bytes_accessed_gib": round(cost.get("bytes accessed", 0) / 2**30, 2),
        "geometry": {"cfg_batch": b, "window": win, "latent": [h, w]},
    }))


if __name__ == "__main__":
    main()
