#!/usr/bin/env python
"""Marginal-chain timing of individual UNet blocks at each resolution.

timed_stages (tools/bench_window_step.py) showed down_2 (16x16) and down_3
(8x8) costing far more than their flop estimates; this dissects a whole
DownBlock and its components at the production shapes with dispatch overhead
amortized (op chained N times inside one jit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_blocks.py
"""

import os
import time

import numpy as np

os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.models.blocks import ResnetBlock, SpatialTransformer, group_norm
    from vexpress_tpu.models.motion_module import TemporalMotionModule

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    N = 6

    def bench_chain(name, init_fn, apply_fn, x0, reps=5):
        try:
            params = init_fn()

            def chained(p, x):
                y = x
                for _ in range(N):
                    y = apply_fn(p, y) * (1.0 / 16) + x
                return y

            f = jax.jit(chained)
            out = f(params, x0)
            np.asarray(reduce(out))
            t0 = time.time()
            for _ in range(reps):
                out = f(params, out)
            np.asarray(reduce(out))
            ms = (time.time() - t0) / reps / N * 1000
            print(f"{name:<46} {ms:8.2f} ms/op", flush=True)
        except Exception as e:
            print(f"{name:<46} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # production shapes per resolution: (spatial, C, heads) with BF=48, f=24
    for (hw, C) in [(16, 1280), (8, 1280), (32, 640)]:
        BF = 48
        x_img = jax.random.normal(key, (BF, hw, hw, C), dt)
        temb = jax.random.normal(key, (BF, 1280), dt)
        ctx = jax.random.normal(key, (BF, 5, 768), dt)
        L = hw * hw
        ref = jax.random.normal(key, (2, L, C), dt)

        rn = ResnetBlock(C, dtype=dt)
        bench_chain(f"ResnetBlock {C} ({BF},{hw},{hw})",
                    lambda: rn.init(key, x_img, temb),
                    lambda p, x: rn.apply(p, x, temb), x_img)

        mm = TemporalMotionModule(C, 8, 1, 32, dtype=dt)
        bench_chain(f"MotionModule f=24 ({BF},{hw},{hw},{C})",
                    lambda: mm.init(key, x_img, 24),
                    lambda p, x: mm.apply(p, x, 24), x_img)

        if hw >= 16:
            st = SpatialTransformer(C, 8, temporal=True, dtype=dt)
            one = jnp.asarray(1.0, dt)

            def st_apply(p, x):
                return st.apply(p, x, ctx, (ref,), one, one, True, 24)

            bench_chain(f"SpatialTransformer ({BF},{hw},{hw},{C})",
                        lambda: st.init(key, x_img, ctx, (ref,), one, one, True, 24),
                        st_apply, x_img)

        gn = group_norm(32, 1e-5, "n", dt)
        bench_chain(f"GroupNorm ({BF},{hw},{hw},{C})",
                    lambda: gn.init(key, x_img),
                    lambda p, x: gn.apply(p, x), x_img)


if __name__ == "__main__":
    main()
