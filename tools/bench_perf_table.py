#!/usr/bin/env python
"""Per-block marginal-cost + MFU table at production shapes (512x512 window
step: CFG·24 frames = batch 48). Answers VERDICT r3 item 2: where do the
non-attention ~45% of the window step go, and at what MXU utilization.

Methodology (PERFORMANCE.md "measurement discipline"): marginal-chain timing —
the op repeated N times inside one jit with a data dependency, device_get of a
jitted scalar reducer to force completion; dispatch overhead amortized.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_perf_table.py
       [--res 64,32,16,8]  [--reps 5]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_HBM_GBS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.models.blocks import (
        Downsample,
        FeedForward,
        ResnetBlock,
        SpatialTransformer,
        Upsample,
        group_norm,
    )
    from vexpress_tpu.models.motion_module import TemporalMotionModule

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    reduce = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))
    np.asarray(reduce(jnp.zeros((4, 4), dt)))  # pre-warm the reducer
    N = 6
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
    res_arg = sys.argv[sys.argv.index("--res") + 1] if "--res" in sys.argv else "64,32,16,8"
    resolutions = [int(r) for r in res_arg.split(",")]

    rows = []

    def bench(name, init_fn, apply_fn, x0, flops, bytes_moved):
        """flops / bytes_moved: per single op application."""
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
            mfu = flops / (ms / 1000) / (PEAK_TFLOPS * 1e12) * 100
            hbm = bytes_moved / (ms / 1000) / (PEAK_HBM_GBS * 1e9) * 100
            rows.append((name, ms, flops / 1e9, mfu, hbm))
            print(f"{name:<44} {ms:8.2f} ms  {flops/1e9:8.1f} GF  "
                  f"MFU {mfu:5.1f}%  HBM {hbm:5.1f}%", flush=True)
        except Exception as e:
            print(f"{name:<44} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    BF, F = 48, 24
    ch_of = {64: 320, 32: 640, 16: 1280, 8: 1280}
    temb_dim = 1280

    def conv_flops(b, hw, cin, cout, k=3):
        return b * hw * hw * cin * cout * k * k * 2

    def nbytes(*shapes):
        return sum(int(np.prod(s)) * 2 for s in shapes)  # bf16

    for hw in resolutions:
        C = ch_of[hw]
        x = jax.random.normal(key, (BF, hw, hw, C), dt)
        temb = jax.random.normal(key, (BF, temb_dim), dt)
        L = hw * hw
        ctx = jax.random.normal(key, (BF, 5, 768), dt)
        ref = jax.random.normal(key, (2, L, C), dt)
        print(f"--- {hw}x{hw}, C={C}, batch {BF} (CFG x {F} frames) ---", flush=True)

        rn = ResnetBlock(C, dtype=dt)
        bench(f"Resnet {C}->{C} @{hw}",
              lambda rn=rn, x=x: rn.init(key, x, temb),
              lambda p, y, rn=rn: rn.apply(p, y, temb),
              x,
              2 * conv_flops(BF, hw, C, C),
              nbytes(*(x.shape,) * 6))

        # up-block resnet: concat(skip, x) -> C  (first conv reads 2C)
        x2 = jax.random.normal(key, (BF, hw, hw, 2 * C), dt)
        rn2 = ResnetBlock(C, dtype=dt)
        bench(f"Resnet concat {2*C}->{C} @{hw}",
              lambda rn2=rn2, x2=x2: rn2.init(key, x2, temb),
              lambda p, y, rn2=rn2, C=C: jnp.concatenate(
                  [rn2.apply(p, y, temb), y[..., C:]], axis=-1),
              x2,
              conv_flops(BF, hw, 2 * C, C) + conv_flops(BF, hw, C, C)
              + conv_flops(BF, hw, 2 * C, C, k=1),
              nbytes(x2.shape, x2.shape))

        mm = TemporalMotionModule(C, 8, 1, 32, dtype=dt)
        # 2 attn sublayers (qkvo projections + core) + GEGLU FF + proj in/out
        mm_flops = (2 * (4 * BF * L * C * C * 2 + 2 * 2 * (BF // F) * L * F * F * (C) * 2)
                    + 2 * BF * L * C * 4 * C * 2 + 2 * BF * L * C * C * 2)
        bench(f"MotionModule f={F} @{hw}",
              lambda mm=mm, x=x: mm.init(key, x, F),
              lambda p, y, mm=mm: mm.apply(p, y, F),
              x, mm_flops, nbytes(*(x.shape,) * 12))

        st = SpatialTransformer(C, 8, temporal=True, dtype=dt)
        one = jnp.asarray(1.0, dt)
        # attn1 (self, LxL) + attn1_5 (ref, cond half only) + attn2 (5 tokens)
        # + GEGLU FF + proj in/out; CFG fast path halves attn1_5/attn2
        st_flops = (
            4 * BF * L * C * C * 2 + 2 * BF * L * L * C * 2           # attn1
            + 4 * (BF // 2) * L * C * C * 2 + 2 * (BF // 2) * L * L * C * 2  # attn1_5
            + (BF // 2) * L * C * C * 2 * 2                            # attn2 qo
            + 2 * BF * L * C * 4 * C * 2                               # FF
            + 2 * BF * L * C * C * 2                                   # proj in/out
        )
        bench(f"SpatialTransformer(attn1+1_5+2+ff) @{hw}",
              lambda st=st, x=x: st.init(key, x, ctx, (ref,), one, one, True, F),
              lambda p, y, st=st: st.apply(p, y, ctx, (ref,), one, one, True, F),
              x, st_flops, nbytes(*(x.shape,) * 10))

        gn = group_norm(32, 1e-5, "n", dt)
        bench(f"GroupNorm @{hw}",
              lambda gn=gn, x=x: gn.init(key, x),
              lambda p, y, gn=gn: gn.apply(p, y),
              x, 0, nbytes(x.shape, x.shape))

        ff = FeedForward(C, dtype=dt)
        xs = x.reshape(BF, L, C)
        bench(f"FeedForward(GEGLU) @{hw}",
              lambda ff=ff, xs=xs: ff.init(key, xs),
              lambda p, y, ff=ff: ff.apply(p, y),
              xs, 2 * BF * L * C * 4 * C * 2, nbytes(xs.shape, xs.shape))

        if hw > 8:
            dsp = Downsample(C, dtype=dt)
            bench(f"Downsample @{hw}",
                  lambda dsp=dsp, x=x: dsp.init(key, x),
                  lambda p, y, dsp=dsp: jnp.repeat(jnp.repeat(
                      dsp.apply(p, y), 2, axis=1), 2, axis=2),
                  x, conv_flops(BF, hw // 2, C, C), nbytes(x.shape, x.shape))
            usp = Upsample(C, dtype=dt)
            bench(f"Upsample @{hw}",
                  lambda usp=usp, x=x: usp.init(key, x),
                  lambda p, y, usp=usp: usp.apply(p, y)[:, ::2, ::2, :],
                  x, conv_flops(BF, hw * 2, C, C), nbytes(x.shape, x.shape))

    print("\n| block | ms | GFLOP | MFU % | HBM % |")
    print("|---|---|---|---|---|")
    for name, ms, gf, mfu, hbm in rows:
        print(f"| {name} | {ms:.2f} | {gf:.0f} | {mfu:.1f} | {hbm:.1f} |")


if __name__ == "__main__":
    main()
