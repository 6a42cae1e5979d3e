#!/usr/bin/env python
"""Phase-timed stage-2 piecewise train step on the real chip: where do the
~3 s/step go? Times each phase with a forced device_get sync (adds ~40 ms per
sync — per-phase shares are directional; the unsynced whole-step time is the
load-bearing number, same discipline as PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train_step.py
           [--frames 4] [--stage 2] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VEXPRESS_FLASH_BQ", "1024")  # differentiated kernel VMEM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.train.train_step import (TrainConfig, TrainState,
                                               make_optimizer, mask_tree)
    from vexpress_tpu.train.piecewise_trainer import PiecewiseTrainer

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    # bf16 param storage: fp32 params are 9.3 GB and OOM the 16 GB chip once
    # Adam state + piecewise block-boundary activations land (measured r5);
    # production TPU training stores bf16 (cli/train.py weight_dtype)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    print(f"# startup {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    cfg = TrainConfig.stage(f"stage_{args.stage}", num_frames=args.frames,
                            reduce_optimizer_memory="8bit")
    tx, mask = make_optimizer(pipe.params, cfg)
    trainer = PiecewiseTrainer(pipe, cfg, tx, mask=mask)
    opt_state = tx.init(mask_tree(pipe.params, mask))
    state = TrainState(pipe.params, opt_state, jnp.zeros((), jnp.int32))

    b, f, H, W = 1, args.frames, 512, 512
    rng = np.random.default_rng(0)
    batch = {
        "target_images": jnp.asarray(rng.uniform(-1, 1, (b, f, H, W, 3)), jnp.float32),
        "reference_image": jnp.asarray(rng.uniform(-1, 1, (b, H, W, 3)), jnp.float32),
        "kps_images": jnp.asarray(rng.uniform(0, 1, (b, f, H, W, 3)), jnp.float32),
        "audio_frame_embeddings": jnp.asarray(rng.normal(size=(b, f, 10, 768)), jnp.float32),
        "lip_masks": jnp.asarray(rng.uniform(0, 1, (b, f, H // 8, W // 8)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    sync = jax.jit(lambda x: jnp.mean(jnp.abs(x.astype(jnp.float32))))

    def force(x):
        return float(np.asarray(sync(x)))

    # ---- warm every program (compiles), unmeasured
    t0 = time.time()
    state, metrics = trainer.step(state, batch, key)
    force(metrics["loss"])
    print(f"# warm step (incl. compiles) {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # ---- unsynced whole-step (the honest number)
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        state, metrics = trainer.step(state, batch, key)
        force(metrics["loss"])
        # the loss sync does NOT cover the optimizer update; force params too
        force(jax.tree_util.tree_leaves(state.params["denoising_unet"])[0])
        times.append(time.time() - t0)
    print(json.dumps({"whole_step_s": [round(t, 3) for t in times]}), flush=True)

    # ---- phase-synced breakdown (directional shares)
    prep = trainer._prep(state.params, batch, key)
    t = {}
    t0 = time.time()
    prep = trainer._prep(state.params, batch, key)
    force(prep["noisy"])
    t["prep_vae_encodes"] = time.time() - t0

    t0 = time.time()
    kps_feat, _ = trainer._cond_kps_fwd(
        state.params["v_kps_guider"], batch["kps_images"], prep["uncond"], prep["kps_keep"])
    force(kps_feat)
    t["kps_guider_fwd"] = time.time() - t0

    t0 = time.time()
    tok, _ = trainer._cond_audio_fwd(
        state.params["audio_projection"], batch["audio_frame_embeddings"], prep["uncond"])
    force(tok)
    t["audio_proj_fwd"] = time.time() - t0

    t0 = time.time()
    banks, _ = trainer.grad.refnet_forward_and_grad(
        state.params["reference_net"], prep["ref_latents"], param_mask=None)
    force(banks[0])
    t["refnet_fwd_12prog"] = time.time() - t0

    refs, _ = trainer._scale_refs_fwd(banks, prep["uncond"], prep["ref_keep"])

    def loss_head(pred, loss_args):
        target, lip_masks, snr_w = loss_args
        loss = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        loss = loss.mean(axis=tuple(range(1, loss.ndim))) * snr_w
        return loss.mean()

    t0 = time.time()
    loss, unet_grads, cots = trainer.grad.denoiser_value_and_grad(
        state.params["denoising_unet"], prep["noisy"], prep["timesteps"], tok, refs,
        kps_feat, loss_head, loss_args=(prep["target"], batch["lip_masks"], prep["snr_w"]),
        param_mask=mask["denoising_unet"],
        want_ctx_cot=True, want_refs_cot=False, want_kps_cot=False,
    )
    force(loss)
    force(jax.tree_util.tree_leaves(unet_grads)[0])
    t["denoiser_fwd_bwd_24prog"] = time.time() - t0

    t0 = time.time()
    _, grads = trainer.loss_and_grads(state.params, batch, key)
    force(jax.tree_util.tree_leaves(grads["denoising_unet"])[0])
    t["full_loss_and_grads"] = time.time() - t0

    print(json.dumps({k: round(v, 3) for k, v in t.items()}), flush=True)

    # ---- analytic MFU vs the fwd+bwd FLOP floor (VERDICT r4 #7).
    # Denoiser fwd FLOPs scale ~linearly in batch*frames (spatial convs +
    # attention dominate; temporal attn is ~2% at these sizes): the XLA-cost-
    # model window step (CFG batch 2 x 24 frames, tools/unet_step_flops.py)
    # = 47,568.5 GFLOP -> 990.8 GFLOP per frame-instance. Backward ~2x
    # forward (dgrad through every layer + wgrad on trainable). Refnet fwd
    # (frozen in stage 2) ~0.8x one frame; VAE encodes (f+1 frames) ~minor.
    per_frame = 47568.5 / 48.0
    fwd = per_frame * b * f
    train_flops_g = 3.0 * fwd + 0.8 * per_frame * b + 0.1 * fwd
    whole = float(np.median(times))
    print(json.dumps({
        "analytic_train_flops_gflop": round(train_flops_g, 1),
        "median_step_s": round(whole, 3),
        "achieved_tflops": round(train_flops_g / whole / 1000.0, 2),
        "mfu_pct_vs_v5e_bf16_peak": round(
            train_flops_g / whole / 1000.0 / 197.0 * 100.0, 2),
        "s_per_frame": round(whole / (b * f), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
