#!/usr/bin/env python
"""Sampler quality on the REAL model: is DPM-Solver++ (2M) at 12 steps at
least as accurate as the reference's 25-step DDIM configuration?

Both samplers integrate the SAME probability-flow ODE (same beta tables, same
v-prediction UNet); a fine-grid DDIM run converges to that ODE's solution, so
it serves as ground truth for the *solver truncation error* — the only thing
that differs between the two configurations. tests/test_dpm_solver.py proves
the ordering on a closed-form model; this measures it on the production UNet
(bf16, full pipeline: blended windows + CFG + VAE decode), where nonlinearity
and bf16 noise could in principle change the picture.

Protocol (124-frame clip, identical seed/conditioning, median filter OFF so
the comparison sees raw decoder output):
  gt     = DDIM @ 100 steps   (fine grid ~ exact ODE solution)
  ddim25 = DDIM @ 25          (the reference's shipped configuration)
  dpm12  = DPM-Solver++ 2M @ 12

Claim validated iff PSNR(dpm12, gt) >= PSNR(ddim25, gt): the 12-step DPM
output is closer to the exact sampler output than the reference's own
configuration — i.e. the 2x step cut is quality-free.

Prints one JSON line per run plus a final summary line.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.psnr import psnr  # noqa: E402


def main():
    import jax.numpy as jnp

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline

    height = width = 512
    video_length = 124

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    print(json.dumps({"startup_s": round(time.time() - t0, 1)}), flush=True)

    rng = np.random.default_rng(0)
    reference_image = rng.uniform(0, 1, (height, width, 3)).astype(np.float32)
    kps_images = rng.integers(0, 256, (video_length, height, width, 3), dtype=np.uint8)
    n_samples = int(video_length / 30.0 * 16000)
    waveform = (0.1 * rng.standard_normal(n_samples)).astype(np.float32)

    base = dict(
        reference_image=reference_image,
        kps_images=kps_images,
        audio_waveform=waveform,
        width=width,
        height=height,
        video_length=video_length,
        guidance_scale=3.5,
        context_frames=24,
        context_overlap=4,
        seed=0,
        median_filter=False,  # raw decoder output — no post-filter masking
    )

    cache_dir = os.environ.get("VEXPRESS_SAMPLER_CACHE", "/tmp/sampler_quality")
    os.makedirs(cache_dir, exist_ok=True)

    def run(name, sampler, steps):
        path = os.path.join(cache_dir, f"{name}.npy")
        if os.path.exists(path):
            print(json.dumps({"run": name, "cached": True}), flush=True)
            return np.load(path, mmap_mode="r")
        t = time.time()
        frames = pipe(**base, sampler=sampler, num_inference_steps=steps)
        frames = np.asarray(frames)  # device_get = true completion
        print(json.dumps({"run": name, "e2e_s": round(time.time() - t, 1)}),
              flush=True)
        np.save(path, frames)
        return frames

    # runs: name=sampler@steps, comma-separated; first is the accuracy anchor
    # (the reference's DDIM-25), gt candidates carry a _gt suffix.
    spec = (sys.argv[1] if len(sys.argv) > 1 else
            "ddim100_gt=ddim@100,ddim25=ddim@25,dpmpp_2m_12=dpmpp_2m@12")
    frames = {}
    for item in spec.split(","):
        name, cfg = item.split("=")
        sampler, steps = cfg.split("@")
        frames[name] = run(name, sampler, int(steps))

    gts = {k: v for k, v in frames.items() if k.endswith("_gt")}
    rest = {k: v for k, v in frames.items() if not k.endswith("_gt")}
    # solver-neutral ground-truth check: independent fine-grid solvers must
    # agree with each other far more closely than any low-step run does,
    # otherwise "distance to gt" measures gt noise, not solver error
    gt_names = sorted(gts)
    for i in range(len(gt_names) - 1):
        a, b = gt_names[i], gt_names[i + 1]
        print(json.dumps({"gt_agreement": f"{a} vs {b}",
                          "psnr_db": round(psnr(gts[a], gts[b]), 2)}), flush=True)
    table = {}
    for name, f in rest.items():
        table[name] = {g: round(psnr(f, gts[g]), 2) for g in gt_names}
    print(json.dumps({
        "metric": "sampler_quality_psnr_vs_fine_grid_ode_solution",
        "psnr_db": table,
        "note": "PSNR vs fine-grid ODE solutions on the production bf16 "
                "pipeline (CFG 3.5, blended windows); higher = closer to the "
                "exact sampler output",
    }), flush=True)


if __name__ == "__main__":
    main()
