#!/usr/bin/env python
"""Resident-HBM estimate for the 924-frame save_memory workload.

`device.memory_stats()` returns None through the axon tunnel, so the
allocator's true `peak_bytes_in_use` is unavailable here. This measures the
closest observable proxy: peak RESIDENT bytes (sum of live `jax.Array`
nbytes) sampled per denoise step and around decode, during a real
924-frame `save_memory=True` pass at 512x512. XLA per-program temporaries
(activations inside one window step) come on top of resident; the sampled
number is therefore a LOWER bound and the comparison row against the
reference's 7,956 MiB V100 peak (README.md:116) is annotated as such.

Runs 2 denoise steps only — buffer shapes (the thing being measured) are
identical to the 25-step production run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/hbm_estimate.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VEXPRESS_FLASH_BQ", "2048")


def live_mib():
    import jax

    return sum(a.nbytes for a in jax.live_arrays()) / 2**20


def main():
    import jax.numpy as jnp

    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.pipelines.context import compute_video_length
    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    height = width = 512
    L = compute_video_length(930, 24, 4)  # 924, the reference headline clip

    t0 = time.time()
    models = default_pipeline_models(dtype=jnp.bfloat16)
    pipe = load_pipeline(models=models, verbose=False, param_dtype=jnp.bfloat16)
    after_load = live_mib()
    print(f"# startup {time.time()-t0:.0f}s, params resident {after_load:.0f} MiB",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    peak = {"v": after_load}

    def cb(i, t):
        peak["v"] = max(peak["v"], live_mib())

    video = pipe(
        reference_image=rng.uniform(0, 1, (height, width, 3)).astype(np.float32),
        kps_images=rng.integers(0, 256, (L, height, width, 3), dtype=np.uint8),
        audio_waveform=(0.1 * rng.standard_normal(int(L / 30 * 16000))).astype(np.float32),
        width=width, height=height, video_length=L,
        num_inference_steps=2, guidance_scale=3.5,
        context_frames=24, context_overlap=4, seed=0,
        median_filter=True, output_yuv420=True, save_memory=True,
        progress_callback=cb,
    )
    peak["v"] = max(peak["v"], live_mib())  # decode output planes still live
    for plane in video:
        np.asarray(plane)
    print(json.dumps({
        "metric": "resident_hbm_peak_mib_924f_save_memory",
        "value": round(peak["v"], 1),
        "params_resident_mib": round(after_load, 1),
        "note": "live jax.Array bytes (lower bound: XLA per-program temps on "
                "top); reference V100 peak for the same workload: 7956 MiB",
    }), flush=True)


if __name__ == "__main__":
    main()
