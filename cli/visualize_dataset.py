#!/usr/bin/env python
"""Render training-dataset samples to mp4 for visual inspection.

TPU-build equivalent of the reference's dataset debug main
(/root/reference/datasets/talking_face_video.py:280-353): for each sampled
clip, writes a side-by-side strip — target frames | kps image | face mask |
lip mask — plus the reference image as a leading freeze-frame, so augmentation
(crop/flip/R-G swap), mask placement, and audio-window alignment can be
eyeballed before a training run.

Usage:
  PYTHONPATH=/root/repo python cli/visualize_dataset.py \
      --data_meta_paths data/meta.json --output_dir /tmp/ds_debug \
      --num_samples 4 --num_frames 12 --image_size 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_meta_paths", nargs="+", required=True)
    p.add_argument("--output_dir", type=str, default="./dataset_debug")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--num_frames", type=int, default=12)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--sample_rate", type=int, default=1)
    p.add_argument("--fps", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from vexpress_tpu.pipelines.media import save_video
    from vexpress_tpu.train.dataset import TalkingFaceVideoDataset

    ds = TalkingFaceVideoDataset(
        meta_paths=args.data_meta_paths,
        image_size=(args.image_size, args.image_size),
        num_frames=args.num_frames,
        sample_rate=args.sample_rate,
        seed=args.seed,
    )
    print(f"[vexpress] dataset: {len(ds)} clips")

    os.makedirs(args.output_dir, exist_ok=True)
    made = 0
    idx = 0
    while made < args.num_samples and idx < 10 * args.num_samples:
        sample = ds.get_sample(idx)
        idx += 1
        if sample is None:
            continue

        def to_u8(x):  # [-1,1] or [0,1] -> uint8 rgb
            x = np.asarray(x, np.float32)
            if x.min() < -0.01:
                x = (x + 1.0) / 2.0
            return (np.clip(x, 0, 1) * 255).astype(np.uint8)

        tgt = to_u8(sample["target_images"])           # (F, H, W, 3)
        kps = to_u8(sample["kps_images"])              # (F, H, W, 3)
        f, h, w, _ = tgt.shape

        def mask_to_rgb(m):  # (F, h', w') {0,1} -> (F, H, W, 3) uint8
            import cv2

            out = np.zeros((f, h, w, 3), np.uint8)
            for i in range(f):
                mi = (np.asarray(m[i], np.float32) * 255).astype(np.uint8)
                out[i] = cv2.resize(mi, (w, h), interpolation=cv2.INTER_NEAREST)[..., None]
            return out

        strip = np.concatenate(
            [tgt, kps, mask_to_rgb(sample["face_masks"]), mask_to_rgb(sample["lip_masks"])],
            axis=2,
        )
        ref = to_u8(sample["reference_image"])
        ref_row = np.concatenate([ref] * 4, axis=1)[None].repeat(max(1, int(args.fps)), axis=0)
        video = np.concatenate([ref_row, strip], axis=0)

        out_path = os.path.join(args.output_dir, f"sample_{made}.mp4")
        save_video(video, None, out_path, fps=args.fps, apply_median_filter=False)
        a = sample["audio_frame_embeddings"]
        print(f"[vexpress] {out_path}: {f} frames, audio windows {a.shape}", flush=True)
        made += 1

    if made == 0:
        print("[vexpress] no usable samples (all clips shorter than num_frames?)")


if __name__ == "__main__":
    main()
