#!/usr/bin/env python
"""PSNR / parity comparison between two videos (or frame stacks).

Used for output-fidelity checks against the reference implementation
(BASELINE.json: "PSNR >= 40 vs reference frames").
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def load_frames(path: str, max_frames=None) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    sys.path.insert(0, ".")
    from vexpress_tpu.pipelines.media import read_video_rgb

    return read_video_rgb(path, max_frames=max_frames).astype(np.float32) / 255.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args()

    a = load_frames(args.a, args.max_frames)
    b = load_frames(args.b, args.max_frames)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    if a.shape != b.shape:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")

    per_frame = [psnr(a[i], b[i]) for i in range(n)]
    print(f"frames: {n}  mean PSNR: {np.mean(per_frame):.2f} dB  "
          f"min: {np.min(per_frame):.2f}  max: {np.max(per_frame):.2f}")


if __name__ == "__main__":
    main()
