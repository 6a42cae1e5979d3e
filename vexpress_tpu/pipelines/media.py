"""Host-side media IO + device-side post-processing.

save_video mirrors pipelines/utils.py:64-87 (3x3x3 median filter -> mp4 write
-> audio mux) but the median filter runs on the TPU as a batched JAX op
instead of a per-frame torch host loop, and the audio mux uses the native
in-process remuxer instead of an ffmpeg subprocess.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.media_native import mux_audio_video, native_available


def median_filter_3d(video: jax.Array, kernel_size: int = 3, frame_chunk: int = 2) -> jax.Array:
    """3-D median filter over (F, H, W, C) in [0,1], reflect padding
    (pipelines/utils.py:46-61). Runs fully on device.

    Internally works in (F, C, H, W) so the TPU tile dims (sublane, lane) land
    on H, W — channels-last here would pad C=3 to 128 lanes (a 42x memory
    blowup on the 27-patch stack)."""
    k = kernel_size
    pad = k // 2
    f, h, w, c = video.shape
    v = video.transpose(0, 3, 1, 2)  # (F, C, H, W)
    v = jnp.pad(v, ((pad, pad), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    def one_frame(i):
        # (k, C, H+2p, W+2p) neighborhood of frame i
        seg = jax.lax.dynamic_slice(v, (i, 0, 0, 0), (k, c, h + 2 * pad, w + 2 * pad))
        patches = [
            seg[:, :, dy : dy + h, dx : dx + w]
            for dy in range(k)
            for dx in range(k)
        ]
        stack = jnp.stack(patches, axis=0).reshape(k * k * k, c, h, w)
        return jnp.median(stack, axis=0)

    out = jax.lax.map(one_frame, jnp.arange(f), batch_size=frame_chunk)
    return out.transpose(0, 2, 3, 1)


def median_filter_3d_chunked(video: jax.Array, chunk: int = 32) -> jax.Array:
    """Exact median_filter_3d in fixed-size frame chunks so every video
    length reuses ONE compiled program (remote compiles cost minutes per new
    shape). Each chunk is processed with a 1-frame halo on both sides; the
    temporal reflect padding of the full filter is reproduced by reflecting
    the halo indices at the true video boundaries."""
    f = video.shape[0]
    if f <= chunk:
        return median_filter_3d(video)
    outs = []
    for start in range(0, f, chunk):
        core = min(chunk, f - start)
        # halo indices [start-1, ..., start+chunk] reflected at boundaries
        idx = np.arange(start - 1, start + chunk + 1)
        idx = np.abs(idx)  # reflect at 0
        idx = np.where(idx >= f, 2 * (f - 1) - idx, idx)  # reflect at f-1
        seg = video[jnp.asarray(idx)]
        filtered = _median_core(seg)  # (chunk, ...) core frames
        outs.append(filtered[:core])
    return jnp.concatenate(outs, axis=0)


@jax.jit
def _median_core(seg: jax.Array) -> jax.Array:
    """3x3x3 median of the core frames of `seg` (first/last frame are halo;
    spatial reflect padding as in median_filter_3d)."""
    k, pad = 3, 1
    fh, h, w, c = seg.shape
    v = seg.transpose(0, 3, 1, 2)
    v = jnp.pad(v, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    def one_frame(i):
        s = jax.lax.dynamic_slice(v, (i, 0, 0, 0), (k, c, h + 2 * pad, w + 2 * pad))
        patches = [s[:, :, dy : dy + h, dx : dx + w] for dy in range(k) for dx in range(k)]
        stack = jnp.stack(patches, axis=0).reshape(k * k * k, c, h, w)
        return jnp.median(stack, axis=0)

    out = jax.lax.map(one_frame, jnp.arange(fh - 2), batch_size=2)
    return out.transpose(0, 2, 3, 1)


def save_video(
    video: np.ndarray,
    audio_path: Optional[str],
    output_path: str,
    fps: float = 30.0,
    apply_median_filter: bool = True,
) -> None:
    """video: (F, H, W, 3) RGB — float in [0, 1] or uint8 (as produced by
    VExpressPipeline(output_uint8=True), which also applies the median filter
    on device; pass apply_median_filter=False then). Writes mp4 (+ audio mux)."""
    out = pathlib.Path(output_path)
    out.parent.mkdir(exist_ok=True, parents=True)

    video = np.asarray(video)
    if apply_median_filter:
        if video.dtype == np.uint8:
            video = video.astype(np.float32) / 255.0
        video = np.asarray(median_filter_3d_chunked(jnp.asarray(video)))

    if video.dtype == np.uint8:
        frames = video
    else:
        frames = (np.clip(video, 0.0, 1.0) * 255).astype(np.uint8)
    f, h, w, _ = frames.shape

    temp = str(out.with_name(out.stem + "-temp" + out.suffix))
    writer = cv2.VideoWriter(temp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {temp}")
    for i in range(f):
        writer.write(cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
    writer.release()

    if audio_path and native_available():
        try:
            mux_audio_video(temp, audio_path, str(out))
        except RuntimeError as e:
            # never lose a finished generation to a mux failure: keep the
            # video-only file (the reference's `os.system(ffmpeg ...)` also
            # ignores mux errors, pipelines/utils.py:84-87)
            print(f"[vexpress] WARNING: audio mux failed ({e}); saving video without audio")
            pathlib.Path(temp).rename(out)
            return
        pathlib.Path(temp).unlink()
    else:
        pathlib.Path(temp).rename(out)


def save_video_yuv(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    audio_path: Optional[str],
    output_path: str,
    fps: float = 30.0,
) -> None:
    """Write an mp4 straight from device-produced YUV420 planes
    (VExpressPipeline(output_yuv420=True)): Y (F, H, W), U/V (F, H/2, W/2)
    uint8. Uses the native streaming encoder — no host colorspace work, no
    cv2 — then muxes the audio like save_video."""
    from ..utils.media_native import NativeVideoEncoder

    out = pathlib.Path(output_path)
    out.parent.mkdir(exist_ok=True, parents=True)
    f, h, w = y.shape
    assert u.shape == (f, h // 2, w // 2) and v.shape == u.shape, (y.shape, u.shape, v.shape)

    temp = str(out.with_name(out.stem + "-temp" + out.suffix))
    with NativeVideoEncoder(temp, w, h, fps) as enc:
        for i in range(f):
            enc.write(y[i], u[i], v[i])

    if audio_path and native_available():
        try:
            mux_audio_video(temp, audio_path, str(out))
        except RuntimeError as e:
            print(f"[vexpress] WARNING: audio mux failed ({e}); saving video without audio")
            pathlib.Path(temp).rename(out)
            return
        pathlib.Path(temp).unlink()
    else:
        pathlib.Path(temp).rename(out)


def load_image_rgb(path: str, height: int, width: int) -> np.ndarray:
    """-> (H, W, 3) float32 RGB in [0, 1], resized (PIL-free, cv2 bilinear...
    reference resizes with PIL (inference.py:235-236); cv2 INTER_LINEAR is the
    equivalent default)."""
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image {path}")
    img = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def read_video_rgb(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """-> (F, H, W, 3) uint8 RGB frames."""
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {path}")
    return np.stack(frames)
