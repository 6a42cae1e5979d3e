"""Native media runtime (native/vexpress_media.cpp via ctypes): audio decode,
A/V mux (stream-copy and AAC-transcode paths), and save_video integration.

Reference behavior being matched: torchaudio.load + resample
(inference.py:245-253) and the ffmpeg mux that lets ffmpeg pick the audio
codec for the container (pipelines/utils.py:84-87) — so a .wav input must
still produce an mp4 WITH audio (PCM cannot be stream-copied into mp4)."""

import struct
import wave

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vexpress_tpu.utils.media_native import (  # noqa: E402
    load_audio, mux_audio_video, native_available, resample_linear,
)

RATE = 16000


def _write_wav(path, seconds, rate=RATE, freq=220.0):
    t = np.arange(int(seconds * rate)) / rate
    pcm = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
    return len(pcm)


def _write_video(path, n_frames, fps=8, size=48):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (size, size))
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    writer.release()


def test_load_audio_wav_roundtrip(tmp_path):
    n = _write_wav(tmp_path / "a.wav", 0.5)
    audio = load_audio(str(tmp_path / "a.wav"), RATE)
    assert abs(len(audio) - n) <= 2
    assert audio.dtype == np.float32
    # 220 Hz sine at 0.3 amplitude -> rms ~0.21
    assert 0.15 < float(np.sqrt((audio ** 2).mean())) < 0.3


def test_resample_linear_halves_length():
    x = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    y = resample_linear(x, 500)
    assert len(y) == 500
    assert np.max(np.abs(y[1:-1] - x[2:-2:2])) < 0.05


@pytest.mark.skipif(not native_available(), reason="native media lib not built")
def test_mux_wav_transcodes_to_mp4_audio(tmp_path):
    """PCM cannot be stream-copied into mp4; the mux must transcode (AAC)."""
    _write_video(tmp_path / "v.mp4", 16, fps=8)  # 2.0 s
    _write_wav(tmp_path / "a.wav", 3.0)          # longer -> must be trimmed
    out = tmp_path / "out.mp4"
    mux_audio_video(str(tmp_path / "v.mp4"), str(tmp_path / "a.wav"), str(out))

    audio = load_audio(str(out), RATE)  # decodes the muxed mp4's audio track
    dur = len(audio) / RATE
    assert 1.8 <= dur <= 2.3, f"audio not trimmed to video duration: {dur}s"
    assert float(np.sqrt((audio ** 2).mean())) > 0.05, "muxed audio is silent"

    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 16
    cap.release()


@pytest.mark.skipif(not native_available(), reason="native media lib not built")
def test_mux_mp3_stream_copy(tmp_path):
    """mp3 fits mp4 containers: the stream-copy fast path."""
    mp3 = "/root/reference/test_samples/short_case/AOC/aud.mp3"
    import os

    if not os.path.exists(mp3):
        pytest.skip("reference fixture unavailable")
    _write_video(tmp_path / "v.mp4", 16, fps=8)
    out = tmp_path / "out.mp4"
    mux_audio_video(str(tmp_path / "v.mp4"), mp3, str(out))
    audio = load_audio(str(out), RATE)
    assert 1.8 <= len(audio) / RATE <= 2.3


def test_save_video_with_wav_audio(tmp_path):
    """save_video end to end: uint8 frames + wav -> playable mp4."""
    from vexpress_tpu.pipelines.media import save_video

    _write_wav(tmp_path / "a.wav", 2.0)
    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, (12, 48, 48, 3), dtype=np.uint8)
    out = tmp_path / "gen" / "result.mp4"
    save_video(video, str(tmp_path / "a.wav"), str(out), fps=8.0,
               apply_median_filter=False)
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


@pytest.mark.skipif(not native_available(), reason="native media lib not built")
def test_native_yuv420_encoder_roundtrip(tmp_path):
    """Streaming YUV420 encoder (vx_venc_*): N frames in -> N frames out,
    content within codec loss of the source (the pipeline converts RGB->YUV
    on device; here the same BT.601 studio-swing math runs in numpy)."""
    from vexpress_tpu.pipelines.media import read_video_rgb
    from vexpress_tpu.utils.media_native import NativeVideoEncoder

    H = W = 64
    n = 20
    frames = []
    for i in range(n):  # smooth, codec-friendly content
        f = np.zeros((H, W, 3), np.float32)
        f[..., 0] = np.linspace(0, 1, W)[None, :]
        f[..., 1] = np.linspace(0, 1, H)[:, None]
        f[i * 2 : i * 2 + 12, 10:30, 2] = 1.0
        frames.append(f)
    rgb = np.stack(frames)

    x = rgb * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
    yq = np.clip(np.round(y), 16, 235).astype(np.uint8)
    uq = np.clip(np.round(u.reshape(n, H // 2, 2, W // 2, 2).mean((2, 4))), 16, 240).astype(np.uint8)
    vq = np.clip(np.round(v.reshape(n, H // 2, 2, W // 2, 2).mean((2, 4))), 16, 240).astype(np.uint8)

    path = str(tmp_path / "venc.mp4")
    with NativeVideoEncoder(path, W, H, 25.0) as enc:
        for i in range(n):
            enc.write(yq[i], uq[i], vq[i])

    back = read_video_rgb(path).astype(np.float32) / 255.0
    assert back.shape == rgb.shape
    mse = float(np.mean((back - rgb) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 28, psnr


@pytest.mark.skipif(not native_available(), reason="native media lib not built")
def test_save_video_yuv_with_audio(tmp_path):
    """save_video_yuv writes a playable mp4 with the audio muxed in."""
    from vexpress_tpu.pipelines.media import read_video_rgb, save_video_yuv

    H = W = 64
    n = 10
    yq = np.full((n, H, W), 128, np.uint8)
    uq = np.full((n, H // 2, W // 2), 128, np.uint8)
    vq = np.full((n, H // 2, W // 2), 128, np.uint8)

    wav = str(tmp_path / "a.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        t = np.arange(16000) / 16000.0
        w.writeframes((np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16).tobytes())

    out = str(tmp_path / "out.mp4")
    save_video_yuv(yq, uq, vq, wav, out, fps=25.0)
    back = read_video_rgb(out)
    assert back.shape[0] == n
    # audio stream landed
    from vexpress_tpu.utils.media_native import load_audio

    audio = load_audio(out, 16000)
    assert len(audio) > 1000
