#!/usr/bin/env python
"""Dataset preparation tools (reference: scripts/prepare_dataset/* and
scripts/extract_kps_sequence_and_audio.py).

Subcommands:
  audio-embeddings  — wav2vec2 feature dump per video/audio file
                      ({'global_embeds': (T, 1, 768)}; extract_audio_embeddings.py:40-43)
  face-info         — insightface face detection dump (kps/bbox/106 landmarks)
                      per frame (extract_face_info.py; needs insightface+onnxruntime)
  kps-sequence      — per-frame 3-point kps + extracted audio track
                      (extract_kps_sequence_and_audio.py)
  golden-check      — numeric diff of re-extracted features vs committed
                      goldens (test_read.py semantics)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cmd_audio_embeddings(args):
    import jax.numpy as jnp
    import torch

    from vexpress_tpu.io.loaders import _merge  # noqa: SLF001
    from vexpress_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model, convert_wav2vec2_state_dict
    from vexpress_tpu.io.torch_import import load_torch_checkpoint
    from vexpress_tpu.utils.media_native import load_audio

    model = Wav2Vec2Model(Wav2Vec2Config())
    import jax

    wav = load_audio(args.input, 16000)
    if args.weights:
        sd = load_torch_checkpoint(args.weights)
        sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
        params = {"params": convert_wav2vec2_state_dict(sd)}
    else:
        print("WARNING: no --weights given; using random init (features are meaningless)")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))

    emb = model.apply(params, jnp.asarray(wav)[None])[0]  # (T, 768)
    out = {"global_embeds": torch.from_numpy(np.asarray(emb, dtype=np.float32))[:, None, :]}
    torch.save(out, args.output)
    print(f"saved {tuple(out['global_embeds'].shape)} embeddings to {args.output}")


def _insightface(root, det_size):
    try:
        from insightface.app import FaceAnalysis
    except ImportError:
        raise SystemExit(
            "insightface/onnxruntime are not installed in this image; face "
            "detection is offline preprocessing — run it in an environment with "
            "insightface (reference: scripts/extract_face_info.py)"
        ) from None
    app = FaceAnalysis(providers=["CPUExecutionProvider"], root=root)
    app.prepare(ctx_id=0, det_size=det_size)
    return app


def cmd_face_info(args):
    import cv2
    import torch

    from vexpress_tpu.pipelines.media import read_video_rgb

    app = _insightface(args.insightface_model_path, (args.det_height, args.det_width))
    frames = read_video_rgb(args.input)
    all_info = []
    for i, frame in enumerate(frames):
        faces = app.get(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        all_info.append([
            {"bbox": f.bbox, "kps": f.kps, "det_score": f.det_score,
             "landmark_2d_106": f.landmark_2d_106}
            for f in faces
        ])
    torch.save(all_info, args.output)
    print(f"saved face info for {len(all_info)} frames to {args.output}")


def cmd_kps_sequence(args):
    import cv2
    import torch

    from vexpress_tpu.pipelines.media import read_video_rgb
    from vexpress_tpu.utils.media_native import load_audio

    app = _insightface(args.insightface_model_path, (512, 512))
    frames = read_video_rgb(args.input)
    kps_sequence = []
    for i, frame in enumerate(frames):
        img = cv2.resize(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR), (512, 512))
        faces = app.get(img)
        assert len(faces) == 1, f"frame {i}: expected exactly one face, got {len(faces)}"
        kps_sequence.append(torch.tensor(np.asarray(faces[0].kps[:3])))
    torch.save(kps_sequence, args.kps_output)
    print(f"saved kps sequence ({len(kps_sequence)} frames) to {args.kps_output}")

    if args.audio_output:
        wav = load_audio(args.input, 16000)
        import wave

        with wave.open(args.audio_output, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())
        print(f"saved extracted audio to {args.audio_output}")


def cmd_golden_check(args):
    import torch

    a = torch.load(args.extracted, map_location="cpu", weights_only=False)
    b = torch.load(args.golden, map_location="cpu", weights_only=False)
    if isinstance(a, dict) and "global_embeds" in a:
        a, b = a["global_embeds"], b["global_embeds"]
        diff = (a - b).abs()
        print(f"audio embeds: shape {tuple(a.shape)} vs {tuple(b.shape)}; "
              f"mean |diff| {diff.mean():.6f} max {diff.max():.6f}")
        ok = diff.mean() < args.tol
    else:
        kps_a = np.stack([np.asarray(f[0]["kps"]) for f in a])
        kps_b = np.stack([np.asarray(f[0]["kps"]) for f in b])
        diff = np.abs(kps_a - kps_b)
        print(f"face kps: mean |diff| {diff.mean():.4f}px max {diff.max():.4f}px")
        ok = diff.mean() < args.tol
    print("GOLDEN CHECK:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("audio-embeddings")
    a.add_argument("--input", required=True, help="audio or video file")
    a.add_argument("--output", required=True, help="output .pt path")
    a.add_argument("--weights", default="", help="wav2vec2 torch weights (.bin/.safetensors)")
    a.set_defaults(fn=cmd_audio_embeddings)

    f = sub.add_parser("face-info")
    f.add_argument("--input", required=True)
    f.add_argument("--output", required=True)
    f.add_argument("--insightface_model_path", default="./model_ckpts/insightface_models/")
    f.add_argument("--det_height", type=int, default=512)
    f.add_argument("--det_width", type=int, default=512)
    f.set_defaults(fn=cmd_face_info)

    k = sub.add_parser("kps-sequence")
    k.add_argument("--input", required=True, help="video file")
    k.add_argument("--kps_output", required=True)
    k.add_argument("--audio_output", default="")
    k.add_argument("--insightface_model_path", default="./model_ckpts/insightface_models/")
    k.set_defaults(fn=cmd_kps_sequence)

    g = sub.add_parser("golden-check")
    g.add_argument("--extracted", required=True)
    g.add_argument("--golden", required=True)
    g.add_argument("--tol", type=float, default=1e-2)
    g.set_defaults(fn=cmd_golden_check)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
