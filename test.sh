#!/usr/bin/env bash
# End-to-end inference smoke run (reference: test.sh) on the bundled AOC
# fixture. Checkpoints under model_ckpts/ are optional — without them the run
# exercises the full path with random weights.
set -e

SAMPLE=${SAMPLE:-/root/reference/test_samples/short_case/AOC}
STAGE=${STAGE:-stage_3}
STEPS=${STEPS:-25}

python cli/infer.py \
  --reference_image_path "$SAMPLE/ref.jpg" \
  --audio_path "$SAMPLE/aud.mp3" \
  --kps_path "$SAMPLE/kps.pth" \
  --retarget_strategy fix_face \
  --test_stage "$STAGE" \
  --num_inference_steps "$STEPS" \
  --guidance_scale 2.5 \
  --reference_attention_weight 0.95 \
  --audio_attention_weight 3.0 \
  --output_path "output/smoke_${STAGE}.mp4" \
  "$@"
