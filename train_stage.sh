#!/usr/bin/env bash
# Launch a training stage (reference: train_stage.sh). On TPU pods, processes
# are started per host by the TPU runtime; jax.distributed handles the rest —
# no accelerate/DeepSpeed launcher needed.
set -e

STAGE=${1:-stage_1}
shift || true

python cli/train.py --config "configs/${STAGE}.yaml" "$@"
