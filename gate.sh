#!/usr/bin/env bash
# Snapshot gate — run before ANY end-of-round / milestone commit.
#
# Round 3 shipped a one-line NameError in the production save_memory path
# because the full suite (incl. test_pipeline_e2e.py) was never run before the
# snapshot. This script makes that impossible to repeat:
#   1. undefined-global-name lint (tools/lint_names.py — mini pyflakes)
#   2. FULL pytest suite, no exclusions (test_pipeline_e2e.py, test_train.py
#      included; ~17 min on CPU)
#   3. multichip dryrun (skippable with GATE_SKIP_MULTICHIP=1 when no
#      mesh-touching code changed this round)
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$PWD:/root/.axon_site"
# XLA:CPU compiles of the big sharded train-step programs can overflow the
# default 8 MB stack (r5: segfault inside backend_compile_and_load at the
# ~130th test of a single pytest process)
ulimit -s unlimited 2>/dev/null || true

echo "== gate 1/3: undefined-name lint =="
python tools/lint_names.py

echo "== gate 2/3: full test suite (two processes: the dp=8 train-step
  compiles run in a fresh process -- keeps any one XLA:CPU process small) =="
python -m pytest tests/ -q   --ignore tests/test_sharded_checkpoint.py   --ignore tests/test_train_convergence.py
python -m pytest tests/test_sharded_checkpoint.py tests/test_train_convergence.py -q

if [ "${GATE_SKIP_MULTICHIP:-0}" != "1" ]; then
  echo "== gate 3/3: multichip dryrun (8 virtual devices) =="
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"
else
  echo "== gate 3/3: SKIPPED (GATE_SKIP_MULTICHIP=1) =="
fi

echo "GATE GREEN"
