#!/usr/bin/env python
"""Training-convergence demo with a committed loss-curve artifact (VERDICT r4
#4): overfit one fixed batch through the production PiecewiseTrainer for
stages 2 and 3 (fixed rng => deterministic objective), N steps on CPU, and
write (a) `artifacts/convergence_curves.json` (the committed artifact) and
(b) an MLflow file store under `artifacts/mlruns_convergence/` readable by
`mlflow ui --backend-store-uri ...`.

Run: PYTHONPATH=/root/repo python tools/train_convergence_demo.py [--steps N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run_stage(stage, steps, lr):
    import jax.numpy as jnp

    from tests.test_train import _tiny_batch
    from tests.utils import make_tiny_pipeline
    from vexpress_tpu.train.piecewise_trainer import PiecewiseTrainer
    from vexpress_tpu.train.train_step import (TrainConfig, TrainState,
                                               make_optimizer, mask_tree,
                                               stage_zero_init)

    pipe = make_tiny_pipeline()
    cfg = TrainConfig.stage(stage, learning_rate=lr, num_frames=2,
                            uncond_ratio=0.0)
    params = stage_zero_init(pipe.params, stage)
    pipe.params = params
    tx, mask = make_optimizer(params, cfg)
    trainer = PiecewiseTrainer(pipe, cfg, tx, mask=mask)
    state = TrainState(params, tx.init(mask_tree(params, mask)),
                       jnp.zeros((), jnp.int32))
    batch = _tiny_batch(np.random.default_rng(0), b=2, f=2)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(steps):
        state, metrics = trainer.step(state, batch, rng)
        losses.append(float(metrics["loss"]))
        if i % 20 == 0:
            print(f"[{stage}] step {i}: loss {losses[-1]:.5f}", flush=True)
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", type=str, default="artifacts")
    args = ap.parse_args()

    from vexpress_tpu.utils.observability import MetricsLogger

    os.makedirs(args.out, exist_ok=True)
    curves = {}
    for stage in ("stage_2", "stage_3"):
        logger = MetricsLogger(
            args.out, filename=f"convergence_{stage}.jsonl",
            mlflow_dir=os.path.join(args.out, "mlruns_convergence"),
            run_name=f"overfit_{stage}")
        logger.log_param("stage", stage)
        logger.log_param("steps", args.steps)
        logger.log_param("learning_rate", args.lr)
        losses = run_stage(stage, args.steps, args.lr)
        for i, v in enumerate(losses):
            logger.log(i, {"train_loss": v})
        logger.close()
        curves[stage] = {
            "losses": [round(v, 6) for v in losses],
            "initial_mean3": round(float(np.mean(losses[:3])), 6),
            "final_mean5": round(float(np.mean(losses[-5:])), 6),
            "collapse_ratio": round(
                float(np.mean(losses[-5:]) / np.mean(losses[:3])), 4),
        }
        print(f"[{stage}] {curves[stage]['initial_mean3']} -> "
              f"{curves[stage]['final_mean5']} "
              f"(x{curves[stage]['collapse_ratio']})", flush=True)
    path = os.path.join(args.out, "convergence_curves.json")
    with open(path, "w") as f:
        json.dump({"steps": args.steps, "lr": args.lr,
                   "recipe": "overfit one fixed batch, PiecewiseTrainer, "
                             "fixed rng (deterministic objective), tiny config",
                   "curves": curves}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
