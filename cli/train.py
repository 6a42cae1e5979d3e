#!/usr/bin/env python
"""V-Express TPU training CLI: `python cli/train.py --config configs/stage_1.yaml`.

Mirrors the reference driver (/root/reference/train.py:218-731) on a JAX DP
mesh: batch sharded over "dp", params replicated, ZeRO-2-sharded optimizer
state, orbax full-state checkpoints + per-module torch-compatible exports.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_yaml(path):
    try:
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        raise SystemExit("pyyaml not available; provide a JSON config instead") from None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--max_steps_override", type=int, default=0)
    parser.add_argument("--dtype", type=str, default="",
                        help="compute dtype {fp32, bf16, fp16}; default: the "
                             "config's solver.mixed_precision / weight_dtype "
                             "(fp16 maps to bf16 on TPU), else fp32")
    parser.add_argument("--piecewise", type=str, default="auto", choices=["auto", "on", "off"],
                        help="block-granular backprop (needed on TPUs whose compiler cannot "
                             "build whole-model fwd+bwd programs); auto = on for tpu backend")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler device trace of steps 2-4 "
                             "(post-compile) into this directory")
    parser.add_argument("--device", type=str, default="auto", choices=["auto", "cpu", "tpu"],
                        help="compute platform; cpu forces the host backend (the "
                             "JAX_PLATFORMS env var alone is overridden by TPU plugins)")
    # multi-host launch (the accelerate --num_machines/--machine_rank/
    # --main_process_ip analog, reference train_stage.sh:23)
    parser.add_argument("--coordinator_address", type=str, default="",
                        help="host:port of process 0 for multi-host training")
    parser.add_argument("--num_processes", type=int, default=0)
    parser.add_argument("--process_id", type=int, default=-1)
    args = parser.parse_args()

    cfg = load_yaml(args.config)
    data, solver, mt = cfg["data"], cfg["solver"], cfg["module_training"]

    # config-parity hardening: a VERBATIM reference training_configs/*.yaml
    # must route correctly; unknown keys warn instead of vanishing
    from vexpress_tpu.train.config import (
        check_config_keys,
        effective_learning_rate,
        resolve_dtype,
        scheduler_kwargs,
        validate_config,
    )

    validate_config(cfg)
    for w in check_config_keys(cfg):
        print(f"[vexpress] WARNING: {w}", file=sys.stderr)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.device != "auto":
        jax.config.update("jax_platforms", args.device)

    if args.coordinator_address or args.num_processes > 0:
        from vexpress_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None,
        )
        print(f"[vexpress] distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices ({len(jax.local_devices())} local)")
    multiproc = jax.process_count() > 1
    is_main = jax.process_index() == 0
    if multiproc:
        # create the cross-host collective (gloo/ICI) contexts NOW, while the
        # processes are still in lockstep: context setup has a short rendezvous
        # timeout, and the first training collective otherwise happens minutes
        # into compile-skewed execution on a cold cache (observed gloo
        # GetKeyValue DEADLINE_EXCEEDED killing both workers)
        from jax.sharding import Mesh

        warm_mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        x = jax.make_array_from_process_local_data(
            NamedSharding(warm_mesh, P("dp")),
            np.ones((len(jax.local_devices()),), np.float32))
        total = float(jax.jit(
            jnp.sum, out_shardings=NamedSharding(warm_mesh, P()))(x))
        assert total == len(jax.devices()), total
        print(f"[vexpress] collective warmup OK ({jax.process_count()} processes)")

    from vexpress_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vexpress_tpu.io.checkpoints import (
        export_modules,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from vexpress_tpu.io.loaders import default_pipeline_models, load_pipeline
    from vexpress_tpu.parallel.mesh import create_mesh, shard_opt_state_zero2
    from vexpress_tpu.train.dataset import TalkingFaceVideoDataset
    from vexpress_tpu.train.train_step import (
        TrainConfig,
        TrainState,
        build_train_step,
        make_optimizer,
    )
    from vexpress_tpu.utils.observability import MetricsLogger, StepTimer

    dtype_name = resolve_dtype(cfg, args.dtype)
    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    if (args.dtype or cfg.get("solver", {}).get("mixed_precision")
            or cfg.get("weight_dtype")) in ("fp16",):
        print("[vexpress] fp16 requested -> using bf16 (TPU mixed-precision "
              "format; same exponent range as fp32, no loss scaler)")
    models = default_pipeline_models(dtype=dtype)

    # optional per-module size overrides (smoke tests, research variants)
    overrides = cfg.get("model_overrides") or {}
    if overrides:
        from vexpress_tpu.io.loaders import apply_model_overrides

        models = apply_model_overrides(models, overrides)

    if solver.get("denoising_unet_gradient_checkpointing", False):
        # reference train.py:448-451: per-block activation recompute
        import dataclasses as _dc

        models = _dc.replace(
            models, unet_config=_dc.replace(models.unet_config, gradient_checkpointing=True)
        )
    pipe = load_pipeline(
        models=models,
        base_model_path=cfg.get("base_model_path") or None,
        vae_path=cfg.get("vae_model_path") or None,
        audio_encoder_path=cfg.get("audio_encoder_path") or None,
        reference_net_path=cfg.get("reference_net_path") or None,
        denoising_unet_path=cfg.get("denoising_unet_path") or None,
        motion_module_path=cfg.get("motion_module_path") or None,
        v_kps_guider_path=cfg.get("v_kps_guider_path") or None,
        audio_projection_path=cfg.get("audio_projection_path") or None,
        denoising_unet_state_dict_type=cfg.get("denoising_unet_state_dict_type", "new_attn"),
    )

    tcfg = TrainConfig(
        train_stage=cfg["train_stage"],
        num_frames=data["num_frames"],
        train_denoising_unet=mt["denoising_unet"],
        train_reference_net=mt["reference_net"],
        train_v_kps_guider=mt["v_kps_guider"],
        train_audio_projection=mt["audio_projection"],
        train_motion_module=mt["motion_module"],
        # scale_lr (reference train.py:453-461): x grad_accum x train_bs x
        # data-parallel world size (accelerate num_processes == GPU count;
        # here: devices in the dp mesh)
        learning_rate=effective_learning_rate(cfg, max(len(jax.devices()), 1)),
        adam_beta1=float(solver["adam_beta1"]),
        adam_beta2=float(solver["adam_beta2"]),
        adam_weight_decay=float(solver["adam_weight_decay"]),
        adam_epsilon=float(solver["adam_epsilon"]),
        max_grad_norm=float(solver["max_grad_norm"]),
        gradient_accumulation_steps=int(solver.get("gradient_accumulation_steps", 1)),
        lr_scheduler=solver.get("lr_scheduler", "constant"),
        lr_warmup_steps=int(solver.get("lr_warmup_steps", 1)),
        max_train_steps=int(solver.get("max_train_steps", 40000)),
        reduce_optimizer_memory=bool(solver.get("use_8bit_adam", False)),
        prediction_type="v_prediction" if cfg.get("enable_zero_snr", True) else "epsilon",
        snr_gamma=float(cfg.get("snr_gamma", 5.0)),
        uncond_ratio=float(cfg.get("uncond_ratio", 0.1)),
        noise_offset=float(cfg.get("noise_offset", 0.05)),
        lip_loss_weight=float(data.get("lip_loss_weight", 1.0)),
        kps_drop_rate=float(data.get("kps_drop_rate", 0.0)),
        reference_drop_rate=float(data.get("reference_drop_rate", 0.0)),
    )

    # optional LoRA fine-tuning (beyond parity — train/lora.py): a `lora:`
    # config section replaces the module_training trainability with low-rank
    # adapters on the attention projections; base weights stay frozen
    lora_raw = cfg.get("lora") or {}
    lora_cfg = None
    if lora_raw:
        from vexpress_tpu.train.lora import DEFAULT_TARGETS, LoraConfig

        unknown = set(lora_raw) - {"rank", "alpha", "targets", "modules", "include"}
        if unknown:
            raise SystemExit(f"unknown lora config keys {sorted(unknown)}")
        rank = int(lora_raw.get("rank", 8))
        lora_cfg = LoraConfig(
            rank=rank,
            alpha=float(lora_raw.get("alpha", rank)),
            targets=tuple(lora_raw.get("targets", DEFAULT_TARGETS)),
            modules=tuple(lora_raw.get("modules", ("denoising_unet",))),
            include=str(lora_raw.get("include", "")),
        )

    # stage-start zero-init of the audio/motion output projections
    # (/root/reference/train.py:363-390; skipped for stage_2_resume and for
    # LoRA runs — adapters fine-tune the loaded weights as they are)
    from vexpress_tpu.train.train_step import stage_zero_init

    params = pipe.params if lora_cfg else stage_zero_init(pipe.params, cfg["train_stage"])
    pipe.params = params
    tx, mask = make_optimizer(params, tcfg)

    lora_tree = None
    if lora_cfg is not None:
        import optax

        from vexpress_tpu.train.lora import init_lora
        from vexpress_tpu.train.train_step import make_lr_schedule

        lora_tree = init_lora(params, lora_cfg, seed=int(cfg.get("seed", 0)))
        # the adapter state is tiny; plain AdamW with the config's solver
        # hyperparams (8-bit state would save nothing here)
        tx = optax.chain(
            optax.clip_by_global_norm(tcfg.max_grad_norm),
            optax.adamw(make_lr_schedule(tcfg), b1=tcfg.adam_beta1,
                        b2=tcfg.adam_beta2, eps=tcfg.adam_epsilon,
                        weight_decay=tcfg.adam_weight_decay))
        n_pairs = sum(
            1 for p, _ in jax.tree_util.tree_flatten_with_path(lora_tree)[0]
            if jax.tree_util.keystr(p).endswith("['lora_a']"))
        print(f"[vexpress] LoRA fine-tuning: {n_pairs} adapted projections, "
              f"rank {lora_cfg.rank}, alpha {lora_cfg.alpha}, modules "
              f"{list(lora_cfg.modules)} (module_training flags ignored; "
              f"base weights frozen)")

    use_piecewise = args.piecewise == "on" or (
        args.piecewise == "auto" and jax.default_backend() == "tpu"
    )
    # optimizer state exists only for TRAINABLE leaves (mask_tree prunes the
    # frozen ones) — at stage 2 full-tree state would waste GBs of HBM
    from vexpress_tpu.train.train_step import mask_tree

    params_trainable = lora_tree if lora_cfg is not None else mask_tree(params, mask)
    mesh = create_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None:
        n_dev = mesh.shape["dp"]
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("dp"))
        if multiproc:
            # multi-controller: host values must become GLOBAL jax.Arrays
            # (each process materializes only its addressable shards;
            # jax.device_put cannot target non-addressable devices)
            def to_global(tree, sharding):
                def conv(x):
                    x = np.asarray(x)
                    return jax.make_array_from_callback(
                        x.shape, sharding, lambda idx: x[idx])

                return jax.tree_util.tree_map(conv, tree)

            params = to_global(params, repl)
            pipe.params = params  # the LoRA base must be the global arrays
            if lora_cfg is not None:
                lora_tree = to_global(lora_tree, repl)
                params_trainable = lora_tree
            else:
                params_trainable = mask_tree(params, mask)
            # optimizer state born ZeRO-2-sharded straight out of the init
            # program (no host round-trip; works across processes)
            opt_shapes = jax.eval_shape(tx.init, params_trainable)
            opt_state = jax.jit(
                tx.init, out_shardings=shard_opt_state_zero2(opt_shapes, mesh)
            )(params_trainable)
            step0 = to_global(jnp.asarray(0, jnp.int32), repl)
        else:
            params = jax.device_put(params, repl)
            pipe.params = params
            if lora_cfg is not None:
                lora_tree = jax.device_put(lora_tree, repl)
                params_trainable = lora_tree
            else:
                params_trainable = mask_tree(params, mask)
            opt_state = tx.init(params_trainable)
            opt_state = jax.device_put(opt_state, shard_opt_state_zero2(opt_state, mesh))
            step0 = jnp.asarray(0, jnp.int32)
    else:
        n_dev = 1
        batch_sh = None
        opt_state = tx.init(params_trainable)
        step0 = jnp.asarray(0, jnp.int32)
    state = TrainState(lora_tree if lora_cfg is not None else params,
                       opt_state, step0)

    # surface what optimizer state ACTUALLY materialized (the reference ships
    # use_8bit_adam: True in every stage config, training_configs/*.yaml:42 —
    # a config-parity bug here would silently train with 4x the state memory)
    if lora_cfg is None and tcfg.reduce_optimizer_memory in (True, "8bit"):
        from vexpress_tpu.train.adam8bit import Adam8bitState

        if not any(isinstance(l, Adam8bitState) for l in jax.tree_util.tree_leaves(
                opt_state, is_leaf=lambda x: isinstance(x, Adam8bitState))):
            raise SystemExit("use_8bit_adam is set but the 8-bit Adam state "
                             "did not materialize")
        int8_leaves = sum(
            1 for l in jax.tree_util.tree_leaves(opt_state)
            if getattr(l, "dtype", None) == jnp.int8
        )
        # leaves under adam8bit's 4096-element threshold stay fp32 (bnb parity)
        print(f"[vexpress] optimizer: blockwise int8 Adam "
              f"({int8_leaves} int8 state tensors)")
    else:
        print("[vexpress] optimizer: fp32 AdamW")

    # noise_scheduler_kwargs from the config (reference stage yamls carry the
    # full DDIM table spec; defaults already match, but a config that changes
    # e.g. beta_end must be honored)
    from vexpress_tpu.diffusion.ddim import DDIMScheduler

    train_sched = DDIMScheduler(
        **scheduler_kwargs(cfg, cfg.get("enable_zero_snr", True)))

    if lora_cfg is not None:
        if use_piecewise:
            from vexpress_tpu.train.lora import LoraPiecewiseTrainer

            trainer = LoraPiecewiseTrainer(pipe, tcfg, tx, lora_cfg,
                                           lora=state.params, scheduler=train_sched)
            print("[vexpress] piecewise LoRA training mode")
        else:
            from vexpress_tpu.train.lora import build_lora_train_step

            step_fn, _ = build_lora_train_step(pipe, tcfg, tx, lora_cfg,
                                               scheduler=train_sched)
    elif use_piecewise:
        from vexpress_tpu.train.piecewise_trainer import PiecewiseTrainer

        # DP over the mesh composes with the per-block programs through GSPMD
        # sharding propagation: batch arrays carry P("dp"), params replicated,
        # so every per-stage forward/vjp program runs SPMD and parameter
        # gradients are all-reduced inside the programs.
        trainer = PiecewiseTrainer(pipe, tcfg, tx, mask=mask, scheduler=train_sched)
        print("[vexpress] piecewise (block-granular backprop) training mode")
    else:
        step_fn, _ = build_train_step(pipe, tcfg, tx, mask=mask, scheduler=train_sched)

    out_dir = cfg.get("output_dir", "./exp_output")
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    resume = cfg.get("resume_from_checkpoint", "")
    if resume == "latest":
        resume = latest_checkpoint(ckpt_dir) or ""
    if resume:
        state = restore_train_state(resume, state)
        print(f"[vexpress] resumed from {resume} at step {int(state.step)}")

    dataset = TalkingFaceVideoDataset(
        meta_paths=data["meta_paths"],
        image_size=(data["train_height"], data["train_width"]),
        flip_rate=data["flip_rate"],
        sample_rate=data["sample_rate"],
        num_frames=data["num_frames"],
        reference_margin=data["reference_margin"],
        num_padding_audio_frames=data["num_padding_audio_frames"],
        seed=cfg.get("seed", 0),
    )
    # train_bs is PER-PROCESS (the reference's accelerate per-process
    # DataLoader batch, train.py:494-504); the global batch spans all hosts
    batch_size = data["train_bs"]
    n_local = len(jax.local_devices())
    if batch_size % n_local != 0:
        raise SystemExit(f"train_bs {batch_size} must be divisible by the "
                         f"local device count {n_local}")
    batches = dataset.batches(batch_size)
    if multiproc:
        print(f"[vexpress] dataset shard {jax.process_index()}/{jax.process_count()}, "
              f"global batch {batch_size * jax.process_count()}")

    jit_step = trainer.step if use_piecewise else jax.jit(step_fn, donate_argnums=0)
    max_steps = args.max_steps_override or int(solver["max_train_steps"])
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    ckpt_every = int(cfg.get("checkpointing_steps", 5000))
    # short (smoke) runs log every step — at log_every=10 a 3-step run would
    # exit silently after minutes of remote compiles
    log_every = 10 if max_steps - int(state.step) > 20 else 1

    mesh_desc = dict(mesh.shape) if mesh is not None else {"dp": 1}
    print(f"[vexpress] training {cfg['train_stage']} on mesh {mesh_desc}: "
          f"bs={batch_size}, frames={data['num_frames']}, max_steps={max_steps}")
    # JSONL + MLflow FileStore export (reference logs train_loss to MLflow,
    # train.py:657; browse with `mlflow ui --backend-store-uri <out>/mlruns`)
    mlog = MetricsLogger(out_dir, mlflow_dir=os.path.join(out_dir, "mlruns"),
                         run_name=cfg.get("train_stage", "train"))
    mlog.log_param("config", os.path.abspath(args.config))
    timer = StepTimer()
    t0 = time.time()
    losses = []
    profiling = False
    start_step = int(state.step)
    for step_i in range(start_step, max_steps):
        if args.profile_dir and step_i == start_step + 1 and not profiling:
            import jax.profiler

            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        batch = next(batches)
        if batch_sh is not None:
            if multiproc:
                # each process contributes its host-local batch as its shard
                # of the global batch axis
                batch = {k: jax.make_array_from_process_local_data(batch_sh, v)
                         for k, v in batch.items()}
            else:
                batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}
        timer.data_done()
        key, sub = jax.random.split(key)
        if multiproc:
            # host numpy keys auto-replicate across processes (same seed on
            # every host); a process-local jax.Array would be rejected by jit
            sub = np.asarray(sub)
        state, metrics = jit_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
        timer.step_done()
        if profiling and step_i >= start_step + 3:
            import jax.profiler

            jax.profiler.stop_trace()
            profiling = False
            print(f"[vexpress] device trace (steps {start_step + 2}-{start_step + 4}) "
                  f"written to {args.profile_dir}")
        if (step_i + 1) % log_every == 0:
            dt_ = time.time() - t0
            if is_main:  # the accelerate main-process-only logging convention
                mlog.log(step_i + 1, {"train_loss": float(np.mean(losses)),
                                      "it_per_s": log_every / dt_, **timer.report()})
                print(f"[vexpress] step {step_i + 1}/{max_steps} loss {np.mean(losses):.4f} "
                      f"({log_every / dt_:.2f} it/s)", flush=True)
            losses, t0 = [], time.time()
        if (step_i + 1) % ckpt_every == 0 or step_i + 1 == max_steps:
            # orbax is multihost-aware: EVERY process calls save (each writes
            # its addressable shards); torch exports need host-local values —
            # the all-gather is COLLECTIVE (all processes run it), only the
            # main process writes the files
            path = save_train_state(ckpt_dir, step_i + 1, state)
            export_params = state.params
            if multiproc:
                from jax.experimental import multihost_utils

                export_params = jax.tree_util.tree_map(
                    lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True))
                    if isinstance(x, jax.Array) and not x.is_fully_addressable else x,
                    state.params,
                )
            if is_main and lora_cfg is not None:
                # LoRA runs export the adapter only (peft layout; merge at
                # load time with --lora_path on cli/infer.py)
                from vexpress_tpu.io.torch_export import save_torch_checkpoint
                from vexpress_tpu.train.lora import lora_to_torch_state_dict

                save_torch_checkpoint(
                    lora_to_torch_state_dict(export_params, lora_cfg),
                    os.path.join(out_dir, f"lora-{step_i + 1}.pth"))
            elif is_main:
                # save_all=False (reference train.py:677-725): export only the
                # modules this stage trains; motion_module rides with the
                # denoising unet either way
                if cfg.get("save_all", True):
                    export_modules(export_params, out_dir, step_i + 1)
                else:
                    # the unet rides along whenever any of its resident
                    # submodules train (reference train.py:677-682: elif
                    # motion_module OR audio_projection -> save denoising_unet)
                    trained = {"denoising_unet": mt["denoising_unet"] or mt["motion_module"]
                               or mt["audio_projection"],
                               "reference_net": mt["reference_net"],
                               "v_kps_guider": mt["v_kps_guider"],
                               "audio_projection": mt["audio_projection"]}
                    export_modules({k: v for k, v in export_params.items()
                                    if trained.get(k, False)}, out_dir, step_i + 1)
            if is_main:
                print(f"[vexpress] checkpoint saved: {path}")

    mlog.close()  # finalizes the MLflow run (status FINISHED + end_time)


if __name__ == "__main__":
    main()
