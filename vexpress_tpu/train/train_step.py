"""Training: the three-stage progressive conditional-dropout recipe.

Reference: train.py — Net.forward (:44-119), stage trainability wiring
(:363-419), loss construction (:625-638: MSE x lip-mask weight x Min-SNR),
conditional dropout (:622 uncond_ratio; kps_drop_rate :77-82;
reference_drop_rate mutual_self_attention.py:210-213), noise offset (:580-584),
v-prediction targets (:606-614).

TPU mapping: one pure `train_step` jitted over a DP mesh — batch sharded on
"dp", params replicated, optimizer state ZeRO-2-sharded
(parallel.mesh.shard_opt_state_zero2). Gradient accumulation via
optax.MultiSteps; gradient checkpointing via jax.checkpoint on the loss fn.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.ddim import DDIMScheduler
from ..pipelines.pipeline import LATENT_SCALE


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors training_configs/stage_{1,2,3}.yaml solver/data sections."""

    train_stage: str = "stage_1"
    num_frames: int = 1
    # module_training flags
    train_denoising_unet: bool = True
    train_reference_net: bool = True
    train_v_kps_guider: bool = True
    train_audio_projection: bool = False
    train_motion_module: bool = False
    # solver
    learning_rate: float = 1e-6
    lr_scheduler: str = "constant"  # {constant, linear, cosine}
    lr_warmup_steps: int = 1
    max_train_steps: int = 40000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    # memory-reduced optimizer state (the reference's bitsandbytes 8-bit Adam,
    # train.py:464-472). False/"off": fp32 momenta; True/"8bit": blockwise
    # int8 momenta (train/adam8bit.py, bnb AdamW8bit analog, ~9x smaller);
    # "bf16": bfloat16 first moment only (lighter-touch option).
    reduce_optimizer_memory: Any = False
    # objective
    prediction_type: str = "v_prediction"  # enable_zero_snr -> v_prediction
    snr_gamma: float = 5.0
    uncond_ratio: float = 0.1
    noise_offset: float = 0.05
    lip_loss_weight: float = 1.0
    kps_drop_rate: float = 0.0
    reference_drop_rate: float = 0.0

    @staticmethod
    def stage(name: str, **overrides) -> "TrainConfig":
        presets = {
            "stage_1": dict(train_stage="stage_1", num_frames=1,
                            train_denoising_unet=True, train_reference_net=True,
                            train_v_kps_guider=True, train_audio_projection=False,
                            train_motion_module=False),
            "stage_2": dict(train_stage="stage_2", num_frames=20,
                            train_denoising_unet=False, train_reference_net=False,
                            train_v_kps_guider=False, train_audio_projection=True,
                            train_motion_module=True),
            # stage_2 restarted from a mid-stage checkpoint: identical
            # trainability, but stage_zero_init is skipped (train.py:380-381)
            "stage_2_resume": dict(train_stage="stage_2_resume", num_frames=20,
                                   train_denoising_unet=False, train_reference_net=False,
                                   train_v_kps_guider=False, train_audio_projection=True,
                                   train_motion_module=True),
            "stage_3": dict(train_stage="stage_3", num_frames=8,
                            train_denoising_unet=True, train_reference_net=True,
                            train_v_kps_guider=True, train_audio_projection=True,
                            train_motion_module=True),
        }
        return TrainConfig(**{**presets[name], **overrides})


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def stage_zero_init(params: Dict[str, Any], train_stage: str) -> Dict[str, Any]:
    """Stage-start zero-init of the denoising UNet's audio-attention output
    (`attn2.to_out`) and motion-module output (`temporal_transformer.proj_out`)
    projections (/root/reference/train.py:363-390). Applied at stages 1/2/3 so
    training from SD-lineage checkpoints starts with the audio and motion
    branches as exact no-ops; `stage_2_resume` skips it (train.py:380-381)
    because those weights come from the mid-stage checkpoint being resumed.

    Returns a new params dict; only the "denoising_unet" subtree is touched.
    """
    if train_stage == "stage_2_resume":
        return params
    if train_stage not in ("stage_1", "stage_2", "stage_3"):
        raise NotImplementedError(f"{train_stage} not implemented")

    def zero(path, leaf):
        parts = tuple(getattr(p, "key", str(p)) for p in path)
        for i in range(1, len(parts)):
            # torch 'attn2.to_out.0' <-> flax attn2/to_out_0;
            # torch 'temporal_transformer.proj_out' <-> flax same adjacency
            if parts[i] == "to_out_0" and parts[i - 1] == "attn2":
                return jnp.zeros_like(leaf)
            if parts[i] == "proj_out" and parts[i - 1] == "temporal_transformer":
                return jnp.zeros_like(leaf)
        return leaf

    out = dict(params)
    out["denoising_unet"] = jax.tree_util.tree_map_with_path(zero, params["denoising_unet"])
    return out


def trainable_mask(params: Dict[str, Any], cfg: TrainConfig) -> Dict[str, Any]:
    """True where a parameter trains in this stage (train.py:400-419):

    * reference_net: cfg flag, but up_blocks_3 always frozen (:404-406)
    * denoising_unet: cfg flag; motion_modules overridden by motion flag;
      attn2/norm2 inside attentions overridden by audio_projection flag (:412-419)
    * v_kps_guider / audio_projection: cfg flags; vae & wav2vec2 frozen (:401-402)
    """

    def decide(path_parts, module: str) -> bool:
        p = "/".join(path_parts)
        if module == "vae" or module == "wav2vec2":
            return False
        if module == "reference_net":
            if "up_blocks_3" in path_parts:
                return False
            return cfg.train_reference_net
        if module == "v_kps_guider":
            return cfg.train_v_kps_guider
        if module == "audio_projection":
            return cfg.train_audio_projection
        if module == "denoising_unet":
            if "motion_modules" in p or any(x.startswith("motion_modules") for x in path_parts):
                return cfg.train_motion_module
            if ("attentions" in p) and any(x in ("attn2", "norm2") for x in path_parts):
                return cfg.train_audio_projection
            return cfg.train_denoising_unet
        return False

    masks = {}
    for module, tree in params.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        mask_flat = {}
        for path, leaf in flat:
            parts = tuple(getattr(p, "key", str(p)) for p in path)
            mask_flat[path] = decide(parts, module)
        masks[module] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), [mask_flat[p] for p, _ in flat]
        )
    return masks


def make_lr_schedule(cfg: TrainConfig):
    """HF get_scheduler equivalents used by the reference (train.py:484-489)."""
    warmup = max(cfg.lr_warmup_steps, 0)
    total = max(cfg.max_train_steps, warmup + 1)
    if cfg.lr_scheduler == "constant":
        if warmup <= 1:
            return cfg.learning_rate
        return optax.linear_schedule(0.0, cfg.learning_rate, warmup)
    if cfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.linear_schedule(cfg.learning_rate, 0.0, total - warmup),
            ],
            [warmup],
        )
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(0.0, cfg.learning_rate, warmup, total)
    raise ValueError(f"unsupported lr_scheduler {cfg.lr_scheduler}")


def make_optimizer(params, cfg: TrainConfig) -> Tuple[optax.GradientTransformation, Any]:
    """AdamW on trainable params only, global-norm clipping, optional
    gradient accumulation (train.py:464-489 + accelerate grad-accum)."""
    mask = trainable_mask(params, cfg)
    reduce = cfg.reduce_optimizer_memory
    if reduce is True or reduce == "8bit":
        from .adam8bit import adam8bit

        inner = adam8bit(
            make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    else:
        inner = optax.adamw(
            make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
            mu_dtype=jnp.bfloat16 if reduce == "bf16" else None,
        )
    # The transformation operates on TRAINABLE-ONLY trees (frozen leaves
    # replaced by None via mask_tree): frozen parameters get no gradient
    # buffers and no optimizer state AT ALL — at stage 2 that's ~3.5 GB of
    # HBM that a full-tree optax.masked would still materialize as zeros.
    # Init with tx.init(mask_tree(params, mask)); apply with
    # apply_updates_masked(params, updates, mask).
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        inner,
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, mask


def mask_tree(tree, mask):
    """Replace frozen leaves (mask False) with None — they vanish from the
    pytree, so downstream grads/optimizer state never allocate them."""
    return jax.tree_util.tree_map(lambda x, m_: x if m_ else None, tree, mask)


def apply_updates_masked(params, updates, mask):
    """optax.apply_updates for a full params tree and trainable-only updates
    (the mask_tree of the grads). Frozen leaves pass through untouched."""
    it = iter(jax.tree_util.tree_leaves(updates))

    def upd(p, m_):
        if not m_:
            return p
        u = next(it)
        return jnp.asarray(p + u.astype(jnp.asarray(p).dtype))

    # tree_map visits leaves in flatten order, which matches the order of the
    # surviving leaves in the reduced updates tree
    return jax.tree_util.tree_map(upd, params, mask)


def build_train_step(
    pipeline,  # VExpressPipeline (models + apply fns)
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    scheduler: Optional[DDIMScheduler] = None,
    mask: Optional[Dict[str, Any]] = None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch dict (from datasets.talking_face_video equivalents):
      target_images: (B, F, H, W, 3) in [-1, 1]
      reference_image: (B, H, W, 3) in [-1, 1]
      kps_images: (B, F, H, W, 3) in [0, 1]
      audio_frame_embeddings: (B, F, 10, 768) precomputed wav2vec2 windows
      lip_masks: (B, F, h, w) in [0, 1] at latent resolution
    """
    sched = scheduler or DDIMScheduler(
        prediction_type=cfg.prediction_type,
        rescale_betas_zero_snr=cfg.prediction_type == "v_prediction",
    )
    m = pipeline
    cross_dim = m.m.unet_config.cross_attention_dim

    def loss_fn(params, batch, rng):
        if mask is not None:
            # frozen params contribute no gradients (saves the backward pass
            # through them; equivalent to requires_grad_(False))
            params = jax.tree_util.tree_map(
                lambda p, m_: p if m_ else jax.lax.stop_gradient(p), params, mask
            )
        r_t, r_noise, r_uncond, r_kps, r_refdrop, r_vae1, r_vae2, r_off = jax.random.split(rng, 8)
        target = batch["target_images"]
        b, f = target.shape[0], target.shape[1]

        # frozen VAE encodes (train.py:571-577, 595-598) — sampled posterior
        flat = target.reshape((b * f,) + target.shape[2:])
        latents = m.vae.apply(params["vae"], flat, r_vae1, method=type(m.vae).encode_sample)
        latents = latents.reshape((b, f) + latents.shape[1:]) * LATENT_SCALE
        latents = jax.lax.stop_gradient(latents)

        ref_latents = m.vae.apply(
            params["vae"], batch["reference_image"], r_vae2, method=type(m.vae).encode_sample
        ) * LATENT_SCALE
        ref_latents = jax.lax.stop_gradient(ref_latents)

        # noise + offset (train.py:579-584)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if cfg.noise_offset > 0:
            noise = noise + cfg.noise_offset * jax.random.normal(
                r_off, (b, 1, 1, 1, latents.shape[-1]), jnp.float32
            )
        timesteps = jax.random.randint(r_t, (b,), 0, sched.config.num_train_timesteps)

        noisy = sched.add_noise(latents, noise, timesteps[:, None])
        if cfg.prediction_type == "epsilon":
            target_pred = noise
        else:
            target_pred = sched.get_velocity(latents, noise, timesteps[:, None])

        # conditional dropout: whole-batch unconditional forward (train.py:622)
        do_uncond = jax.random.uniform(r_uncond, ()) < cfg.uncond_ratio
        uncond = do_uncond.astype(jnp.float32)

        # kps conditioning (+ per-sample dropout, train.py:77-82)
        kps_feat = m.v_kps_guider.apply(params["v_kps_guider"], batch["kps_images"])
        if cfg.kps_drop_rate > 0:
            keep = (jax.random.uniform(r_kps, (b, 1, 1, 1, 1)) >= cfg.kps_drop_rate).astype(kps_feat.dtype)
            kps_feat = kps_feat * keep
        kps_feat = kps_feat * (1.0 - uncond)

        # audio tokens (train.py:84-90)
        afe = batch["audio_frame_embeddings"]
        tok = m.audio_projection.apply(params["audio_projection"], afe.reshape((-1,) + afe.shape[2:]))
        tok = tok.reshape((b, f) + tok.shape[1:]) * (1.0 - uncond)

        # reference features at t=0 (train.py:92-110); uncond zeroes the banks
        ctx0 = jnp.zeros((b, 1, cross_dim), latents.dtype)
        _, ref_feats = m.reference_net.apply(
            params["reference_net"], ref_latents, jnp.zeros((b,), jnp.int32), ctx0
        )
        ref_feats = tuple(r * (1.0 - uncond) for r in ref_feats)
        if cfg.reference_drop_rate > 0:
            keep = (jax.random.uniform(r_refdrop, (b, 1, 1)) >= cfg.reference_drop_rate).astype(
                ref_feats[0].dtype
            )
            ref_feats = tuple(r * keep for r in ref_feats)

        pred = m.denoising_unet.apply(
            params["denoising_unet"], noisy, timesteps, tok, ref_feats, kps_feat, 1.0, 1.0
        )

        # loss (train.py:625-638)
        loss = (pred.astype(jnp.float32) - target_pred.astype(jnp.float32)) ** 2
        if cfg.lip_loss_weight != 1.0 and "lip_masks" in batch:
            w = (cfg.lip_loss_weight - 1.0) * batch["lip_masks"][..., None] + 1.0
            loss = loss * w
        if cfg.snr_gamma != 0:
            snr = sched.snr(timesteps)
            if cfg.prediction_type == "v_prediction":
                snr = snr + 1.0
            weights = jnp.minimum(snr, cfg.snr_gamma) / snr
            loss = loss.mean(axis=tuple(range(1, loss.ndim))) * weights
        return loss.mean()

    tx = optimizer

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        if mask is not None:
            # trainable-only update: opt_state was built over
            # mask_tree(params, mask); frozen grads are dead code XLA removes
            g = mask_tree(grads, mask)
            updates, opt_state = tx.update(g, state.opt_state, mask_tree(state.params, mask))
            params = apply_updates_masked(state.params, updates, mask)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return train_step, loss_fn


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
