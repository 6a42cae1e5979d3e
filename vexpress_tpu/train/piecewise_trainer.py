"""Full piecewise train step: the monolithic loss of train_step.py orchestrated
as per-stage programs so full-size training runs on hardware whose compiler
cannot build whole-model forward+backward graphs (see piecewise_grad.py).

Math mirrors train_step.build_train_step's loss exactly (verified by test):
conditional dropout, kps/reference dropout, noise offset, v-pred targets,
lip-mask weighting, Min-SNR — same RNG stream layout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.ddim import DDIMScheduler
from ..models.vae import AutoencoderKL
from ..pipelines.pipeline import LATENT_SCALE
from .piecewise_grad import PiecewiseUNetGrad
from .train_step import TrainConfig, TrainState, apply_updates_masked, mask_tree


def _any_trainable(mask_subtree) -> bool:
    return any(jax.tree_util.tree_leaves(mask_subtree))


class PiecewiseTrainer:
    def __init__(self, pipeline, cfg: TrainConfig, optimizer: optax.GradientTransformation,
                 mask=None, scheduler: Optional[DDIMScheduler] = None):
        self.m = pipeline
        self.cfg = cfg
        self.tx = optimizer
        self.mask = mask
        self.sched = scheduler or DDIMScheduler(
            prediction_type=cfg.prediction_type,
            rescale_betas_zero_snr=cfg.prediction_type == "v_prediction",
        )
        self.grad = PiecewiseUNetGrad(pipeline.m.unet_config, dtype=pipeline.m.dtype)
        self._jits: Dict[str, Any] = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    # -------------------------------------------------------------- programs

    def _prep(self, params, batch, rng):
        """Frozen VAE encodes + noise/targets + dropout draws: one program."""
        cfg = self.cfg
        sched = self.sched
        vae = self.m.vae

        def fn(p_vae, batch, rng):
            r_t, r_noise, r_uncond, r_kps, r_refdrop, r_vae1, r_vae2, r_off = jax.random.split(rng, 8)
            target = batch["target_images"]
            b, f = target.shape[0], target.shape[1]
            flat = target.reshape((b * f,) + target.shape[2:])
            latents = vae.apply(p_vae, flat, r_vae1, method=AutoencoderKL.encode_sample)
            latents = latents.reshape((b, f) + latents.shape[1:]) * LATENT_SCALE
            ref_latents = vae.apply(p_vae, batch["reference_image"], r_vae2,
                                    method=AutoencoderKL.encode_sample) * LATENT_SCALE

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

            uncond = (jax.random.uniform(r_uncond, ()) < cfg.uncond_ratio).astype(jnp.float32)
            kps_keep = (jax.random.uniform(r_kps, (b, 1, 1, 1, 1)) >= cfg.kps_drop_rate).astype(jnp.float32)
            ref_keep = (jax.random.uniform(r_refdrop, (b, 1, 1)) >= cfg.reference_drop_rate).astype(jnp.float32)

            snr = sched.snr(timesteps)
            if cfg.prediction_type == "v_prediction":
                snr = snr + 1.0
            snr_w = jnp.minimum(snr, cfg.snr_gamma) / snr if cfg.snr_gamma != 0 else jnp.ones_like(snr)
            return dict(noisy=noisy, target=target_pred, timesteps=timesteps,
                        ref_latents=ref_latents, uncond=uncond, kps_keep=kps_keep,
                        ref_keep=ref_keep, snr_w=snr_w)

        return self._jit("prep", fn)(params["vae"], batch, rng)

    # conditioning fwd + bwd (recompute-under-vjp) program pairs -------------

    def _cond_kps_fwd(self, p, kps_images, uncond, keep):
        def fn(p, kps_images, uncond, keep):
            feats = self.m.v_kps_guider.apply(p, kps_images)
            if self.cfg.kps_drop_rate > 0:
                feats = feats * keep.astype(feats.dtype)
            return feats * (1.0 - uncond).astype(feats.dtype)

        return self._jit("cond_kps_fwd", fn)(p, kps_images, uncond, keep), fn

    def _cond_audio_fwd(self, p, afe, uncond):
        def fn(p, afe, uncond):
            b, f = afe.shape[0], afe.shape[1]
            tok = self.m.audio_projection.apply(p, afe.reshape((-1,) + afe.shape[2:]))
            tok = tok.reshape((b, f) + tok.shape[1:])
            return tok * (1.0 - uncond).astype(tok.dtype)

        return self._jit("cond_audio_fwd", fn)(p, afe, uncond), fn

    def _bwd_of(self, name, fn, nargs_diff):
        """Backward program: recompute fn under vjp, return grads for the
        first `nargs_diff` args given the output cotangent."""
        key = f"bwd_{name}"
        if key not in self._jits:
            def bwd(args, cot):
                _, vjp_fn = jax.vjp(fn, *args)
                return vjp_fn(cot)[:nargs_diff]

            self._jits[key] = jax.jit(bwd)
        return self._jits[key]

    def _scale_refs_fwd(self, banks, uncond, ref_keep):
        def fn(banks, uncond, ref_keep):
            out = tuple(bk * (1.0 - uncond).astype(bk.dtype) for bk in banks)
            if self.cfg.reference_drop_rate > 0:
                out = tuple(bk * ref_keep.astype(bk.dtype) for bk in out)
            return out

        return self._jit("scale_refs_fwd", fn)(banks, uncond, ref_keep), fn

    # ------------------------------------------------------------- main step

    def loss_and_grads(self, params, batch, rng) -> Tuple[jax.Array, Dict]:
        cfg = self.cfg
        prep = self._prep(params, batch, rng)

        kps_feat, kps_fn = self._cond_kps_fwd(
            params["v_kps_guider"], batch["kps_images"], prep["uncond"], prep["kps_keep"]
        )
        tok, audio_fn = self._cond_audio_fwd(
            params["audio_projection"], batch["audio_frame_embeddings"], prep["uncond"]
        )

        # trainability per module (stage config): frozen modules get neither
        # a backward pass nor gradient buffers (their grads are None-pruned
        # trees matching mask_tree(params, mask))
        mask = self.mask or jax.tree_util.tree_map(lambda _: True, params)
        train_ref = _any_trainable(mask["reference_net"])
        train_kps = _any_trainable(mask["v_kps_guider"])
        train_audio = _any_trainable(mask["audio_projection"])

        banks, refnet_bwd = self.grad.refnet_forward_and_grad(
            params["reference_net"], prep["ref_latents"],
            param_mask=mask["reference_net"] if train_ref else None,
        )
        refs, refs_fn = self._scale_refs_fwd(banks, prep["uncond"], prep["ref_keep"])

        lip = batch.get("lip_masks")

        def loss_head(pred, loss_args):
            target, lip_masks, snr_w = loss_args
            loss = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
            if cfg.lip_loss_weight != 1.0 and lip_masks is not None:
                w = (cfg.lip_loss_weight - 1.0) * lip_masks[..., None] + 1.0
                loss = loss * w
            if cfg.snr_gamma != 0:
                loss = loss.mean(axis=tuple(range(1, loss.ndim))) * snr_w
            return loss.mean()

        loss, unet_grads, cots = self.grad.denoiser_value_and_grad(
            params["denoising_unet"], prep["noisy"], prep["timesteps"], tok, refs,
            kps_feat, loss_head, loss_args=(prep["target"], lip, prep["snr_w"]),
            param_mask=mask["denoising_unet"],
            want_ctx_cot=train_audio, want_refs_cot=train_ref, want_kps_cot=train_kps,
        )

        # chain cotangents upstream; fully frozen modules contribute
        # None-pruned grad trees (no buffers). Without a mask (testing the
        # raw math) keep the legacy zero-grads for the always-frozen encoders.
        def frozen_grads(name):
            if self.mask is None:
                return jax.tree_util.tree_map(jnp.zeros_like, params[name])
            return mask_tree(params[name], mask[name])

        grads: Dict[str, Any] = {
            "denoising_unet": unet_grads,
            "vae": frozen_grads("vae"),
            "wav2vec2": frozen_grads("wav2vec2"),
        }

        if train_kps:
            kps_bwd = self._bwd_of("cond_kps", kps_fn, 1)
            grads["v_kps_guider"] = kps_bwd(
                (params["v_kps_guider"], batch["kps_images"], prep["uncond"], prep["kps_keep"]),
                cots["kps"].astype(kps_feat.dtype),
            )[0]
        else:
            grads["v_kps_guider"] = mask_tree(params["v_kps_guider"], mask["v_kps_guider"])

        if train_audio:
            audio_bwd = self._bwd_of("cond_audio", audio_fn, 1)
            grads["audio_projection"] = audio_bwd(
                (params["audio_projection"], batch["audio_frame_embeddings"], prep["uncond"]),
                cots["ctx"].astype(tok.dtype),
            )[0]
        else:
            grads["audio_projection"] = mask_tree(params["audio_projection"],
                                                  mask["audio_projection"])

        if train_ref:
            refs_bwd = self._bwd_of("scale_refs", refs_fn, 1)
            cot_banks = refs_bwd(
                (banks, prep["uncond"], prep["ref_keep"]),
                tuple(c.astype(b_.dtype) for c, b_ in zip(cots["refs"], refs)),
            )[0]
            grads["reference_net"] = refnet_bwd(cot_banks)
        else:
            grads["reference_net"] = mask_tree(params["reference_net"], mask["reference_net"])

        return loss, grads

    def step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        loss, grads = self.loss_and_grads(state.params, batch, rng)
        if "update" not in self._jits:
            mask = self.mask

            def upd(params, opt_state, grads, step):
                if mask is not None:
                    updates, opt_state = self.tx.update(
                        grads, opt_state, mask_tree(params, mask))
                    params = apply_updates_masked(params, updates, mask)
                else:
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                return params, opt_state, step + 1

            self._jits["update"] = jax.jit(upd, donate_argnums=(0, 1))
        from ..utils.runtime import with_compile_retries

        params, opt_state, step_c = with_compile_retries(
            self._jits["update"], state.params, state.opt_state, grads, state.step,
            label="optimizer update")
        return TrainState(params, opt_state, step_c), {"loss": loss}
