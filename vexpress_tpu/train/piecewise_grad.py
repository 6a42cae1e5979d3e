"""Piecewise training: block-granular backprop for full-size models.

The axon remote-compile service cannot build a monolithic SD-scale
forward+backward program, so the train step is orchestrated as a chain of
per-stage programs:

  forward:  state_{i+1} = stage_i(params_i, state_i, consts_i)   (saved inputs)
  backward: cot_p_i, cot_state_i, cot_consts_i = vjp(stage_i)(cot_state_{i+1})

Each backward program recomputes its stage forward inside jax.vjp — i.e.
gradient checkpointing at block boundaries (the same policy as the
reference's per-block torch.utils.checkpoint, unet_3d_blocks.py:411-435).
Skip connections ride inside the state pytree, so the UNet's U-topology needs
no special casing; reference-bank features and conditioning tensors are
per-stage consts whose cotangents are accumulated and chained into the
reference net / conditioning backward passes.

Equivalence with jax.grad of the monolithic loss is verified by test.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet_blocks import DownBlock, MidBlock, RefFeatures, UpBlock
from ..models.piecewise import _ConvIn, _ConvOut, _TimeEmbed, _sub, _top
from ..models.unet_3d import UNetConfig


def _retry(fn, label, *args):
    from ..utils.runtime import with_compile_retries

    return with_compile_retries(fn, *args, label=label)


class StageChain:
    """A chain of stages with jitted per-stage forward and vjp programs.

    Each stage is `fn(params, state, consts) -> (state_out, aux_out)` where
    aux_out is a pytree of extra outputs (e.g. reference banks; may be ()).

    `set_grad_masks(param_masks, consts_cot_masks)` restricts what each
    backward program RETURNS: frozen-parameter grads and unneeded consts
    cotangents become None (pruned from the output pytree), so XLA dead-code
    -eliminates their computation and no HBM buffers ever exist for them —
    the piecewise analog of requires_grad_(False). Masks are fixed per chain
    (one training run has one trainability config); set them before the
    first backward call.
    """

    def __init__(self, name: str):
        self.name = name
        self.stages: List[Tuple[str, Callable]] = []
        self._fwd_jits: Dict[int, Any] = {}
        self._bwd_jits: Dict[int, Any] = {}
        self._param_masks: Optional[List[Any]] = None
        self._consts_cot_masks: Optional[List[Any]] = None

    def add(self, name: str, fn: Callable) -> None:
        self.stages.append((name, fn))

    def set_grad_masks(self, param_masks=None, consts_cot_masks=None) -> None:
        assert not self._bwd_jits, "set_grad_masks must precede the first backward"
        self._param_masks = param_masks
        self._consts_cot_masks = consts_cot_masks

    def _fwd(self, i):
        if i not in self._fwd_jits:
            fn = self.stages[i][1]
            jitted = jax.jit(fn)
            name = f"{self.name}/{self.stages[i][0]}/fwd"
            self._fwd_jits[i] = lambda *a, _j=jitted, _n=name: _retry(_j, _n, *a)
        return self._fwd_jits[i]

    def _bwd(self, i):
        if i not in self._bwd_jits:
            fn = self.stages[i][1]
            p_mask = self._param_masks[i] if self._param_masks is not None else None
            c_mask = self._consts_cot_masks[i] if self._consts_cot_masks is not None else None

            def prune(tree, mask):
                if mask is None:
                    return tree
                if mask is False:
                    return None
                if mask is True:
                    return tree
                return jax.tree_util.tree_map(
                    lambda x, m_: x if m_ else None, tree, mask,
                    is_leaf=lambda x: x is None,
                )

            def bwd(params, state, consts, cot_state, cot_aux):
                _, vjp_fn = jax.vjp(fn, params, state, consts)
                g_p, g_s, g_c = vjp_fn((cot_state, cot_aux))
                return prune(g_p, p_mask), g_s, prune(g_c, c_mask)

            jitted = jax.jit(bwd)
            name = f"{self.name}/{self.stages[i][0]}/bwd"
            self._bwd_jits[i] = lambda *a, _j=jitted, _n=name: _retry(_j, _n, *a)
        return self._bwd_jits[i]

    def forward(self, params_list: Sequence, state, consts_list: Sequence):
        """Returns (final_state, aux_list, saved) where saved holds each
        stage's input state for the backward pass."""
        saved = []
        aux_list = []
        for i, _ in enumerate(self.stages):
            saved.append(state)
            state, aux = self._fwd(i)(params_list[i], state, consts_list[i])
            aux_list.append(aux)
        return state, aux_list, saved

    def backward(self, params_list, consts_list, saved, cot_state, cot_aux_list):
        """Returns (grads_list, cot_initial_state, cot_consts_list).
        Consumes `saved` in place: each stage's checkpointed input state is
        released as soon as its backward program has used it."""
        grads_list = [None] * len(self.stages)
        cot_consts_list = [None] * len(self.stages)
        for i in reversed(range(len(self.stages))):
            g_p, cot_state, g_c = self._bwd(i)(
                params_list[i], saved[i], consts_list[i], cot_state, cot_aux_list[i]
            )
            saved[i] = None
            grads_list[i] = g_p
            cot_consts_list[i] = g_c
        return grads_list, cot_state, cot_consts_list


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _add_trees(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


class PiecewiseUNetGrad:
    """Forward + parameter/input gradients of DenoisingUNet3D and
    ReferenceUNet2D at block granularity. Mirrors models/piecewise.py's
    stage decomposition; params flow as subtrees of the same trees."""

    STAGE_NAMES_3D = (
        ["time_embedding", "conv_in"]
        + [f"down_blocks_{i}" for i in range(4)]
        + ["mid_block"]
        + [f"up_blocks_{i}" for i in range(4)]
        + ["conv_out"]
    )

    def __init__(self, config: UNetConfig, dtype=jnp.float32):
        if config.fusion_blocks != "full":
            raise NotImplementedError(
                "PiecewiseUNetGrad supports fusion_blocks='full' only (all "
                "V-Express training configs use full fusion, reference "
                "train.py:422-434); train midup models with the monolithic "
                "path (cli/train.py --piecewise off).")
        self.cfg = config
        self.dtype = dtype
        self._chains: Dict[Any, StageChain] = {}

    # ------------------------------------------------------------- denoiser

    def _denoiser_chain(self, b: int, f: int) -> StageChain:
        key = ("unet3d", b, f)
        if key in self._chains:
            return self._chains[key]
        cfg = self.cfg
        dt = self.dtype
        ch = cfg.block_out_channels
        chain = StageChain("unet3d")

        def temb_stage(p, state, consts):
            timesteps = consts
            temb = _TimeEmbed(ch[0], cfg.flip_sin_to_cos, cfg.freq_shift, dt).apply(p, timesteps, b)
            temb = jnp.repeat(temb, f, axis=0)
            # state: (x latents folded, skips=()); temb enters the state
            x, _ = state
            return (x, (), temb), ()

        chain.add("time_embedding", temb_stage)

        def conv_in_stage(p, state, consts):
            x, _, temb = state
            kps = consts
            x = _ConvIn(ch[0], dt).apply(p, x)
            if kps is not None:
                x = x + kps
            return (x, (x,), temb), ()

        chain.add("conv_in", conv_in_stage)

        mkw = dict(
            use_motion=cfg.use_motion_module,
            motion_heads=cfg.motion_num_attention_heads,
            motion_blocks=cfg.motion_num_transformer_block,
            motion_max_len=cfg.motion_max_len,
        )
        common = dict(
            temporal=True, eps=cfg.norm_eps, groups=cfg.norm_num_groups, dtype=dt,
            heads=cfg.attention_head_dim, num_layers=cfg.layers_per_block,
        )

        for i in range(4):
            is_final = i == 3
            block = DownBlock(ch[i], has_attention=not is_final, add_downsample=not is_final,
                              **{**common, **mkw})

            def down_stage(p, state, consts, block=block):
                x, skips, temb = state
                ctx, refs, scales = consts
                out, states = block.apply(p, x, temb, ctx, RefFeatures(list(refs)), scales, f)
                return (out, skips + tuple(states), temb), ()

            chain.add(f"down_blocks_{i}", down_stage)

        mid = MidBlock(ch[-1], num_layers=1, heads=cfg.attention_head_dim, temporal=True,
                       use_motion=cfg.use_motion_module and cfg.motion_module_mid_block,
                       motion_heads=cfg.motion_num_attention_heads,
                       motion_blocks=cfg.motion_num_transformer_block,
                       motion_max_len=cfg.motion_max_len,
                       eps=cfg.norm_eps, groups=cfg.norm_num_groups, dtype=dt)

        def mid_stage(p, state, consts):
            x, skips, temb = state
            ctx, refs, scales = consts
            out = mid.apply(p, x, temb, ctx, RefFeatures(list(refs)), scales, f)
            return (out, skips, temb), ()

        chain.add("mid_block", mid_stage)

        rev = list(reversed(ch))
        up_common = dict(common, num_layers=cfg.layers_per_block + 1)
        n_skips = cfg.layers_per_block + 1
        for i in range(4):
            is_final = i == 3
            block = UpBlock(rev[i], has_attention=i != 0, add_upsample=not is_final,
                            **{**up_common, **mkw})

            def up_stage(p, state, consts, block=block):
                x, skips, temb = state
                ctx, refs, scales = consts
                use, keep = skips[-n_skips:], skips[:-n_skips]
                out = block.apply(p, x, list(use), temb, ctx, RefFeatures(list(refs)), scales, f)
                return (out, keep, temb), ()

            chain.add(f"up_blocks_{i}", up_stage)

        def conv_out_stage(p, state, consts):
            x, skips, temb = state
            out = _ConvOut(cfg.out_channels, cfg.norm_num_groups, cfg.norm_eps, dt).apply(p, x)
            return (out, (), temb), ()

        chain.add("conv_out", conv_out_stage)

        self._chains[key] = chain
        return chain

    def _denoiser_params_consts(self, params, timesteps, ctx, refs, kps, scales):
        lp = self.cfg.layers_per_block
        counts = {"down_blocks_0": lp, "down_blocks_1": lp, "down_blocks_2": lp,
                  "down_blocks_3": 0, "mid_block": 1,
                  "up_blocks_0": 0, "up_blocks_1": lp + 1, "up_blocks_2": lp + 1,
                  "up_blocks_3": lp + 1}
        params_list, consts_list = [], []
        cursor = 0
        for name in self.STAGE_NAMES_3D:
            if name == "time_embedding":
                params_list.append(_top(params, ["time_embedding"]))
                consts_list.append(timesteps)
            elif name == "conv_in":
                params_list.append(_top(params, ["conv_in"]))
                consts_list.append(kps)
            elif name == "conv_out":
                params_list.append(_top(params, ["conv_norm_out", "conv_out"]))
                consts_list.append(())
            else:
                n = counts[name]
                params_list.append(_sub(params, name))
                consts_list.append((ctx, tuple(refs[cursor:cursor + n]), scales))
                cursor += n
        return params_list, consts_list

    def denoiser_value_and_grad(
        self,
        params,
        sample,  # (B, F, h, w, 4)
        timesteps,
        audio_tokens,  # (B, F, La, C)
        ref_features: Sequence,
        kps_features,  # (B, F, h, w, ch0) or None
        loss_head,  # fn(pred (B,F,h,w,4), loss_args) -> scalar loss
        loss_args=(),  # pytree of extra loss inputs (targets, masks, weights)
        ref_scale=1.0,
        audio_scale=1.0,
        param_mask=None,  # bool tree over `params`: False leaves get NO grads
        want_ctx_cot: bool = True,  # audio-token cotangents (audio proj trains)
        want_refs_cot: bool = True,  # bank cotangents (reference net trains)
        want_kps_cot: bool = True,  # kps-feature cotangents (guider trains)
    ):
        """Returns (loss, grads_tree, cotangents) where cotangents =
        dict(ctx=..., refs=[...], kps=...) for chaining into upstream models.

        With `param_mask`/`want_*`, frozen-parameter gradients and unneeded
        conditioning cotangents are pruned INSIDE the backward programs
        (None in the outputs, dead-code-eliminated by XLA) — at stage 2 this
        keeps ~3.5 GB of frozen-UNet gradient buffers from ever existing."""
        cfg = self.cfg
        dt = self.dtype
        b, f, h, w, _ = sample.shape
        chain = self._denoiser_chain(b, f)

        lp = cfg.layers_per_block
        stage_counts = {"down_blocks_0": lp, "down_blocks_1": lp, "down_blocks_2": lp,
                        "down_blocks_3": 0, "mid_block": 1, "up_blocks_0": 0,
                        "up_blocks_1": lp + 1, "up_blocks_2": lp + 1, "up_blocks_3": lp + 1}
        fp = (param_mask is not None
              and tuple(jax.tree_util.tree_leaves(param_mask)),
              want_ctx_cot, want_refs_cot, want_kps_cot)
        if getattr(chain, "_grad_mask_fp", None) is None:
            if param_mask is not None or not (want_ctx_cot and want_refs_cot and want_kps_cot):
                pmasks = None
                if param_mask is not None:
                    pmasks, _ = self._denoiser_params_consts(
                        param_mask, None, None, [None] * len(ref_features), None, None)
                cmasks = []
                for name in self.STAGE_NAMES_3D:
                    if name == "time_embedding":
                        cmasks.append(False)
                    elif name == "conv_in":
                        cmasks.append(bool(want_kps_cot))
                    elif name == "conv_out":
                        cmasks.append(True)
                    else:
                        n = stage_counts[name]
                        cmasks.append((bool(want_ctx_cot),
                                       tuple([bool(want_refs_cot)] * n),
                                       (False, False)))
                chain.set_grad_masks(pmasks, cmasks)
            chain._grad_mask_fp = fp
        elif chain._grad_mask_fp != fp:
            raise ValueError(
                "this PiecewiseUNetGrad chain is already specialized to a different "
                "trainability configuration; use a separate instance per config")

        x = sample.reshape(b * f, h, w, sample.shape[-1]).astype(dt)
        ctx = audio_tokens.reshape(b * f, audio_tokens.shape[2], audio_tokens.shape[3]).astype(dt)
        refs = [r.astype(dt) for r in ref_features]
        kps = None if kps_features is None else kps_features.reshape(b * f, h, w,
                                                                     cfg.block_out_channels[0]).astype(dt)
        scales = (jnp.asarray(ref_scale, dt), jnp.asarray(audio_scale, dt))

        params_list, consts_list = self._denoiser_params_consts(
            params, timesteps, ctx, refs, kps, scales
        )

        state0 = (x, ())
        final_state, aux_list, saved = chain.forward(params_list, state0, consts_list)
        pred_flat = final_state[0]
        pred = pred_flat.reshape(b, f, h, w, cfg.out_channels)

        if not hasattr(self, "_loss_jit"):
            self._loss_jit = {}
        lkey = getattr(loss_head, "__name__", str(id(loss_head)))
        if lkey not in self._loss_jit:
            self._loss_jit[lkey] = jax.jit(
                lambda p_, a_: jax.value_and_grad(loss_head)(p_, a_)
            )
        loss, cot_pred = self._loss_jit[lkey](pred, loss_args)

        cot_state = (cot_pred.reshape(b * f, h, w, cfg.out_channels).astype(pred_flat.dtype),
                     (), jnp.zeros_like(final_state[2]))
        cot_aux = [() for _ in aux_list]
        grads_list, cot_state0, cot_consts = chain.backward(
            params_list, consts_list, saved, cot_state, cot_aux
        )

        # reassemble the denoising-unet grads tree
        grads = {"params": {}}
        for name, g in zip(self.STAGE_NAMES_3D, grads_list):
            if name in ("time_embedding", "conv_in", "conv_out"):
                # _top stages: subtree keys are already top-level param names
                for k, v in g["params"].items():
                    grads["params"][k] = v
            else:
                grads["params"][name] = g["params"]

        # accumulate conditioning cotangents (pruned entries arrive as None)
        cot_ctx = None
        cot_refs = [jnp.zeros_like(r) for r in refs] if want_refs_cot else None
        lp = cfg.layers_per_block
        counts = [0, 0, lp, lp, lp, 0, 1, 0, lp + 1, lp + 1, lp + 1, 0]
        cursor = 0
        cot_kps = None
        for idx, name in enumerate(self.STAGE_NAMES_3D):
            gc = cot_consts[idx]
            if name == "conv_in":
                cot_kps = gc
            elif name in ("time_embedding", "conv_out"):
                continue
            else:
                g_ctx, g_refs, _ = gc
                if g_ctx is not None:
                    cot_ctx = g_ctx if cot_ctx is None else cot_ctx + g_ctx
                for j, gr in enumerate(g_refs):
                    if gr is not None:
                        cot_refs[cursor + j] = cot_refs[cursor + j] + gr
                cursor += counts[idx]

        cots = {
            "ctx": None if cot_ctx is None else cot_ctx.reshape(audio_tokens.shape),
            "refs": cot_refs,
            "kps": None if (cot_kps is None or kps_features is None)
            else cot_kps.reshape(kps_features.shape),
        }
        return loss, grads, cots

    # ---------------------------------------------------------- reference net

    def refnet_forward_and_grad(self, params, ref_latent, cot_banks_fn=None,
                                param_mask=None):
        """Piecewise forward of ReferenceUNet2D returning banks plus a
        backward(cot_banks) -> grads function. `param_mask` prunes frozen
        parameter grads (e.g. up_blocks_3, always frozen, train.py:404-406)."""
        cfg = self.cfg
        dt = self.dtype
        b = ref_latent.shape[0]
        key = ("unet2d", b)
        if key not in self._chains:
            chain = StageChain("unet2d")
            ch = cfg.block_out_channels

            def temb_stage(p, state, consts):
                temb = _TimeEmbed(ch[0], cfg.flip_sin_to_cos, cfg.freq_shift, dt).apply(
                    p, jnp.zeros((b,), jnp.int32), b
                )
                x, _ = state
                return (x, (), temb), ()

            chain.add("time_embedding", temb_stage)

            def conv_in_stage(p, state, consts):
                x, _, temb = state
                x = _ConvIn(ch[0], dt).apply(p, x)
                return (x, (x,), temb), ()

            chain.add("conv_in", conv_in_stage)

            common = dict(temporal=False, eps=cfg.norm_eps, groups=cfg.norm_num_groups,
                          dtype=dt, heads=cfg.attention_head_dim, num_layers=cfg.layers_per_block)
            ctx0 = jnp.zeros((b, 1, cfg.cross_attention_dim), dt)

            for i in range(4):
                is_final = i == 3
                block = DownBlock(ch[i], has_attention=not is_final, add_downsample=not is_final,
                                  **common)

                def down_stage(p, state, consts, block=block):
                    x, skips, temb = state
                    rf = RefFeatures()
                    out, states = block.apply(p, x, temb, ctx0, rf, None, 1)
                    return (out, skips + tuple(states), temb), tuple(rf.feats)

                chain.add(f"down_blocks_{i}", down_stage)

            mid = MidBlock(ch[-1], num_layers=1, heads=cfg.attention_head_dim, temporal=False,
                           eps=cfg.norm_eps, groups=cfg.norm_num_groups, dtype=dt)

            def mid_stage(p, state, consts):
                x, skips, temb = state
                rf = RefFeatures()
                out = mid.apply(p, x, temb, ctx0, rf, None, 1)
                return (out, skips, temb), tuple(rf.feats)

            chain.add("mid_block", mid_stage)

            rev = list(reversed(ch))
            up_common = dict(common, num_layers=cfg.layers_per_block + 1)
            n_skips = cfg.layers_per_block + 1
            for i in range(4):
                is_final = i == 3
                block = UpBlock(rev[i], has_attention=i != 0, add_upsample=not is_final,
                                **up_common)

                def up_stage(p, state, consts, block=block):
                    x, skips, temb = state
                    use, keep = skips[-n_skips:], skips[:-n_skips]
                    rf = RefFeatures()
                    out = block.apply(p, x, list(use), temb, ctx0, rf, None, 1)
                    return (out, keep, temb), tuple(rf.feats)

                chain.add(f"up_blocks_{i}", up_stage)
            self._chains[key] = chain
        chain = self._chains[key]

        stage_names = (["time_embedding", "conv_in"] + [f"down_blocks_{i}" for i in range(4)]
                       + ["mid_block"] + [f"up_blocks_{i}" for i in range(4)])

        def split(tree):
            out = []
            for name in stage_names:
                if name in ("time_embedding", "conv_in"):
                    out.append(_top(tree, [name]))
                else:
                    out.append(_sub(tree, name))
            return out

        params_list = split(params)
        consts_list = [()] * len(stage_names)

        fp = param_mask is not None and tuple(jax.tree_util.tree_leaves(param_mask))
        if getattr(chain, "_grad_mask_fp", None) is None:
            if param_mask is not None:
                chain.set_grad_masks(split(param_mask), None)
            chain._grad_mask_fp = fp
        elif chain._grad_mask_fp != fp:
            raise ValueError("refnet chain already specialized to a different mask")

        state0 = (ref_latent.astype(dt), ())
        final_state, aux_list, saved = chain.forward(params_list, state0, consts_list)
        banks = [bk for aux in aux_list for bk in aux]

        def backward(cot_banks: Sequence):
            cot_aux_list = []
            cursor = 0
            for aux in aux_list:
                n = len(aux)
                cot_aux_list.append(tuple(cot_banks[cursor:cursor + n]))
                cursor += n
            cot_state = jax.tree_util.tree_map(jnp.zeros_like, final_state)
            grads_list, _, _ = chain.backward(params_list, consts_list, saved, cot_state, cot_aux_list)
            grads = {"params": {}}
            for name, g in zip(stage_names, grads_list):
                if name in ("time_embedding", "conv_in"):
                    for k, v in g["params"].items():
                        grads["params"][k] = v
                else:
                    grads["params"][name] = g["params"]
            # the conv_norm_out/conv_out params receive no gradient through the
            # banks (they only affect the unused sample output)
            for k in ("conv_norm_out", "conv_out"):
                if k in params["params"]:
                    if param_mask is not None:
                        grads["params"][k] = jax.tree_util.tree_map(
                            lambda p, m_: jnp.zeros_like(p) if m_ else None,
                            params["params"][k], param_mask["params"][k],
                        )
                    else:
                        grads["params"][k] = jax.tree_util.tree_map(
                            jnp.zeros_like, params["params"][k]
                        )
            return grads

        return tuple(banks), backward
