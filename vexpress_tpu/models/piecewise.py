"""Piecewise UNet execution: one compiled program per UNet block.

The axon remote-compile service drops connections on monolithic SD-scale
programs (~30 min compiles, then "Broken pipe"). Because every linen block is
addressable by its param subtree, the UNets can run as a sequence of
per-block programs — identical math (verified by test), each program VAE-sized
or smaller, compiling in minutes and cached persistently. Dispatch overhead is
~10 host calls per UNet forward, microseconds next to seconds of compute.

Used by the pipeline on real TPU; the monolithic path remains the default
under tests/CPU and for multi-chip shard_map.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.layers import get_timestep_embedding
from .blocks import conv, group_norm
from .unet_blocks import DownBlock, MidBlock, RefFeatures, UpBlock
from .unet_3d import UNetConfig

from flax import linen as nn


class _ConvIn(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv(self.features, 3, "conv_in", dtype=self.dtype)(x)


class _ConvOut(nn.Module):
    features: int
    groups: int
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = group_norm(self.groups, self.eps, "conv_norm_out", self.dtype)(x)
        x = jax.nn.silu(x)
        return conv(self.features, 3, "conv_out", dtype=self.dtype)(x)


class _TimeEmbed(nn.Module):
    ch0: int
    flip: bool
    shift: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timesteps, batch):
        from ..ops.layers import TimestepEmbedding

        t_emb = get_timestep_embedding(
            jnp.broadcast_to(jnp.asarray(timesteps), (batch,)), self.ch0, self.flip, self.shift
        ).astype(self.dtype)
        return TimestepEmbedding(self.ch0 * 4, dtype=self.dtype, name="time_embedding")(t_emb)


def _sub(params: Dict, *names) -> Dict:
    node = params["params"]
    for n in names[:-1]:
        node = node[n]
    return {"params": node[names[-1]]} if names else {"params": node}


def _top(params: Dict, keys) -> Dict:
    """Select top-level param children into a fresh {"params": ...} tree."""
    p = params["params"]
    return {"params": {k: p[k] for k in keys if k in p}}


class PiecewiseUNetRunner:
    """Per-block jitted execution of ReferenceUNet2D / DenoisingUNet3D params."""

    def __init__(self, config: UNetConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype
        self._jits: Dict[Any, Any] = {}
        self._record = None  # per-stage timing sink (see timed_stages)

    # -- jit helpers --------------------------------------------------------

    def _jit(self, key, fn):
        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _run(self, name, fn, *args):
        """Dispatch a stage program; when timing is enabled, hard-sync its
        outputs (device_get of an fp32 sum — block_until_ready can return
        early through the axon tunnel) and attribute the wall time."""
        if self._record is None:
            return fn(*args)
        import time as _time

        t0 = _time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            s = self._jit(("sync", tuple(leaf.shape), str(leaf.dtype)),
                          lambda y: jnp.sum(y.astype(jnp.float32)))
            float(s(leaf))
        self._record[name] = self._record.get(name, 0.0) + _time.perf_counter() - t0
        return out

    def timed_stages(self, params, sample, timesteps, audio_tokens, ref_features,
                     kps_features, ref_scale, audio_scale, reps: int = 5,
                     zero_uncond_kv: bool = False):
        """Average per-stage seconds of the 3D UNet forward. Syncs after every
        stage, so numbers attribute time to stages (the unsynced full chain
        overlaps dispatch and runs slightly faster)."""
        # make sure stage + sync programs are compiled before measuring
        self.unet3d(params, sample, timesteps, audio_tokens, ref_features,
                    kps_features, ref_scale, audio_scale, zero_uncond_kv)
        self._record = {}
        self.unet3d(params, sample, timesteps, audio_tokens, ref_features,
                    kps_features, ref_scale, audio_scale, zero_uncond_kv)
        self._record = {}
        for _ in range(reps):
            self.unet3d(params, sample, timesteps, audio_tokens, ref_features,
                        kps_features, ref_scale, audio_scale, zero_uncond_kv)
        rec = {k: v / reps for k, v in self._record.items()}
        self._record = None
        return rec

    # -- shared stage builders ---------------------------------------------

    def _block_args(self, temporal: bool):
        cfg = self.cfg
        mkw = dict(
            use_motion=cfg.use_motion_module if temporal else False,
            motion_heads=cfg.motion_num_attention_heads,
            motion_blocks=cfg.motion_num_transformer_block,
            motion_max_len=cfg.motion_max_len,
        )
        common = dict(
            temporal=temporal,
            use_temporal_attention=cfg.unet_use_temporal_attention if temporal else False,
            eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=self.dtype,
            heads=cfg.attention_head_dim,
            num_layers=cfg.layers_per_block,
        )
        return common, mkw

    def _ref_slices(self):
        """Number of ref features consumed per stage, in order."""
        lp = self.cfg.layers_per_block
        dn = lp if self.cfg.fusion_blocks == "full" else 0  # midup: no down banks
        return {
            "down_0": dn, "down_1": dn, "down_2": dn, "down_3": 0,
            "mid": 1,
            "up_0": 0, "up_1": lp + 1, "up_2": lp + 1, "up_3": lp + 1,
        }

    # -- full forwards -------------------------------------------------------

    def unet3d(self, params, sample, timesteps, audio_tokens, ref_features,
               kps_features, ref_scale, audio_scale, zero_uncond_kv=False):
        """Piecewise equivalent of DenoisingUNet3D.__call__ (same params)."""
        cfg = self.cfg
        dt = self.dtype
        b, f, h, w, _ = sample.shape
        ch = cfg.block_out_channels
        common, mkw = self._block_args(temporal=True)
        scales = (jnp.asarray(ref_scale, dt), jnp.asarray(audio_scale, dt))
        nrefs = self._ref_slices()

        temb_fn = self._jit(("temb", b, f), lambda p, t: jnp.repeat(
            _TimeEmbed(ch[0], cfg.flip_sin_to_cos, cfg.freq_shift, dt).apply(p, t, b), f, axis=0))
        temb = self._run("temb", temb_fn, _top(params, ["time_embedding"]), timesteps)

        x = sample.reshape(b * f, h, w, sample.shape[-1]).astype(dt)
        ctx = audio_tokens.reshape(b * f, audio_tokens.shape[2], audio_tokens.shape[3]).astype(dt)
        refs = [r.astype(dt) for r in ref_features]

        conv_in_fn = self._jit(("conv_in3d", x.shape), lambda p, x_, k_: (
            _ConvIn(ch[0], dt).apply(p, x_) + (0 if k_ is None else k_)))
        kps = None if kps_features is None else kps_features.reshape(b * f, h, w, ch[0]).astype(dt)
        x = self._run("conv_in", conv_in_fn, _top(params, ["conv_in"]), x, kps)

        fuse_tail = os.environ.get("VEXPRESS_FUSE_TAIL", "1") == "1"
        # midspan fusion: down_2+down_3+mid+up_0+up_1 (the 16x16 and 8x8
        # levels, ~20% of the window step) as ONE program — saves 4 dispatches
        # and 4 block-boundary HBM materializations per UNet call. Off by
        # default until measured faster on the target (the larger program also
        # stresses the remote compile service).
        fuse_mid = os.environ.get("VEXPRESS_FUSE_MID", "0") == "1"
        n_down = 2 if fuse_mid else (3 if fuse_tail else 4)
        skips = [x]
        cursor = 0
        for i in range(n_down):
            is_final = i == 3
            n_in = nrefs[f"down_{i}"]
            block = DownBlock(ch[i], has_attention=not is_final, add_downsample=not is_final,
                              **{**common, **mkw})
            block_refs = tuple(refs[cursor : cursor + n_in])
            cursor += n_in

            midup = cfg.fusion_blocks == "midup"

            def down_fn(p, x_, temb_, ctx_, refs_, scales_, block=block, midup=midup):
                # midup: down blocks are outside the fusion set — refs=None
                # selects the plain unfused transformer forward
                r = None if midup else RefFeatures(list(refs_))
                return block.apply(p, x_, temb_, ctx_, r, scales_, f,
                                   zero_uncond_kv)

            fn = self._jit(("down3d", i, b, f, x.shape, zero_uncond_kv), down_fn)
            x, states = self._run(f"down_{i}", fn, _sub(params, f"down_blocks_{i}"), x, temb, ctx, block_refs, scales)
            skips.extend(states)

        mid = MidBlock(ch[-1], num_layers=1, heads=cfg.attention_head_dim, temporal=True,
                       use_temporal_attention=cfg.unet_use_temporal_attention,
                       use_motion=cfg.use_motion_module and cfg.motion_module_mid_block,
                       motion_heads=cfg.motion_num_attention_heads,
                       motion_blocks=cfg.motion_num_transformer_block,
                       motion_max_len=cfg.motion_max_len,
                       eps=cfg.norm_eps, groups=cfg.norm_num_groups, dtype=dt)
        if not fuse_mid:
            # under fuse_mid the mid ref is consumed INSIDE the fused branch,
            # after down_2's (positional bank order: down -> mid -> up)
            mid_refs = tuple(refs[cursor : cursor + 1])
            cursor += 1

        rev = list(reversed(ch))
        up_common = dict(common, num_layers=cfg.layers_per_block + 1)
        lp = cfg.layers_per_block

        if fuse_mid:
            # down_2 + down_3 + mid + up_0 + up_1 in ONE program (all of the
            # 16x16 and 8x8 levels): skip topology is internal except the
            # incoming x (which doubles as up_1's outermost skip, exactly as
            # in the unfused flow where x == the last element of `skips`)
            down2 = DownBlock(ch[2], has_attention=True, add_downsample=True,
                              **{**common, **mkw})
            down3 = DownBlock(ch[3], has_attention=False, add_downsample=False,
                              **{**common, **mkw})
            up0 = UpBlock(rev[0], has_attention=False, add_upsample=True,
                          **{**up_common, **mkw})
            up1 = UpBlock(rev[1], has_attention=True, add_upsample=True,
                          **{**up_common, **mkw})
            n2 = nrefs["down_2"]
            refs_d2 = tuple(refs[cursor : cursor + n2]); cursor += n2
            refs_mid = tuple(refs[cursor : cursor + 1]); cursor += 1
            n1 = nrefs["up_1"]
            refs_u1 = tuple(refs[cursor : cursor + n1]); cursor += n1

            midup_fuse = cfg.fusion_blocks == "midup"

            def midspan_fn(p, x_, temb_, ctx_, r2_, rm_, r1_, scales_):
                skip_in = x_
                r2 = None if midup_fuse else RefFeatures(list(r2_))
                x_, st2 = down2.apply({"params": p["d2"]}, x_, temb_, ctx_,
                                      r2, scales_, f, zero_uncond_kv)
                x_, st3 = down3.apply({"params": p["d3"]}, x_, temb_, ctx_,
                                      RefFeatures([]), scales_, f, zero_uncond_kv)
                x_ = mid.apply({"params": p["mid"]}, x_, temb_, ctx_,
                               RefFeatures(list(rm_)), scales_, f, zero_uncond_kv)
                x_ = up0.apply({"params": p["u0"]}, x_, [st2[-1]] + list(st3),
                               temb_, ctx_, RefFeatures([]), scales_, f, zero_uncond_kv)
                x_ = up1.apply({"params": p["u1"]}, x_, [skip_in] + list(st2[:lp]),
                               temb_, ctx_, RefFeatures(list(r1_)), scales_, f,
                               zero_uncond_kv)
                return x_

            p_mid = {"d2": params["params"]["down_blocks_2"],
                     "d3": params["params"]["down_blocks_3"],
                     "mid": params["params"]["mid_block"],
                     "u0": params["params"]["up_blocks_0"],
                     "u1": params["params"]["up_blocks_1"]}
            fn = self._jit(("midspan3d", b, f, x.shape, zero_uncond_kv), midspan_fn)
            skips.pop()  # the incoming x, consumed as up_1's outermost skip
            x = self._run("midspan", fn, p_mid, x, temb, ctx, refs_d2, refs_mid,
                          refs_u1, scales)
            up_range = range(2, 4)
        elif fuse_tail:
            # down_3 + mid + up_0 all run at the bottleneck resolution (h/8)
            # and are individually tiny; one program saves two block-boundary
            # HBM materializations and two dispatches per denoise step
            down3 = DownBlock(ch[3], has_attention=False, add_downsample=False,
                              **{**common, **mkw})
            up0 = UpBlock(rev[0], has_attention=False, add_upsample=True,
                          **{**up_common, **mkw})

            def tail_fn(p, x_, skip_prev, temb_, ctx_, refs_, scales_):
                x_, states = down3.apply({"params": p["down"]}, x_, temb_, ctx_,
                                         RefFeatures([]), scales_, f, zero_uncond_kv)
                x_ = mid.apply({"params": p["mid"]}, x_, temb_, ctx_,
                               RefFeatures(list(refs_)), scales_, f, zero_uncond_kv)
                x_ = up0.apply({"params": p["up"]}, x_, [skip_prev] + list(states),
                               temb_, ctx_, RefFeatures([]), scales_, f, zero_uncond_kv)
                return x_

            p_tail = {"down": params["params"]["down_blocks_3"],
                      "mid": params["params"]["mid_block"],
                      "up": params["params"]["up_blocks_0"]}
            fn = self._jit(("tail3d", b, f, x.shape, zero_uncond_kv), tail_fn)
            skip_prev = skips.pop()
            x = self._run("tail", fn, p_tail, x, skip_prev, temb, ctx, mid_refs, scales)
            up_range = range(1, 4)
        else:
            def mid_fn(p, x_, temb_, ctx_, refs_, scales_):
                return mid.apply(p, x_, temb_, ctx_, RefFeatures(list(refs_)), scales_, f,
                                 zero_uncond_kv)

            x = self._run("mid", self._jit(("mid3d", b, f, x.shape, zero_uncond_kv), mid_fn),
                          _sub(params, "mid_block"), x, temb, ctx, mid_refs, scales)
            up_range = range(0, 4)

        for i in up_range:
            is_final = i == 3
            n_in = nrefs[f"up_{i}"]
            block = UpBlock(rev[i], has_attention=i != 0, add_upsample=not is_final,
                            **{**up_common, **mkw})
            n_skips = cfg.layers_per_block + 1
            block_skips = tuple(skips[-n_skips:])
            del skips[-n_skips:]
            block_refs = tuple(refs[cursor : cursor + n_in])
            cursor += n_in

            def up_fn(p, x_, skips_, temb_, ctx_, refs_, scales_, block=block):
                return block.apply(p, x_, list(skips_), temb_, ctx_, RefFeatures(list(refs_)),
                                   scales_, f, zero_uncond_kv)

            fn = self._jit(("up3d", i, b, f, x.shape, zero_uncond_kv), up_fn)
            x = self._run(f"up_{i}", fn, _sub(params, f"up_blocks_{i}"), x, block_skips, temb, ctx, block_refs, scales)

        out_fn = self._jit(("conv_out3d", x.shape), lambda p, x_: _ConvOut(
            cfg.out_channels, cfg.norm_num_groups, cfg.norm_eps, dt).apply(p, x_))
        x = self._run("conv_out", out_fn, _top(params, ["conv_norm_out", "conv_out"]), x)
        return x.reshape(b, f, h, w, cfg.out_channels)

    def reference_net(self, params, sample, timesteps, encoder_hidden_states):
        """Piecewise equivalent of ReferenceUNet2D.__call__; returns banks."""
        cfg = self.cfg
        dt = self.dtype
        b, h, w, _ = sample.shape
        ch = cfg.block_out_channels
        common, _ = self._block_args(temporal=False)
        nrefs = self._ref_slices()

        temb_fn = self._jit(("temb2d", b), lambda p, t: _TimeEmbed(
            ch[0], cfg.flip_sin_to_cos, cfg.freq_shift, dt).apply(p, t, b))
        temb = temb_fn(_top(params, ["time_embedding"]), timesteps)

        x = sample.astype(dt)
        ctx = encoder_hidden_states.astype(dt)
        conv_in_fn = self._jit(("conv_in2d", x.shape), lambda p, x_: _ConvIn(ch[0], dt).apply(p, x_))
        x = conv_in_fn(_top(params, ["conv_in"]), x)

        banks = []
        skips = [x]
        for i in range(4):
            is_final = i == 3
            block = DownBlock(ch[i], has_attention=not is_final, add_downsample=not is_final, **common)

            capture = cfg.fusion_blocks == "full"  # midup: no down banks

            def down_fn(p, x_, temb_, ctx_, block=block, capture=capture):
                refs = RefFeatures() if capture else None
                out, states = block.apply(p, x_, temb_, ctx_, refs, None, 1)
                return out, states, tuple(refs.feats) if capture else ()

            fn = self._jit(("down2d", i, x.shape), down_fn)
            x, states, new_banks = fn(_sub(params, f"down_blocks_{i}"), x, temb, ctx)
            skips.extend(states)
            banks.extend(new_banks)

        mid = MidBlock(ch[-1], num_layers=1, heads=cfg.attention_head_dim, temporal=False,
                       eps=cfg.norm_eps, groups=cfg.norm_num_groups, dtype=dt)

        def mid_fn(p, x_, temb_, ctx_):
            refs = RefFeatures()
            out = mid.apply(p, x_, temb_, ctx_, refs, None, 1)
            return out, tuple(refs.feats)

        x, new_banks = self._jit(("mid2d", x.shape), mid_fn)(_sub(params, "mid_block"), x, temb, ctx)
        banks.extend(new_banks)

        rev = list(reversed(ch))
        up_common = dict(common, num_layers=cfg.layers_per_block + 1)
        for i in range(4):
            is_final = i == 3
            block = UpBlock(rev[i], has_attention=i != 0, add_upsample=not is_final, **up_common)
            n_skips = cfg.layers_per_block + 1
            block_skips = tuple(skips[-n_skips:])
            del skips[-n_skips:]

            def up_fn(p, x_, skips_, temb_, ctx_, block=block):
                refs = RefFeatures()
                out = block.apply(p, x_, list(skips_), temb_, ctx_, refs, None, 1)
                return out, tuple(refs.feats)

            fn = self._jit(("up2d", i, x.shape), up_fn)
            x, new_banks = fn(_sub(params, f"up_blocks_{i}"), x, block_skips, temb, ctx)
            banks.extend(new_banks)

        out_fn = self._jit(("conv_out2d", x.shape), lambda p, x_: _ConvOut(
            cfg.out_channels, cfg.norm_num_groups, cfg.norm_eps, dt).apply(p, x_))
        x = out_fn(_top(params, ["conv_norm_out", "conv_out"]), x)
        return x, tuple(banks)
