"""VExpressPipeline — TPU-native inference orchestration.

Reference behavior: pipelines/v_express_pipeline.py:409-589 (`mean_overlap`).
Key restructuring for TPU (same math, proven equivalent by the static window
schedule):

* The reference iterates context windows sequentially inside a python loop,
  shuttling each window host<->device (latents live on CPU). Here the window
  set is a static [N, 24] index array computed once (it uses step=0 for every
  denoise step, v_express_pipeline.py:486-496), so one jitted `denoise_step`
  gathers all windows, runs the UNet over a *batched* window axis (group size
  G per UNet call via lax.map), scatter-adds the 1/count-weighted noise
  predictions, and applies one DDIM step for all frames. Per-frame "step when
  all covering windows are done" bookkeeping is equivalent because every
  window reads pre-step latents and DDIM's update is elementwise per frame.

* CFG batching: uncond/cond are concatenated on the leading axis (uncond
  first, matching torch.cat([zeros, v]) in mutual_self_attention.py:359).
  Unconditional kps/audio/reference inputs are all-zero tensors; they are
  never materialized at video length — only per gathered window.

* Conditioning precompute (reference latent, kps features, audio tokens,
  reference-net bank features) happens once, on device, batched over frames.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import DDIMScheduler
from ..models.audio_projection import AudioProjection
from ..models.unet_2d import ReferenceUNet2D
from ..models.unet_3d import DenoisingUNet3D, UNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.vkps_guider import VKpsGuider
from ..models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from .audio import audio_frame_windows
from .context import compute_context_windows
from ..utils.runtime import phase, with_compile_retries

LATENT_SCALE = 0.18215


@functools.lru_cache(maxsize=1)
def _stream_barrier():
    """Tiny jitted program used as an execution-stream barrier (compiled once
    per process): device_get of its result implies all previously enqueued
    programs have retired on the single TPU stream."""
    return jax.jit(lambda: jnp.zeros(()))


def build_blended_denoise_step(
    predict_fn,
    scheduler: DDIMScheduler,
    windows: np.ndarray,
    inv_counts: np.ndarray,
    num_inference_steps: int,
    window_group: int = 1,
    eta: float = 0.0,
    sampler_step=None,
):
    """Build one denoise step: gather windows -> predict in groups of
    `window_group` -> scatter-add 1/count-weighted noise preds -> DDIM step.

    `predict_fn(lat, t, w_idx, cond) -> pred` maps (g, win, ...) window latents
    (plus conditioning pytree `cond`) to CFG-combined noise predictions.

    Equivalent to the reference's sequential per-window loop with per-frame
    "step when all covering windows done" bookkeeping
    (v_express_pipeline.py:527-577): every window reads pre-step latents and
    the DDIM update is elementwise, so accumulation order is irrelevant.
    """
    n_windows, win_size = windows.shape
    g = min(window_group, n_windows)
    n_groups = -(-n_windows // g)
    pad = n_groups * g - n_windows

    win_idx = np.concatenate([windows, np.zeros((pad, win_size), np.int32)]) if pad else windows
    win_mask = np.concatenate([np.ones(n_windows, np.float32), np.zeros(pad, np.float32)])
    win_idx = win_idx.reshape(n_groups, g, win_size).astype(np.int32)
    win_mask = win_mask.reshape(n_groups, g)
    # blending weight per (window, frame): inv_counts gathered, zero for pads
    win_w = inv_counts[win_idx] * win_mask[..., None]  # (n_groups, g, win)

    def blend(latents, t, cond):
        idx = jnp.asarray(win_idx)
        weights = jnp.asarray(win_w)

        def one_group(acc, gi):
            w_idx = idx[gi]  # (g, win)
            lat = latents[w_idx]
            pred = predict_fn(lat, t, w_idx, cond)
            pred = pred.astype(jnp.float32) * weights[gi][..., None, None, None]
            return acc.at[w_idx].add(pred), None

        acc = jnp.zeros_like(latents, dtype=jnp.float32)
        acc, _ = jax.lax.scan(one_group, acc, jnp.arange(n_groups))
        return acc

    if sampler_step is not None:
        # multistep sampler (DPM-Solver++): explicit state threaded by caller
        def step_fn(latents, step_idx, t, cond, prev_x0, has_prev):
            acc = blend(latents, t, cond)
            return sampler_step(acc, step_idx, latents, prev_x0, has_prev)

        return step_fn

    def step_fn(latents, t, cond, noise_key=None):
        acc = blend(latents, t, cond)
        return scheduler.step(acc, t, latents, num_inference_steps,
                              eta=eta, noise_key=noise_key)

    return step_fn


@dataclasses.dataclass
class PipelineModels:
    unet_config: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae_config: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    wav2vec2_config: Wav2Vec2Config = dataclasses.field(default_factory=Wav2Vec2Config)
    audio_projection_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    guider_kwargs: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: dict(conditioning_embedding_channels=320, block_out_channels=(16, 32, 96, 256))
    )
    dtype: Any = jnp.float32


class VExpressPipeline:
    """Functional pipeline: host orchestration around jitted device programs."""

    def __init__(
        self,
        models: PipelineModels,
        params: Dict[str, Any],
        scheduler: Optional[DDIMScheduler] = None,
    ):
        self.m = models
        dt = models.dtype
        self.vae = AutoencoderKL(models.vae_config, dtype=dt)
        self.reference_net = ReferenceUNet2D(models.unet_config, dtype=dt)
        self.denoising_unet = DenoisingUNet3D(models.unet_config, dtype=dt)
        self.v_kps_guider = VKpsGuider(dtype=dt, **models.guider_kwargs)
        self.audio_encoder = Wav2Vec2Model(models.wav2vec2_config, dtype=dt)
        self.audio_projection = AudioProjection(dtype=dt, **models.audio_projection_kwargs)
        self.scheduler = scheduler or DDIMScheduler()
        self._step_cache: Dict[Any, Any] = {}
        self._params_gen = 0
        self.params = params

    # params is a property so reassignment (e.g. loading a new checkpoint)
    # bumps a generation counter and evicts every cached step that captured
    # the old tree at build time: the replicated device copy AND the
    # group/fused/sharded step closures (each binds params["denoising_unet"]
    # when built — serving them after a reassignment would silently denoise
    # with the OLD weights and pin the stale ~4.4 GB tree in HBM).
    # "piecewise" entries read self.params at call time and survive (their
    # per-block compiled programs are expensive to rebuild and never stale).
    _PARAMS_BOUND_CACHE_PREFIXES = ("unet_params_repl", "group", "fused", "sharded")

    # NOTE: the conditioning/decode jits take their param subtrees as
    # ARGUMENTS (see the block comment above `_encode_reference`), so a
    # params reassignment can never serve stale weights through them and
    # their executables never pin param buffers (ADVICE r4 #1, resolved at
    # the root in round 5) — only the step closures above bind params at
    # build time and need eviction here.

    @property
    def params(self) -> Dict[str, Any]:
        return self._params

    @params.setter
    def params(self, value: Dict[str, Any]) -> None:
        self._params = value
        self._params_gen += 1
        stale = [k for k in self._step_cache
                 if isinstance(k, tuple) and k
                 and k[0] in self._PARAMS_BOUND_CACHE_PREFIXES]
        for k in stale:
            del self._step_cache[k]
        # host copies of releasable conditioning modules (see
        # release_conditioning_params) belong to the previous tree
        self._host_cond_params: Dict[str, Any] = {}

    # --------------------------------------------- save_memory param freeing
    #
    # The reference's --save_gpu_memory deletes the reference net, kps guider
    # and audio projection after conditioning (v_express_pipeline.py:473-483,
    # 510-511) so the denoise loop runs with only the 3D UNet + VAE resident.
    # TPU analog: drop the device copies of the conditioning-only subtrees.
    # The conditioning jits take params as ARGUMENTS (round 5), so their
    # executables never embed or pin the buffers — deleting the leaves frees
    # the HBM directly, no cache clearing needed. The kps guider is NOT
    # releasable: under save_memory the streamed path runs it per window
    # group DURING the loop.
    _RELEASABLE_COND_MODULES = ("reference_net", "wav2vec2", "audio_projection")

    def release_conditioning_params(self) -> float:
        """Free the conditioning-only module params from HBM; returns MiB
        freed. Host copies are kept (captured at load by io/loaders.py, or
        fetched here as a fallback) so the next `__call__` restores them in
        one batched upload. The denoising_unet subtree is untouched, so the
        params-bound step caches stay valid (mutated in place, no gen bump).

        Serialization: leaf.delete() must not race an in-flight conditioning
        program still reading these buffers, and block_until_ready is
        unreliable through the axon tunnel (CLAUDE.md) — so this method runs
        its OWN barrier: device_get of a fresh trivial program, which on the
        single TPU execution stream implies every previously enqueued program
        has retired (ADVICE r4 #2)."""
        jax.device_get(_stream_barrier()())
        host = getattr(self, "_host_cond_params", None)
        if host is None:
            host = self._host_cond_params = {}
        released = []
        for name in self._RELEASABLE_COND_MODULES:
            sub = self._params.get(name)
            if sub is None:
                continue
            if name not in host:
                # slow path (device->host); load_pipeline pre-stashes these
                host[name] = jax.device_get(sub)
            released.append(sub)
            self._params[name] = None
        if not released:
            return 0.0
        freed = 0
        for sub in released:
            for leaf in jax.tree_util.tree_leaves(sub):
                freed += leaf.nbytes
                leaf.delete()
        return freed / 2**20

    def ensure_conditioning_params(self) -> None:
        """Re-upload any released conditioning subtrees (one batched
        device_put from the host copies)."""
        missing = [k for k in self._RELEASABLE_COND_MODULES
                   if self._params.get(k, ()) is None]
        if not missing:
            return
        host = getattr(self, "_host_cond_params", {})
        lost = [k for k in missing if k not in host]
        if lost:
            raise RuntimeError(
                f"conditioning params {lost} were released and no host copy "
                "exists (params were reassigned after release?) — reload the "
                "checkpoint")
        restored = jax.device_put({k: host[k] for k in missing})
        for k, v in restored.items():
            self._params[k] = v

    # ------------------------------------------------------------ precompute

    # NOTE (round 5): every conditioning jit takes its param subtree as an
    # ARGUMENT. Closure-capturing `self.params[...]` under a static-self jit
    # embeds the weights as HLO constants — executables pin the buffers in
    # HBM, persistent-cache entries balloon to the size of the weights
    # (211 MB for the VAE encode alone), and a FRESH PROCESS pays minutes
    # re-loading them through the compile service (measured: the bucketed
    # audio stack cost 175.8 s process-cold vs 0.1 s warm). With params as
    # arguments the programs are small, load in seconds, never pin params,
    # and never serve stale weights after a checkpoint reload.

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_reference(self, p_vae, image: jax.Array) -> jax.Array:
        """(H, W, 3) in [0,1] -> scaled latent (1, h, w, 4)."""
        x = image[None] * 2.0 - 1.0
        return self.vae.apply(p_vae, x, method=AutoencoderKL.encode) * LATENT_SCALE

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _reference_features(self, p_ref, ref_latent: jax.Array, do_cfg: bool):
        ctx = jnp.zeros((1, 1, self.m.unet_config.cross_attention_dim), self.m.dtype)
        _, feats = self.reference_net.apply(
            p_ref, ref_latent, jnp.zeros((1,), jnp.int32), ctx
        )
        if do_cfg:
            feats = tuple(jnp.concatenate([jnp.zeros_like(f), f], axis=0) for f in feats)
        return feats

    @property
    def piecewise_runner(self):
        if not hasattr(self, "_piecewise_runner"):
            from ..models.piecewise import PiecewiseUNetRunner

            self._piecewise_runner = PiecewiseUNetRunner(self.m.unet_config, dtype=self.m.dtype)
        return self._piecewise_runner

    def _reference_features_piecewise(self, p_ref, ref_latent: jax.Array, do_cfg: bool):
        ctx = jnp.zeros((1, 1, self.m.unet_config.cross_attention_dim), self.m.dtype)
        _, feats = self.piecewise_runner.reference_net(
            p_ref, ref_latent, jnp.zeros((1,), jnp.int32), ctx
        )
        if do_cfg:
            feats = tuple(jnp.concatenate([jnp.zeros_like(f), f], axis=0) for f in feats)
        return feats

    @functools.partial(jax.jit, static_argnums=0)
    def _kps_features(self, p_guider, kps_images: jax.Array) -> jax.Array:
        """(L, H, W, 3) in [0,1] float — or raw uint8, normalized on device
        (uint8 upload is 4x less host->device traffic; the axon tunnel moves
        ~50 MB/s up) -> (L, h, w, 320)."""
        if kps_images.dtype == jnp.uint8:
            kps_images = kps_images.astype(self.m.dtype) / 255.0
        feats = self.v_kps_guider.apply(p_guider, kps_images[None])
        return feats[0]

    def _kps_features_chunked(self, kps_images: jax.Array, chunk: int = 32) -> jax.Array:
        """Shape-bucketed kps conditioning: the guider runs per-frame 2D convs
        (frames folded into batch), so processing fixed-size frame chunks is
        EXACT and reuses one compiled program for every clip length — instead
        of a minutes-long remote recompile per new video_length."""
        p = self.params["v_kps_guider"]
        n = kps_images.shape[0]
        if n <= chunk:
            return self._kps_features(p, kps_images)
        outs = []
        for i in range(0, n, chunk):
            sl = kps_images[i : i + chunk]
            if sl.shape[0] < chunk:
                pad = chunk - sl.shape[0]
                sl = jnp.concatenate([sl, jnp.zeros((pad,) + sl.shape[1:], sl.dtype)])
                outs.append(self._kps_features(p, sl)[: chunk - pad])
            else:
                outs.append(self._kps_features(p, sl))
        return jnp.concatenate(outs, axis=0)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _audio_tokens(self, p_w2v, p_aproj, waveform: jax.Array,
                      video_length: int, num_pad: int) -> jax.Array:
        """(T,) -> (L, tokens, cross_dim)."""
        emb = self.audio_encoder.apply(p_w2v, waveform[None])[0]
        windows = audio_frame_windows(emb, video_length, num_pad)
        return self.audio_projection.apply(p_aproj, windows)

    @functools.partial(jax.jit, static_argnums=0)
    def _kps_features_window(self, p_guider, kps_frames: jax.Array) -> jax.Array:
        """(g, win, H, W, 3) raw frames (uint8 or float in [0,1]) -> guider
        features (g, win, h, w, C). The save_memory path computes conditioning
        per window group ON THE FLY: the guider is per-frame (frames folded
        into batch), so this is EXACT vs the full-video precompute, costs only
        ~0.1% of a window step in FLOPs, and no O(video) feature tensor ever
        exists in HBM (nor crosses the ~10 MB/s tunnel)."""
        g, win = kps_frames.shape[:2]
        x = kps_frames.reshape((g * win,) + kps_frames.shape[2:])
        if x.dtype == jnp.uint8:
            x = x.astype(self.m.dtype) / 255.0
        else:
            x = x.astype(self.m.dtype)  # match the full-video upload dtype
        feats = self.v_kps_guider.apply(p_guider, x[None])[0]
        return feats.reshape((g, win) + feats.shape[1:])

    def _kps_window_features_sharded(self, kps_raw_np, win_idx_np, mesh, chunk: int = 4):
        """save_memory for the sharded mode: stream the HOST-resident raw kps
        frames through the guider a few windows at a time, filling a
        window-table feature buffer (n_windows, win, h, w, C) that lives
        SHARDED over the mesh ("dp" on the window axis) — conditioning never
        exists as an O(video) replicated tensor (the reference's
        --save_gpu_memory keeps it on CPU, v_express_pipeline.py:473-483).
        Exact: same guider math as the precomputed path, windows merely
        arrive pre-gathered. Buffer writes reuse ONE compiled donated
        dynamic-update-slice program (tail chunks clamp their start and
        rewrite identical rows)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        win_sh = NamedSharding(mesh, P("dp"))
        nw, win = win_idx_np.shape
        H, W = kps_raw_np.shape[1:3]
        dt = self.m.dtype
        ch = chunk if nw >= chunk else nw

        p_guider = self.params["v_kps_guider"]
        probe = jax.eval_shape(
            lambda x: self._kps_features_window(p_guider, x),
            jax.ShapeDtypeStruct((ch, win, H, W, kps_raw_np.shape[-1]), jnp.uint8
                                 if kps_raw_np.dtype == np.uint8 else dt))
        buf = jax.device_put(
            jnp.zeros((nw,) + probe.shape[1:], dt), win_sh)

        key = ("kps_win_setter", buf.shape, ch, tuple(mesh.shape.items()))
        if key not in self._step_cache:
            @functools.partial(jax.jit, donate_argnums=0, out_shardings=win_sh)
            def set_rows(buf, feats, start):
                return jax.lax.dynamic_update_slice(
                    buf, feats.astype(buf.dtype), (start, 0, 0, 0, 0))

            self._step_cache[key] = set_rows
        set_rows = self._step_cache[key]

        starts = sorted({min(s, nw - ch) for s in range(0, nw, ch)})
        for s in starts:
            rows = win_idx_np[s : s + ch]
            raw = jnp.asarray(kps_raw_np[rows])  # (ch, win, H, W, 3) upload
            feats = with_compile_retries(
                self._kps_features_window, p_guider, raw,
                label="windowed kps guider")
            buf = set_rows(buf, feats, jnp.asarray(s, jnp.int32))
        return buf

    @functools.partial(jax.jit, static_argnums=0)
    def _wav2vec2_encode_prenorm(self, p_w2v, waveform: jax.Array) -> jax.Array:
        """(1, T_bucket) pre-normalized waveform -> (T', hidden)."""
        import dataclasses as _dc

        model = Wav2Vec2Model(
            _dc.replace(self.m.wav2vec2_config, do_normalize=False), dtype=self.m.dtype
        )
        return model.apply(p_w2v, waveform)[0]

    @functools.partial(jax.jit, static_argnums=0)
    def _audio_projection_chunk(self, p_aproj, windows: jax.Array) -> jax.Array:
        return self.audio_projection.apply(p_aproj, windows)

    def _audio_tokens_bucketed(
        self,
        waveform: np.ndarray,
        video_length: int,
        num_pad: int,
        bucket_s: float = 5.0,
        sample_rate: int = 16000,
        proj_chunk: int = 64,
    ) -> jax.Array:
        """Shape-bucketed audio conditioning (SURVEY §7 "static shapes").

        The wav2vec2 encode is the only waveform-length-dependent program; its
        input is padded up to a multiple of `bucket_s` seconds by TILING the
        waveform (wrap padding keeps the per-channel GroupNorm time statistics
        of the feature extractor stationary, unlike zero padding), normalized
        with the TRUE waveform's mean/var, and the embedding sliced back to
        the true frame count. Tail-of-clip embeddings can differ slightly from
        the unbucketed path (bidirectional attention sees the wrap pad) — the
        same approximation transformers makes when batching unequal lengths.
        Interp + windowing run on host; the audio projection runs in fixed
        `proj_chunk` frame chunks (exact). Net effect: a new clip duration
        compiles ZERO new programs once one clip per bucket has run.
        """
        t_true = int(np.shape(waveform)[0])
        bucket = max(int(bucket_s * sample_rate), 1)
        t_pad = -(-t_true // bucket) * bucket
        wf = np.asarray(waveform, np.float32)
        if self.m.wav2vec2_config.do_normalize:
            # host-side analog of models.wav2vec2.normalize_waveform, using the
            # TRUE waveform's statistics (before the wrap pad below)
            wf = (wf - wf.mean()) / np.sqrt(wf.var() + 1e-7)
        if t_pad > t_true:
            reps = -(-t_pad // t_true)
            wf = np.tile(wf, reps)[:t_pad]
        n_true = self.m.wav2vec2_config.num_output_frames(t_true)

        emb = self._wav2vec2_encode_prenorm(
            self.params["wav2vec2"], jnp.asarray(wf, self.m.dtype)[None])
        emb = emb[:n_true]

        windows = audio_frame_windows(emb, video_length, num_pad)  # eager, host-driven
        p_aproj = self.params["audio_projection"]
        outs = []
        for i in range(0, video_length, proj_chunk):
            sl = windows[i : i + proj_chunk]
            if sl.shape[0] < proj_chunk:
                pad = proj_chunk - sl.shape[0]
                sl = jnp.concatenate([sl, jnp.zeros((pad,) + sl.shape[1:], sl.dtype)])
                outs.append(self._audio_projection_chunk(p_aproj, sl)[: proj_chunk - pad])
            else:
                outs.append(self._audio_projection_chunk(p_aproj, sl))
        return jnp.concatenate(outs, axis=0)

    @functools.partial(jax.jit, static_argnums=0)
    def _decode_chunk(self, p_vae, latents: jax.Array) -> jax.Array:
        img = self.vae.apply(p_vae, latents / LATENT_SCALE, method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    @functools.partial(jax.jit, static_argnums=0)
    def _to_uint8(self, video: jax.Array) -> jax.Array:
        return (jnp.clip(video.astype(jnp.float32), 0.0, 1.0) * 255).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=0)
    def _to_yuv420(self, video: jax.Array):
        """(F, H, W, 3) RGB in [0,1] -> studio-swing BT.601 YUV420 planes
        (Y uint8 (F,H,W), U/V uint8 (F,H/2,W/2), 2x2-mean chroma).

        This is the exact conversion the mp4 encode needs (the container is
        YUV420 regardless), moved ON DEVICE: the host link then carries
        1.5 B/px instead of 3 B/px — on the ~10 MB/s axon tunnel the video
        download halves from ~10 s to ~5 s per 124-frame clip, and the native
        encoder (utils.media_native.NativeVideoEncoder) consumes the planes
        with no host colorspace work at all."""
        x = jnp.clip(video.astype(jnp.float32), 0.0, 1.0) * 255.0
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
        u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
        v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
        f, h, w = y.shape
        u = u.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        v = v.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        yq = jnp.clip(jnp.round(y), 16, 235).astype(jnp.uint8)
        uq = jnp.clip(jnp.round(u), 16, 240).astype(jnp.uint8)
        vq = jnp.clip(jnp.round(v), 16, 240).astype(jnp.uint8)
        return yq, uq, vq

    def decode_latents(self, latents: jax.Array, chunk: int = 16,
                       median_filter: bool = False, as_uint8: bool = False,
                       as_yuv420: bool = False) -> np.ndarray:
        """(L, h, w, 4) -> (L, H, W, 3), chunked over frames.

        The decoded video stays device-resident until the final transfers: the
        axon tunnel moves ~10 MB/s device->host, so per-chunk fp32 downloads
        (390 MB at 124x512x512) would dominate end-to-end time. The median
        filter (reference save_video's flicker removal) and the uint8
        conversion therefore run ON DEVICE; `as_uint8` downloads 4x less, in
        per-chunk transfers started with copy_to_host_async so the download of
        chunk i overlaps the decode/filter compute of chunks i+1.. (the whole
        post-denoise tail costs ~max(compute, transfer) instead of their sum).
        `as_yuv420` goes further: the BT.601 YUV420 conversion the mp4 encode
        needs anyway runs on device and only the planes download — 1.5 B/px,
        another 2x less transfer; returns (Y, U, V) uint8 arrays for
        media.save_video_yuv / the native encoder.
        Returns float32 in [0, 1] unless as_uint8/as_yuv420."""
        if as_uint8 and as_yuv420:
            raise ValueError("pick one of as_uint8 / as_yuv420")
        n = latents.shape[0]

        def dec(i):
            sl = latents[i * chunk : (i + 1) * chunk]
            core = sl.shape[0]
            if core < chunk:  # pad to keep one compiled shape
                sl = jnp.concatenate([sl, jnp.zeros((chunk - core,) + sl.shape[1:], sl.dtype)])
            return with_compile_retries(self._decode_chunk, self.params["vae"], sl,
                                        label="vae decode"), core

        if (as_uint8 or as_yuv420) and not (median_filter and n <= 2):
            # fully pipelined: decode chunk i+1 is enqueued before chunk i's
            # filter + uint8/yuv + async download, so the ~10 MB/s tunnel
            # transfers overlap the remaining decode/filter compute instead
            # of starting only after the whole video is decoded
            from .media import _median_core

            def emit(piece, core):
                packed = self._to_yuv420(piece) if as_yuv420 else self._to_uint8(piece)
                for leaf in jax.tree_util.tree_leaves(packed):
                    try:
                        leaf.copy_to_host_async()
                    except Exception:
                        pass  # transfer still happens (blocking) in np.asarray
                return (packed, core)

            host_chunks = []
            if not median_filter:
                for i in range(-(-n // chunk)):
                    cur, core = dec(i)
                    host_chunks.append(emit(cur, core))
            else:
                prev = None
                prev_tail = None  # frame just before the previous chunk
                for i in range(-(-n // chunk)):
                    cur, core = dec(i)
                    if prev is not None:
                        p, _ = prev
                        left = prev_tail if prev_tail is not None else p[1:2]
                        piece = jnp.concatenate([left, p, cur[0:1]], axis=0)
                        host_chunks.append(emit(_median_core(piece), chunk))
                        prev_tail = p[chunk - 1 : chunk]
                    prev = (cur, core)
                # last chunk: constant-shape reflected halo (exact
                # median_filter_3d index semantics). The reflected end frame
                # reflect(n) = n-2 lives in the PREVIOUS chunk when core == 1,
                # so a positional slice p[core-2:core-1] would be empty there
                # (silently dropping the last frame); gathering through a
                # host-computed index vector of fixed length chunk+2 handles
                # every core in [1, chunk] and keeps ONE compiled program per
                # chunk size regardless of video_length % chunk.
                p, core = prev
                left = prev_tail if prev_tail is not None else p[1:2]
                stacked = jnp.concatenate([left, p], axis=0)  # (chunk+1, ...)
                start = n - core  # global index of p[0]
                g = np.arange(start - 1, start + chunk + 1)
                g = np.abs(g)  # reflect at the clip start
                g = np.where(g >= n, 2 * (n - 1) - g, g)  # reflect at the end
                g = np.clip(g, 0, n - 1)
                local = np.clip(g - (start - 1), 0, chunk)  # discarded tail stays in-bounds
                piece = stacked[jnp.asarray(local)]
                host_chunks.append(emit(_median_core(piece), core))
            if as_yuv420:
                planes = []
                for j in range(3):
                    planes.append(np.concatenate(
                        [np.asarray(c[j])[:core] for c, core in host_chunks], axis=0))
                return tuple(planes)
            return np.concatenate([np.asarray(c)[:core] for c, core in host_chunks], axis=0)

        outs = []
        for i in range(-(-n // chunk)):
            cur, core = dec(i)
            outs.append(cur if core == chunk else cur[:core])
        video = jnp.concatenate(outs, axis=0)

        if as_uint8 or as_yuv420:
            # only the degenerate filtered n<=2 clip reaches here (the guard
            # above routes every other packed case through the pipelined
            # branch): whole-video filter, one download
            from .media import median_filter_3d

            video = median_filter_3d(video)
            if as_yuv420:
                return tuple(np.asarray(p) for p in self._to_yuv420(video))
            return np.asarray(self._to_uint8(video))

        if median_filter:
            from .media import median_filter_3d_chunked

            video = median_filter_3d_chunked(video)
        return np.asarray(video, dtype=np.float32)

    # ---------------------------------------------------------- denoise step

    def _build_group_programs(self, num_inference_steps: int, guidance_scale: float,
                              window_group: int, win_size: int, pregathered: bool = False,
                              eta: float = 0.0, sampler: str = "ddim"):
        """Streamed mode: two small reusable programs instead of one fused
        per-video-length step.

        `group_step(acc, latents, t, w_idx, w_weights, cond)` runs the UNet on
        one window group and scatter-adds weighted predictions into `acc`;
        `ddim(acc, t, latents)` applies the scheduler. The same compiled
        programs serve every group, timestep and video length — essential
        here because the axon remote-compile service handles only
        moderately-sized programs (and first compiles are minutes-long).

        `pregathered`: kps_feat arrives already gathered to (g, win, ...) —
        the save_memory path keeps the full-video kps features on HOST (the
        reference's --save_gpu_memory analog, v_express_pipeline.py:473-483)
        and ships only the current window group to the device.
        """
        do_cfg = guidance_scale > 1.0
        unet = self.denoising_unet
        unet_params = self.params["denoising_unet"]
        dt = self.m.dtype

        @jax.jit
        def group_step(acc, latents, t, w_idx, w_weights, kps_feat, audio_tok, ref_feats,
                       ref_scale, audio_scale):
            lat = latents[w_idx].astype(dt)
            kps = (kps_feat if pregathered else kps_feat[w_idx]).astype(dt)
            aud = audio_tok[w_idx].astype(dt)
            if do_cfg:
                lat = jnp.concatenate([lat, lat], axis=0)
                kps = jnp.concatenate([jnp.zeros_like(kps), kps], axis=0)
                aud = jnp.concatenate([jnp.zeros_like(aud), aud], axis=0)
            pred = unet.apply(
                unet_params, lat, jnp.broadcast_to(t, (lat.shape[0],)), aud, ref_feats,
                kps, ref_scale, audio_scale, zero_uncond_kv=do_cfg,
            )
            if do_cfg:
                uncond, cond_p = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond_p - uncond)
            pred = pred.astype(jnp.float32) * w_weights[..., None, None, None]
            return acc.at[w_idx].add(pred)

        return group_step, self._build_sampler_jit(num_inference_steps, eta, sampler)

    def _build_sampler_jit(self, num_inference_steps: int, eta: float, sampler: str):
        """The per-step latent-update jit shared by the streamed modes:
        DDIM `(acc, t, latents[, noise_key]) -> latents` (traced timestep) or
        DPM-Solver++ 2M `(acc, idx, latents, prev_x0, has_prev) -> (latents,
        prev_x0, has_prev)` (traced grid index, explicit multistep state)."""
        if sampler == "dpmpp_2m":
            from ..diffusion.dpm_solver import DPMSolverMultistepScheduler

            dpm = DPMSolverMultistepScheduler(self.scheduler.config)
            return jax.jit(dpm.build_step(num_inference_steps))

        @jax.jit
        def ddim(acc, t, latents, noise_key=None):
            return self.scheduler.step(acc, t, latents, num_inference_steps,
                                       eta=eta, noise_key=noise_key)

        return ddim

    def _build_piecewise_programs(self, num_inference_steps: int, guidance_scale: float,
                                  pregathered: bool = False, eta: float = 0.0,
                                  sampler: str = "ddim"):
        """Piecewise-streamed mode: gather/CFG and scatter/DDIM are tiny jits;
        the UNet itself runs per-block via PiecewiseUNetRunner (the axon
        remote-compile service cannot build monolithic SD-scale programs)."""
        do_cfg = guidance_scale > 1.0
        dt = self.m.dtype
        # the SHARED per-pipeline runner: its per-block jits are independent
        # of (num_inference_steps, sampler, guidance_scale), so every cache
        # entry reuses ONE set of compiled UNet block programs — a fresh
        # runner per entry duplicated every block executable on device
        # (measured r4: a process that ran 12-step dpm then 25-step ddim had
        # the second run ~20% slower under the duplicated-program pressure)
        runner = self.piecewise_runner

        @jax.jit
        def gather(latents, w_idx, kps_feat, audio_tok):
            lat = latents[w_idx].astype(dt)
            kps = (kps_feat if pregathered else kps_feat[w_idx]).astype(dt)
            aud = audio_tok[w_idx].astype(dt)
            if do_cfg:
                lat = jnp.concatenate([lat, lat], axis=0)
                kps = jnp.concatenate([jnp.zeros_like(kps), kps], axis=0)
                aud = jnp.concatenate([jnp.zeros_like(aud), aud], axis=0)
            return lat, kps, aud

        @jax.jit
        def combine_scatter(acc, pred, w_idx, w_weights):
            if do_cfg:
                uncond, cond_p = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond_p - uncond)
            pred = pred.astype(jnp.float32) * w_weights[..., None, None, None]
            return acc.at[w_idx].add(pred)

        def group_step(acc, latents, t, w_idx, w_weights, kps_feat, audio_tok, ref_feats,
                       ref_scale, audio_scale):
            lat, kps, aud = gather(latents, w_idx, kps_feat, audio_tok)
            pred = runner.unet3d(
                self.params["denoising_unet"], lat,
                jnp.broadcast_to(t, (lat.shape[0],)), aud, ref_feats, kps,
                ref_scale, audio_scale, zero_uncond_kv=do_cfg,
            )
            return combine_scatter(acc, pred, w_idx, w_weights)

        return group_step, self._build_sampler_jit(num_inference_steps, eta, sampler)

    def _denoise_streamed(self, latents, timesteps, windows, inv_counts, kps_feat,
                          audio_tok, ref_feats, ref_scale, audio_scale,
                          num_inference_steps, guidance_scale, window_group,
                          progress_callback=None, piecewise=False, save_memory=False,
                          kps_raw_host=None, eta=0.0, noise_rng=None, sampler="ddim"):
        n_windows, win_size = windows.shape
        g = min(window_group, n_windows)
        n_groups = -(-n_windows // g)
        pad = n_groups * g - n_windows
        win_idx = np.concatenate([windows, np.zeros((pad, win_size), np.int32)]) if pad else windows
        win_mask = np.concatenate([np.ones(n_windows, np.float32), np.zeros(pad, np.float32)])
        win_w = (inv_counts[win_idx] * win_mask[:, None]).reshape(n_groups, g, win_size)
        win_idx = win_idx.reshape(n_groups, g, win_size).astype(np.int32)

        cache_key = ("piecewise" if piecewise else "group",
                     num_inference_steps, float(guidance_scale), g, win_size, save_memory,
                     float(eta), sampler)
        if cache_key not in self._step_cache:
            if piecewise:
                self._step_cache[cache_key] = self._build_piecewise_programs(
                    num_inference_steps, guidance_scale, pregathered=save_memory,
                    eta=eta, sampler=sampler,
                )
            else:
                self._step_cache[cache_key] = self._build_group_programs(
                    num_inference_steps, guidance_scale, g, win_size,
                    pregathered=save_memory, eta=eta, sampler=sampler,
                )
        group_step, samp = self._step_cache[cache_key]

        idx_dev = [jnp.asarray(win_idx[i]) for i in range(n_groups)]
        w_dev = [jnp.asarray(win_w[i]) for i in range(n_groups)]

        # save_memory (the reference's --save_gpu_memory analog,
        # v_express_pipeline.py:473-483: conditioning lives on CPU): guider
        # features are computed per window group ON THE FLY — no O(video)
        # feature tensor in HBM. The raw uint8 window groups are CACHED on
        # device when they fit a modest budget (924 frames ≈ 0.9 GB uint8 vs
        # 2.4 GB bf16 features). Measured (r4, tools/bench_savemem.py, 304
        # frames): cache on 271 s vs off 265 s — the ~19 MB/(step,group)
        # upload fully OVERLAPS the ~0.7 s window-step compute, so the cache
        # buys no steady-state time on a healthy host. It is kept (default
        # 2 GiB) because with it the host-side gather+upload runs once per
        # group instead of once per (step,group) — 46 vs 1150 passes on the
        # 924-frame clip — which insulates the long pass from this host's
        # 0.1-1.6 GB/s memcpy weather. VEXPRESS_SAVEMEM_DEV_CACHE_MB=0
        # streams every step: bounded HBM at any clip length.
        raw_groups = None
        if save_memory:
            budget = int(os.environ.get("VEXPRESS_SAVEMEM_DEV_CACHE_MB", "2048")) << 20
            win_table_bytes = kps_raw_host.dtype.itemsize * kps_raw_host[0].size \
                * int(win_idx.size)
            if win_table_bytes <= budget:
                raw_groups = [jnp.asarray(kps_raw_host[win_idx[gi]])
                              for gi in range(n_groups)]

        # multistep (dpmpp_2m) state; idx0 > 0 when `strength` trimmed the
        # schedule (the grid tables inside `samp` cover the FULL grid)
        idx0 = num_inference_steps - len(timesteps)
        prev_x0, has_prev = jnp.zeros_like(latents), jnp.zeros((), bool)
        for i, t in enumerate(timesteps):
            tt = jnp.asarray(int(t))
            acc = jnp.zeros_like(latents, dtype=jnp.float32)
            for gi in range(n_groups):
                if save_memory:
                    raw = (raw_groups[gi] if raw_groups is not None
                           else jnp.asarray(kps_raw_host[win_idx[gi]]))
                    kps_arg = with_compile_retries(
                        self._kps_features_window,
                        self.params["v_kps_guider"], raw,
                        label="windowed kps guider")
                else:
                    kps_arg = kps_feat
                acc = with_compile_retries(
                    group_step, acc, latents, tt, idx_dev[gi], w_dev[gi], kps_arg,
                    audio_tok, ref_feats, ref_scale, audio_scale, label="group step")
            if sampler == "dpmpp_2m":
                latents, prev_x0, has_prev = with_compile_retries(
                    samp, acc, jnp.asarray(idx0 + i), latents, prev_x0, has_prev,
                    label="dpm step")
            elif eta != 0.0:
                noise_rng, sub = jax.random.split(noise_rng)
                latents = with_compile_retries(samp, acc, tt, latents, sub,
                                               label="ddim step")
            else:
                latents = with_compile_retries(samp, acc, tt, latents, label="ddim step")
            if progress_callback is not None:
                latents.block_until_ready()
                progress_callback(i, int(t))
        return latents

    def _denoise_sharded_piecewise(self, latents, timesteps, win_idx, win_w,
                                   kps_feat, audio_tok, ref_feats, ref_scale,
                                   audio_scale, num_inference_steps,
                                   guidance_scale, mesh, progress_callback=None,
                                   kps_pregathered=False, eta=0.0, noise_rng=None,
                                   sampler="ddim"):
        """Window-parallel inference built on the per-block piecewise programs.

        The padded window table is the UNet batch axis: `gather` emits it
        SHARDED over the mesh ("dp"), every per-block program then runs SPMD
        via GSPMD sharding propagation (batch data-parallel, no internal
        collectives), and the scatter-add combine all-reduces the weighted
        window predictions back into replicated latents. This is the
        multi-chip mode that actually deploys on TPU: the monolithic-UNet
        shard_map step (window_parallel_step) cannot be built by the remote
        compile service for SD-scale programs, while these per-block programs
        are the same ones the streamed path already compiles. Window tables
        ride as runtime args, so one compiled program set serves every clip
        in a length bucket.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        do_cfg = guidance_scale > 1.0
        dt = self.m.dtype
        runner = self.piecewise_runner
        win_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())

        cache_key = ("sharded_piecewise", num_inference_steps, float(guidance_scale),
                     win_idx.shape, int(latents.shape[0]), tuple(mesh.shape.items()),
                     kps_pregathered, float(eta), sampler)
        if cache_key not in self._step_cache:
            @functools.partial(jax.jit, out_shardings=(win_sh, win_sh, win_sh))
            def gather(latents, w_idx, kps_feat, audio_tok):
                lat = latents[w_idx].astype(dt)
                # save_memory: kps arrives as the window-table feature buffer
                # (already gathered AND mesh-sharded; _kps_window_features_sharded)
                kps = (kps_feat if kps_pregathered else kps_feat[w_idx]).astype(dt)
                aud = audio_tok[w_idx].astype(dt)
                if do_cfg:
                    lat = jnp.concatenate([lat, lat], axis=0)
                    kps = jnp.concatenate([jnp.zeros_like(kps), kps], axis=0)
                    aud = jnp.concatenate([jnp.zeros_like(aud), aud], axis=0)
                return lat, kps, aud

            @functools.partial(jax.jit, out_shardings=repl)
            def combine_scatter(pred, w_idx, w_weights, latents):
                if do_cfg:
                    uncond, cond_p = jnp.split(pred, 2, axis=0)
                    pred = uncond + guidance_scale * (cond_p - uncond)
                pred = pred.astype(jnp.float32) * w_weights[..., None, None, None]
                acc = jnp.zeros_like(latents, dtype=jnp.float32)
                return acc.at[w_idx].add(pred)

            if sampler == "dpmpp_2m":
                from ..diffusion.dpm_solver import DPMSolverMultistepScheduler

                dpm_step = DPMSolverMultistepScheduler(
                    self.scheduler.config).build_step(num_inference_steps)
                samp = functools.partial(jax.jit, out_shardings=(repl, repl, repl))(
                    dpm_step)
            else:
                @functools.partial(jax.jit, out_shardings=repl)
                def samp(acc, t, latents, noise_key=None):
                    # replicated latents + replicated key: every device draws
                    # the same stochastic-DDIM noise
                    return self.scheduler.step(acc, t, latents, num_inference_steps,
                                               eta=eta, noise_key=noise_key)

            self._step_cache[cache_key] = (gather, combine_scatter, samp)
        gather, combine_scatter, samp = self._step_cache[cache_key]

        # conditioning/latents/params replicated across the mesh; window
        # tables too (the gather/scatter index math is cheap and local)
        latents = jax.device_put(latents, repl)
        if not kps_pregathered:  # the pregathered buffer is ALREADY win-sharded
            kps_feat = jax.device_put(kps_feat, repl)
        audio_tok = jax.device_put(audio_tok, repl)
        ref_feats = tuple(jax.device_put(r, repl) for r in ref_feats)
        idx_dev = jax.device_put(np.asarray(win_idx), repl)
        w_dev = jax.device_put(np.asarray(win_w), repl)
        pkey = ("unet_params_repl", self._params_gen, tuple(mesh.shape.items()))
        if pkey not in self._step_cache:
            self._step_cache[pkey] = jax.device_put(self.params["denoising_unet"], repl)
        unet_params = self._step_cache[pkey]

        idx0 = num_inference_steps - len(timesteps)  # strength-trimmed grid
        prev_x0 = jax.device_put(jnp.zeros_like(latents), repl)
        has_prev = jax.device_put(jnp.zeros((), bool), repl)
        for i, t in enumerate(timesteps):
            tt = jnp.asarray(int(t))
            lat_w, kps_w, aud_w = with_compile_retries(
                gather, latents, idx_dev, kps_feat, audio_tok, label="sharded gather")
            pred = runner.unet3d(
                unet_params, lat_w,
                jnp.broadcast_to(tt, (lat_w.shape[0],)), aud_w, ref_feats, kps_w,
                ref_scale, audio_scale, zero_uncond_kv=do_cfg,
            )
            acc = with_compile_retries(
                combine_scatter, pred, idx_dev, w_dev, latents, label="sharded combine")
            if sampler == "dpmpp_2m":
                latents, prev_x0, has_prev = with_compile_retries(
                    samp, acc, jnp.asarray(idx0 + i), latents, prev_x0, has_prev,
                    label="sharded dpm")
            elif eta != 0.0:
                noise_rng, sub = jax.random.split(noise_rng)
                latents = with_compile_retries(samp, acc, tt, latents, sub,
                                               label="sharded ddim")
            else:
                latents = with_compile_retries(samp, acc, tt, latents, label="sharded ddim")
            if progress_callback is not None:
                progress_callback(i, int(t))
        return latents

    def _make_window_predict(self, guidance_scale: float):
        """The real-UNet window predict closure shared by the fused and the
        mesh-sharded denoise paths: (g, win, h, w, 4) window latents + full
        conditioning pytree -> CFG-combined noise predictions."""
        do_cfg = guidance_scale > 1.0
        unet = self.denoising_unet
        unet_params = self.params["denoising_unet"]
        dt = self.m.dtype

        def predict(lat, t, w_idx, cond):
            kps_feat, audio_tok, ref_feats, ref_scale, audio_scale = cond
            lat = lat.astype(dt)
            kps = kps_feat[w_idx].astype(dt)
            aud = audio_tok[w_idx].astype(dt)
            if do_cfg:
                lat = jnp.concatenate([lat, lat], axis=0)
                kps = jnp.concatenate([jnp.zeros_like(kps), kps], axis=0)
                aud = jnp.concatenate([jnp.zeros_like(aud), aud], axis=0)
            pred = unet.apply(
                unet_params, lat, jnp.broadcast_to(t, (lat.shape[0],)), aud, ref_feats,
                kps, ref_scale, audio_scale, zero_uncond_kv=do_cfg,
            )
            if do_cfg:
                uncond, cond_p = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond_p - uncond)
            return pred

        return predict

    def _build_denoise_step(
        self,
        windows: np.ndarray,
        inv_counts: np.ndarray,
        num_inference_steps: int,
        guidance_scale: float,
        window_group: int,
        eta: float = 0.0,
        sampler: str = "ddim",
    ):
        """One jitted denoise step over all context windows of the video."""
        predict = self._make_window_predict(guidance_scale)
        if sampler == "dpmpp_2m":
            from ..diffusion.dpm_solver import DPMSolverMultistepScheduler

            dpm_step = DPMSolverMultistepScheduler(
                self.scheduler.config).build_step(num_inference_steps)
            step_fn = build_blended_denoise_step(
                predict, self.scheduler, windows, inv_counts, num_inference_steps,
                window_group, sampler_step=dpm_step,
            )

            def wrapped_dpm(latents, step_idx, t, kps_feat, audio_tok, ref_feats,
                            ref_scale, audio_scale, prev_x0, has_prev):
                return step_fn(latents, step_idx, t,
                               (kps_feat, audio_tok, ref_feats, ref_scale, audio_scale),
                               prev_x0, has_prev)

            return jax.jit(wrapped_dpm)

        step_fn = build_blended_denoise_step(
            predict, self.scheduler, windows, inv_counts, num_inference_steps,
            window_group, eta=eta,
        )

        def wrapped(latents, t, kps_feat, audio_tok, ref_feats, ref_scale, audio_scale,
                    noise_key=None):
            return step_fn(latents, t, (kps_feat, audio_tok, ref_feats, ref_scale, audio_scale),
                           noise_key=noise_key)

        return jax.jit(wrapped)

    def _build_sharded_denoise_step(
        self,
        total_windows: int,
        win_size: int,
        num_inference_steps: int,
        guidance_scale: float,
        window_group: int,
        mesh,
        eta: float = 0.0,
        sampler: str = "ddim",
    ):
        """Window-parallel denoise step: the window axis is sharded over the
        device mesh (each chip runs the UNet on its window shard; weighted
        noise predictions are psum'd). This does properly what the reference's
        `--do_multi_devices_inference` flag only gestures at
        (/root/reference/inference.py:143-149). The window index/weight tables
        are runtime arguments, so the compiled program is keyed on BUCKETED
        shapes only — a new clip length in the same bucket reuses it."""
        from ..parallel.mesh import window_parallel_step_dynamic

        predict = self._make_window_predict(guidance_scale)
        if sampler == "dpmpp_2m":
            from ..diffusion.dpm_solver import DPMSolverMultistepScheduler

            dpm_step = DPMSolverMultistepScheduler(
                self.scheduler.config).build_step(num_inference_steps)
            step_fn = window_parallel_step_dynamic(
                predict, self.scheduler, total_windows, win_size,
                num_inference_steps, mesh, window_group=window_group,
                sampler_step=dpm_step,
            )

            def wrapped_dpm(latents, step_idx, t, win_idx, win_w, kps_feat,
                            audio_tok, ref_feats, ref_scale, audio_scale,
                            prev_x0, has_prev):
                return step_fn(latents, step_idx, t, win_idx, win_w,
                               (kps_feat, audio_tok, ref_feats, ref_scale, audio_scale),
                               prev_x0, has_prev)

            return jax.jit(wrapped_dpm)

        step_fn = window_parallel_step_dynamic(
            predict, self.scheduler, total_windows, win_size, num_inference_steps,
            mesh, window_group=window_group, eta=eta,
        )

        def wrapped(latents, t, win_idx, win_w, kps_feat, audio_tok, ref_feats,
                    ref_scale, audio_scale, noise_key=None):
            return step_fn(latents, t, win_idx, win_w,
                           (kps_feat, audio_tok, ref_feats, ref_scale, audio_scale),
                           noise_key=noise_key)

        return jax.jit(wrapped)

    # ----------------------------------------------------------------- main

    def __call__(
        self,
        reference_image: np.ndarray,  # (H, W, 3) float [0,1]
        kps_images: np.ndarray,  # (L, H, W, 3) float [0,1] (or uint8)
        audio_waveform: np.ndarray,  # (T,) float 16 kHz mono
        width: int = 512,
        height: int = 512,
        video_length: Optional[int] = None,
        num_inference_steps: int = 25,
        guidance_scale: float = 3.5,
        strength: float = 1.0,
        eta: float = 0.0,  # stochastic DDIM (Song et al. eq. 12); 0 = reference default
        sampler: str = "ddim",  # or "dpmpp_2m" (DPM-Solver++ 2M, ~half the steps)
        context_schedule: str = "uniform",  # the only schedule the reference ships
        context_frames: int = 24,
        context_overlap: int = 4,
        reference_attention_weight: float = 0.95,
        audio_attention_weight: float = 3.0,
        num_pad_audio_frames: int = 2,
        seed: int = 42,
        window_group: int = 1,
        mode: str = "streamed",
        piecewise: Optional[bool] = None,
        shape_bucketing: Optional[bool] = None,
        save_memory: bool = False,
        mesh=None,
        return_latents: bool = False,
        median_filter: bool = False,  # on-device 3x3x3 flicker filter (save_video's)
        output_uint8: bool = False,  # download uint8 (4x less tunnel traffic)
        output_yuv420: bool = False,  # download YUV420 planes (6x less; native encoder)
        latents: Optional[np.ndarray] = None,  # (L, h, w, 4) initial noise; the
        # reference's prepare_latents override (v_express_pipeline.py:189-224):
        # caller-provided unit noise, scaled by init_noise_sigma here. Used by
        # the cross-framework parity test to share the torch draw.
        progress_callback=None,
    ) -> np.ndarray:
        """Generate a talking-head video. Returns (L, H, W, 3) float32 in
        [0,1], or uint8 when `output_uint8`."""
        if video_length is None:
            video_length = len(kps_images)
        assert len(kps_images) == video_length, (len(kps_images), video_length)
        do_cfg = guidance_scale > 1.0
        dt = self.m.dtype

        if save_memory and mode not in ("streamed", "sharded"):
            raise ValueError("save_memory requires mode='streamed' or 'sharded'")
        if sampler not in ("ddim", "dpmpp_2m"):
            raise ValueError(f"unknown sampler {sampler!r}; choose 'ddim' or 'dpmpp_2m'")
        if sampler == "dpmpp_2m" and eta != 0.0:
            raise ValueError("eta > 0 is the stochastic-DDIM knob; "
                             "dpmpp_2m is a deterministic ODE solver (use eta=0)")

        # a previous save_memory call may have freed the conditioning
        # modules; restore them (one batched upload) before conditioning
        self.ensure_conditioning_params()

        # uint8 kps frames upload raw (4x less tunnel traffic) and normalize
        # on device inside _kps_features; float inputs upload as compute dtype.
        # save_memory keeps the raw frames HOST-resident instead — only the
        # current window group ever uploads (and only its features ever exist).
        kps_images = np.asarray(kps_images)
        kps_dev = None
        if not save_memory:
            kps_dev = (jnp.asarray(kps_images) if kps_images.dtype == np.uint8
                       else jnp.asarray(kps_images, dt))

        # conditioning precompute (one device program each)
        verbose = progress_callback is not None
        with phase("encode reference latent", verbose):
            ref_latent = with_compile_retries(
                self._encode_reference, self.params["vae"],
                jnp.asarray(reference_image, dt), label="vae encode")
            ref_latent.block_until_ready()
        if piecewise is None:
            piecewise = jax.default_backend() == "tpu"
        if shape_bucketing is None:
            # bucketed conditioning avoids minutes-long remote recompiles per
            # new clip duration; exact math (unbucketed) elsewhere
            shape_bucketing = jax.default_backend() == "tpu"
        with phase("reference-net features", verbose):
            ref_fn = self._reference_features_piecewise if piecewise else self._reference_features
            ref_feats = with_compile_retries(
                ref_fn, self.params["reference_net"], ref_latent, do_cfg,
                label="reference net")
            ref_feats[0].block_until_ready()
        kps_feat = None
        if not save_memory:
            with phase("kps features", verbose):
                if shape_bucketing:
                    kps_feat = with_compile_retries(
                        self._kps_features_chunked, kps_dev, label="kps guider")
                else:
                    kps_feat = with_compile_retries(
                        self._kps_features, self.params["v_kps_guider"],
                        kps_dev, label="kps guider")
                kps_feat.block_until_ready()
        with phase("audio tokens", verbose):
            if shape_bucketing:
                audio_tok = self._audio_tokens_bucketed(
                    np.asarray(audio_waveform), video_length, num_pad_audio_frames)
            else:
                audio_tok = with_compile_retries(
                    self._audio_tokens, self.params["wav2vec2"],
                    self.params["audio_projection"],
                    jnp.asarray(audio_waveform, dt), video_length,
                    num_pad_audio_frames, label="audio encoder")
            audio_tok.block_until_ready()

        # --save_gpu_memory parity: the conditioning tensors (ref banks,
        # audio tokens) are now materialized; free the modules that produced
        # them so the denoise loop runs leaner (reference deletes these at
        # v_express_pipeline.py:473-483). ~all of the reference-net + wav2vec2
        # + audio-projection params leave HBM; restored on the next call.
        self.last_released_cond_mib = 0.0
        if save_memory:
            # block_until_ready can return early through the axon tunnel
            # (CLAUDE.md); only a device_get truly serializes. Fetch one
            # scalar from the last consumers' outputs so no conditioning
            # program can still be reading the params we are about to delete.
            jax.device_get(ref_feats[-1][(0,) * ref_feats[-1].ndim])
            jax.device_get(audio_tok[(0,) * audio_tok.ndim])
            self.last_released_cond_mib = self.release_conditioning_params()

        if context_schedule != "uniform":
            # parity with the reference's get_context_scheduler
            # (pipelines/context.py:62-66): only "uniform" exists
            raise ValueError(f"unknown context_schedule {context_schedule!r}")
        windows, inv_counts = compute_context_windows(video_length, context_frames, context_overlap)

        key = jax.random.PRNGKey(seed)
        h, w = height // 8, width // 8
        if latents is not None:
            latents = jnp.asarray(latents, jnp.float32)
            if latents.shape != (video_length, h, w, 4):
                raise ValueError(
                    f"latents shape {latents.shape} != {(video_length, h, w, 4)}")
        else:
            latents = jax.random.normal(key, (video_length, h, w, 4), jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma

        # length bucketing for the L-shaped glue programs (gather, scatter-add,
        # DDIM): pad the latent/conditioning buffers up to a frame bucket so a
        # new clip duration reuses the compiled programs (remote compiles cost
        # minutes; SURVEY §7 static shapes). Exact: the window schedule and
        # blend weights are computed on the TRUE length, windows only index
        # frames < video_length, the DDIM update is elementwise (pad frames
        # stay zero), and the pad is sliced off before decode.
        l_pad = 0
        if shape_bucketing and mode in ("streamed", "sharded"):
            bucket = 32
            l_pad = -(-video_length // bucket) * bucket - video_length
            if l_pad:
                def pad_frames(x):
                    return jnp.concatenate(
                        [x, jnp.zeros((l_pad,) + x.shape[1:], x.dtype)], axis=0)

                latents = pad_frames(latents)
                audio_tok = pad_frames(audio_tok)
                if kps_feat is not None:
                    kps_feat = pad_frames(kps_feat)

        ref_scale = jnp.asarray(reference_attention_weight, dt)
        audio_scale = jnp.asarray(audio_attention_weight, dt)
        timesteps = self.scheduler.timesteps(num_inference_steps)
        # partial denoise: run only the LAST `strength` fraction of the
        # schedule (the reference's get_timesteps,
        # v_express_pipeline.py:334-341; latents stay init-noise-scaled
        # Gaussian regardless — prepare_latents:223 ignores strength).
        # scheduler.step keeps the FULL num_inference_steps so the per-step
        # timestep delta matches the reference's set_timesteps spacing.
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        if strength < 1.0:
            init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
            t_start = max(num_inference_steps - init_timestep, 0)
            timesteps = timesteps[t_start:]

        if mode == "streamed":
            latents = self._denoise_streamed(
                latents, timesteps, windows, inv_counts, kps_feat, audio_tok, ref_feats,
                ref_scale, audio_scale, num_inference_steps, guidance_scale, window_group,
                progress_callback, piecewise=piecewise, save_memory=save_memory,
                kps_raw_host=kps_images if save_memory else None,
                eta=eta, noise_rng=jax.random.fold_in(key, 1) if eta != 0.0 else None,
                sampler=sampler,
            )
            if l_pad:
                latents = latents[:video_length]
        elif mode == "fused":
            cache_key = ("fused", video_length, context_frames, context_overlap,
                         num_inference_steps, float(guidance_scale), window_group,
                         float(eta), sampler)
            if cache_key not in self._step_cache:
                self._step_cache[cache_key] = self._build_denoise_step(
                    windows, inv_counts, num_inference_steps, guidance_scale, window_group,
                    eta=eta, sampler=sampler,
                )
            step = self._step_cache[cache_key]
            noise_rng = jax.random.fold_in(key, 1) if eta != 0.0 else None
            idx0 = num_inference_steps - len(timesteps)  # strength-trimmed grid
            prev_x0, has_prev = jnp.zeros_like(latents), jnp.zeros((), bool)
            for i, t in enumerate(timesteps):
                if sampler == "dpmpp_2m":
                    latents, prev_x0, has_prev = with_compile_retries(
                        step, latents, jnp.asarray(idx0 + i), jnp.asarray(int(t)),
                        kps_feat, audio_tok, ref_feats, ref_scale, audio_scale,
                        prev_x0, has_prev, label="fused denoise step")
                else:
                    extra = ()
                    if eta != 0.0:
                        noise_rng, sub = jax.random.split(noise_rng)
                        extra = (sub,)
                    latents = with_compile_retries(
                        step, latents, jnp.asarray(int(t)), kps_feat, audio_tok, ref_feats,
                        ref_scale, audio_scale, *extra, label="fused denoise step")
                if progress_callback is not None:
                    progress_callback(i, int(t))
        elif mode == "sharded":
            if mesh is None:
                from ..parallel.mesh import create_mesh

                mesh = create_mesh()
            from ..parallel.mesh import pad_window_set

            pad_to = 0
            if shape_bucketing:
                # pad the window table up to the bucket-ceiling clip's window
                # count so every clip in the bucket shares ONE compiled program
                # (pad rows have weight 0; see pad_window_set)
                from .context import uniform_context_windows

                pad_to = len(uniform_context_windows(
                    0, video_length + l_pad, context_frames, 1, context_overlap))
            win_idx_np, win_w_np = pad_window_set(
                windows, inv_counts, mesh.shape["dp"], window_group, pad_to=pad_to)
            if save_memory and not piecewise:
                raise ValueError("save_memory with mode='sharded' requires the "
                                 "piecewise path (the TPU deployment mode)")
            if piecewise:
                # per-block SPMD programs (the mode that deploys on real TPU —
                # the monolithic shard_map UNet cannot be remote-compiled)
                kps_arg = kps_feat
                if save_memory:
                    # window-table guider features, built by streaming host
                    # frames through the guider and stored SHARDED over the
                    # mesh — no O(video) replicated conditioning tensor
                    kps_arg = self._kps_window_features_sharded(
                        kps_images, win_idx_np, mesh)
                latents = self._denoise_sharded_piecewise(
                    latents, timesteps, win_idx_np, win_w_np, kps_arg, audio_tok,
                    ref_feats, ref_scale, audio_scale, num_inference_steps,
                    guidance_scale, mesh, progress_callback,
                    kps_pregathered=save_memory, eta=eta,
                    noise_rng=jax.random.fold_in(key, 1) if eta != 0.0 else None,
                    sampler=sampler,
                )
                if l_pad:
                    latents = latents[:video_length]
                if return_latents:
                    return np.asarray(latents)
                return self.decode_latents(latents, median_filter=median_filter,
                                           as_uint8=output_uint8,
                                           as_yuv420=output_yuv420)
            cache_key = ("sharded", int(latents.shape[0]), win_idx_np.shape,
                         num_inference_steps, float(guidance_scale), window_group,
                         tuple(mesh.shape.items()), float(eta), sampler)
            if cache_key not in self._step_cache:
                self._step_cache[cache_key] = self._build_sharded_denoise_step(
                    int(win_idx_np.shape[0]), int(win_idx_np.shape[1]),
                    num_inference_steps, guidance_scale, window_group, mesh, eta=eta,
                    sampler=sampler,
                )
            step = self._step_cache[cache_key]
            # pin every loop input to the replicated mesh sharding up front:
            # otherwise iteration 1 (single-device inputs) and iteration 2
            # (mesh-replicated outputs) trace two separate programs
            from ..parallel.mesh import replicated

            repl = replicated(mesh)
            latents = jax.device_put(latents, repl)
            kps_feat = jax.device_put(kps_feat, repl)
            audio_tok = jax.device_put(audio_tok, repl)
            ref_feats = tuple(jax.device_put(r, repl) for r in ref_feats)
            ref_scale = jax.device_put(ref_scale, repl)
            audio_scale = jax.device_put(audio_scale, repl)
            idx_dev = jax.device_put(jnp.asarray(win_idx_np), repl)
            w_dev = jax.device_put(jnp.asarray(win_w_np), repl)
            noise_rng = (jax.device_put(jax.random.fold_in(key, 1), repl)
                         if eta != 0.0 else None)
            idx0 = num_inference_steps - len(timesteps)  # strength-trimmed grid
            prev_x0 = jax.device_put(jnp.zeros_like(latents), repl)
            has_prev = jax.device_put(jnp.zeros((), bool), repl)
            for i, t in enumerate(timesteps):
                if sampler == "dpmpp_2m":
                    latents, prev_x0, has_prev = with_compile_retries(
                        step, latents, jnp.asarray(idx0 + i), jnp.asarray(int(t)),
                        idx_dev, w_dev, kps_feat, audio_tok, ref_feats, ref_scale,
                        audio_scale, prev_x0, has_prev, label="sharded denoise step")
                else:
                    extra = ()
                    if eta != 0.0:
                        noise_rng, sub = jax.random.split(noise_rng)
                        extra = (sub,)
                    latents = with_compile_retries(
                        step, latents, jnp.asarray(int(t)), idx_dev, w_dev, kps_feat,
                        audio_tok, ref_feats, ref_scale, audio_scale, *extra,
                        label="sharded denoise step")
                if progress_callback is not None:
                    progress_callback(i, int(t))
            if l_pad:
                latents = latents[:video_length]
        else:
            raise ValueError(f"unknown mode {mode} (use 'streamed', 'fused' or 'sharded')")

        if return_latents:
            return np.asarray(latents)
        return self.decode_latents(latents, median_filter=median_filter,
                                   as_uint8=output_uint8, as_yuv420=output_yuv420)
