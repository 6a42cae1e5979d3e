"""Device-mesh utilities: the TPU-native replacement for the reference's
NCCL/DeepSpeed stack (train_stage.sh:15-25, zero2_config.json).

Three first-class components (SURVEY.md §2.4):
  * DP mesh creation over ICI (`create_mesh`)
  * ZeRO-2-equivalent optimizer-state sharding (`shard_opt_state_zero2`):
    optimizer states are sharded over the DP axis; XLA's SPMD partitioner then
    reduce-scatters gradients into the sharded update computation and
    all-gathers the parameter updates — the collectives DeepSpeed ZeRO-2
    issues manually (allgather_partitions, reduce_scatter, overlap_comm).
  * Window-parallel inference (`window_parallel_step`): context windows are a
    batch axis sharded over the mesh; per-frame blended noise predictions are
    psum'd. This implements properly what the reference's
    `--do_multi_devices_inference` flag only gestures at (inference.py:143-149,
    v_express_pipeline.py:433 — the parameter is unused there).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: the TPU-native replacement for the reference's
    `accelerate launch --num_machines/--machine_rank/--main_process_ip`
    multinode wiring (train_stage.sh:23). After this, jax.devices() is the
    GLOBAL device list, create_mesh() spans all hosts, and pjit collectives
    ride ICI within a slice / DCN across slices.

    With no arguments, jax.distributed.initialize auto-discovers the cluster
    from the TPU environment; explicit args mirror the reference's flags.
    Call once, before any other JAX API. No-op if already initialized.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e):  # idempotent re-init is fine
            raise


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _zero2_spec(leaf, n_shards: int, axis_name: str) -> P:
    """Shard the largest axis divisible by n_shards; replicate otherwise.
    Accepts arrays or ShapeDtypeStructs (so eval_shape trees work — the
    multi-process path births the optimizer state already sharded)."""
    shape = tuple(leaf.shape) if hasattr(leaf, "shape") else np.shape(leaf)
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def shard_opt_state_zero2(opt_state, mesh: Mesh, axis_name: str = "dp"):
    """NamedSharding pytree for an optax state: momenta sharded over DP
    (ZeRO-2 equivalent). Use with jax.jit(..., out_shardings=...) or
    device_put."""
    n = mesh.shape[axis_name]

    def spec_of(leaf):
        return NamedSharding(mesh, _zero2_spec(leaf, n, axis_name))

    return jax.tree_util.tree_map(spec_of, opt_state)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_window_set(
    windows: np.ndarray,
    inv_counts: np.ndarray,
    n_dev: int,
    window_group: int = 1,
    pad_to: int = 0,
) -> tuple:
    """Pad a context-window schedule to a shardable, bucketable size.

    Rounds the window count up to a multiple of n_dev * window_group (and at
    least `pad_to`, so clips whose TRUE window counts differ inside one length
    bucket share ONE compiled program). Pad rows index frame 0 with blend
    weight 0 — they run dead compute but contribute exactly nothing.

    Returns (win_idx [total, win] int32, win_w [total, win] float32).
    """
    n_windows, win_size = windows.shape
    quantum = n_dev * window_group
    total = -(-max(n_windows, pad_to) // quantum) * quantum
    pad = total - n_windows
    win_idx = np.concatenate([windows, np.zeros((pad, win_size), np.int32)]) if pad else windows
    win_mask = np.concatenate([np.ones(n_windows, np.float32), np.zeros(pad, np.float32)])
    win_w = inv_counts[win_idx] * win_mask[:, None]  # (total, win)
    return win_idx.astype(np.int32), win_w.astype(np.float32)


def window_parallel_step_dynamic(
    predict_fn,
    scheduler,
    total_windows: int,
    win_size: int,
    num_inference_steps: int,
    mesh: Mesh,
    axis_name: str = "dp",
    window_group: int = 1,
    eta: float = 0.0,
    sampler_step=None,
):
    """Build a mesh-sharded blended denoise step with RUNTIME window tables.

    The window index/weight tables are arguments of the returned
    `step_fn(latents, t, win_idx, win_w, cond)` rather than baked-in
    constants, so one compiled program serves every clip whose bucketed
    shapes match (VERDICT r2 item 7: the sharded mode recompiled minutes-long
    per exact video_length). The window axis is sharded over the mesh (each
    chip runs the UNet on its shard; weighted noise predictions are psum'd);
    latents/conditioning stay replicated — they are small next to UNet
    activations.
    """
    shard_map = jax.shard_map

    n_dev = mesh.shape[axis_name]
    if total_windows % (n_dev * window_group):
        raise ValueError(
            f"total_windows {total_windows} must be a multiple of "
            f"n_dev*window_group = {n_dev * window_group}; use pad_window_set()"
        )
    per_dev = total_windows // n_dev
    n_groups_local = per_dev // window_group

    def local_blend(latents, t, idx_shard, w_shard, cond):
        """idx_shard: (per_dev, win) on this device."""
        idx_g = idx_shard.reshape(n_groups_local, window_group, win_size)
        w_g = w_shard.reshape(n_groups_local, window_group, win_size)

        def one_group(acc, gi):
            w_idx = idx_g[gi]
            lat = latents[w_idx]
            pred = predict_fn(lat, t, w_idx, cond)
            pred = pred.astype(jnp.float32) * w_g[gi][..., None, None, None]
            return acc.at[w_idx].add(pred), None

        acc = jnp.zeros_like(latents, dtype=jnp.float32)
        # the carry becomes device-varying after accumulating this device's
        # window shard; mark it as such for shard_map's vma type system
        acc = jax.lax.pcast(acc, (axis_name,), to="varying")
        acc, _ = jax.lax.scan(one_group, acc, jnp.arange(n_groups_local))
        return jax.lax.psum(acc, axis_name)

    sharded_blend = shard_map(
        local_blend,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=P(),
    )

    if sampler_step is not None:
        # multistep sampler (DPM-Solver++): replicated explicit state threaded
        # by the caller; the update runs OUTSIDE shard_map like the DDIM one
        def step_fn_dpm(latents, step_idx, t, win_idx, win_w, cond,
                        prev_x0, has_prev):
            acc = sharded_blend(latents, t, win_idx, win_w, cond)
            return sampler_step(acc, step_idx, latents, prev_x0, has_prev)

        return step_fn_dpm

    def step_fn(latents, t, win_idx, win_w, cond, noise_key=None):
        acc = sharded_blend(latents, t, win_idx, win_w, cond)
        # the DDIM update runs OUTSIDE shard_map on replicated latents; a
        # replicated noise_key draws identical noise on every device
        return scheduler.step(acc, t, latents, num_inference_steps,
                              eta=eta, noise_key=noise_key)

    return step_fn


def window_parallel_step(
    predict_fn,
    scheduler,
    windows: np.ndarray,
    inv_counts: np.ndarray,
    num_inference_steps: int,
    mesh: Mesh,
    axis_name: str = "dp",
    window_group: int = 1,
):
    """Convenience wrapper around `window_parallel_step_dynamic` that closes
    over a fixed window schedule: `step_fn(latents, t, cond)`."""
    win_idx, win_w = pad_window_set(windows, inv_counts, mesh.shape[axis_name], window_group)
    step = window_parallel_step_dynamic(
        predict_fn, scheduler, win_idx.shape[0], win_idx.shape[1],
        num_inference_steps, mesh, axis_name, window_group,
    )

    def step_fn(latents, t, cond):
        return step(latents, t, jnp.asarray(win_idx), jnp.asarray(win_w), cond)

    return step_fn
