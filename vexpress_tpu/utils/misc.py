"""Small utilities mirroring the reference's utils.py and pipelines/utils.py
latent-interpolation hooks."""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """reference utils.py:7-11; returns a JAX PRNG key as the device-side seed."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def linear_interpolation(v1: jax.Array, v2: jax.Array, t: float) -> jax.Array:
    """pipelines/utils.py:31-32."""
    return (1.0 - t) * v1 + t * v2


def slerp(v0: jax.Array, v1: jax.Array, t: float, dot_threshold: float = 0.9995) -> jax.Array:
    """Spherical latent interpolation (pipelines/utils.py:35-43)."""
    u0 = v0 / jnp.linalg.norm(v0)
    u1 = v1 / jnp.linalg.norm(v1)
    dot = jnp.sum(u0 * u1)

    def _slerp(_):
        omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        return (jnp.sin((1.0 - t) * omega) * v0 + jnp.sin(t * omega) * v1) / jnp.sin(omega)

    def _linear(_):
        return (1.0 - t) * v0 + t * v1

    return jax.lax.cond(jnp.abs(dot) > dot_threshold, _linear, _slerp, None)


def zero_params_matching(params, *substrings):
    """Zero every leaf whose path contains any substring (inference.py:203-214
    stage_1 test-time zeroing of attn2.to_out / temporal proj_out)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    structure = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        pstr = "/".join(getattr(p, "key", str(p)) for p in path)
        if any(s in pstr for s in substrings):
            leaf = jnp.zeros_like(leaf)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(structure, leaves)
