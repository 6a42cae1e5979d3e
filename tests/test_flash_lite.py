"""CPU (interpret-mode) correctness test for the experimental lean flash
kernel (ops.flash_lite). The kernel is off by default in production
(measured slower than the stock kernel — see its docstring) but must stay
correct while it exists as a recorded experiment."""

import numpy as np
import jax
import jax.numpy as jnp

from vexpress_tpu.ops.flash_lite import flash_lite_fwd


def test_flash_lite_interpret_matches_reference():
    key = jax.random.PRNGKey(0)
    B, H, L, D = 2, 2, 256, 40
    q = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D), jnp.bfloat16)
    scale = D ** -0.5

    out = flash_lite_fwd(q, k, v, scale, block_q=128, block_k=128, interpret=True)

    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), vf)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    # bf16 exp after max-subtraction: ~0.4% relative of O(1) outputs
    assert err < 0.03, err
