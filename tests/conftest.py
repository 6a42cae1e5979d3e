import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): deterministic,
# fp32, and exercises the same pjit sharding paths as real multi-chip TPU.
# Note: the axon TPU plugin overrides the JAX_PLATFORMS env var in this image,
# so we must force the platform through jax.config before any backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
