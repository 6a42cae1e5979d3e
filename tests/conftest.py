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

# NO persistent compilation cache on CPU (r5): this sandbox's virtualized
# host reports UNSTABLE cpu features between processes on the same boot, so
# XLA:CPU AOT cache loads warn constantly and SEGFAULTED the round gate.
# enable_compilation_cache() is a no-op on CPU unless VEXPRESS_COMP_CACHE is
# set explicitly; the in-process jit cache covers within-run reuse.
from vexpress_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
