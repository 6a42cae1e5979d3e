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

# Persistent compilation cache: the suite is dominated by CPU compiles of
# grad programs; repeat runs hit the on-disk cache instead. The dir is keyed
# per machine — CPU AOT entries from another sandbox are rejected by
# cpu_aot_loader (machine-feature mismatch), so a shared dir only wastes time
# failing to load them.
from vexpress_tpu.utils.runtime import enable_compilation_cache, machine_cpu_cache_dir  # noqa: E402

enable_compilation_cache(os.environ.get("VEXPRESS_COMP_CACHE") or machine_cpu_cache_dir())
