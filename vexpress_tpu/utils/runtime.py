"""Runtime setup: persistent XLA compilation cache + phase timers.

First-time compiles of SD-scale programs over the axon TPU tunnel take
minutes; the on-disk compilation cache makes every later run (CLI, bench,
tests) start in seconds.
"""

from __future__ import annotations

import contextlib
import os
import time


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("VEXPRESS_COMP_CACHE", "/root/.cache/jax_comp_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


@contextlib.contextmanager
def phase(name: str, verbose: bool = True):
    t0 = time.time()
    if verbose:
        print(f"[vexpress] {name}...", flush=True)
    yield
    if verbose:
        print(f"[vexpress] {name} done in {time.time() - t0:.1f}s", flush=True)
