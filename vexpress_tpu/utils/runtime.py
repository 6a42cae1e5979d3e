"""Runtime setup: persistent XLA compilation cache + phase timers.

First-time compiles of SD-scale programs over the axon TPU tunnel take
minutes; the on-disk compilation cache makes every later run (CLI, bench,
tests) start in seconds.
"""

from __future__ import annotations

import contextlib
import os
import time


def machine_cpu_cache_dir() -> str:
    """Per-machine-keyed compile-cache dir for XLA:CPU runs. CPU AOT cache
    entries embed the compile machine's CPU features and are REJECTED by
    cpu_aot_loader on any other host ("could lead to SIGILL"), so a shared
    cache dir across sandboxes both buys nothing and wastes time failing to
    load every entry. Key by the host CPU's feature flags."""
    import hashlib

    key = "generic"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.md5(line.encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    return f"/tmp/vexpress_comp_cache_cpu_{key}"


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("VEXPRESS_COMP_CACHE")
    if path is None:
        # TPU executables are target-keyed and shareable; XLA:CPU AOT entries
        # embed the COMPILE-TIME detected CPU features and the loader rejects
        # mismatches — and on this sandbox's virtualized host the detection
        # itself is unstable BETWEEN PROCESSES ON THE SAME BOOT (r5: constant
        # "+prefer-no-scatter not supported on the host machine" warnings,
        # then a hard SEGFAULT inside cpu_aot_loader during the round gate).
        # The in-process jit cache already dedupes within a run and every CPU
        # consumer (tests, dryrun) is engineered to run cold within budget,
        # so the CPU disk cache bought little and cost a crash class: default
        # it OFF. Opt back in with VEXPRESS_COMP_CACHE=<dir>.
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "unknown"
        if platform == "cpu":
            return
        path = "/root/.cache/jax_comp_cache"
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


def with_compile_retries(fn, *args, retries: int = 3, wait_s: float = 15.0, label: str = ""):
    """Run fn(*args), retrying on transient runtime errors.

    The axon remote-compile service occasionally drops long-running compile
    connections ("Broken pipe"); a retry re-submits the same HLO (and usually
    hits partially cached state)."""
    import jax

    last = None
    for attempt in range(retries):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:  # transport/compile-service errors
            last = e
            msg = str(e)
            transient = any(s in msg for s in (
                "UNAVAILABLE", "Broken pipe", "transport", "remote_compile",
                "read body", "response body closed", "HTTP 5",
            ))
            if not transient:
                raise
            # Donation safety: if fn donated input buffers and the failure
            # happened after dispatch (execution/transport, not compile), the
            # inputs are already consumed — a retry would replay with deleted
            # arrays. Re-raise the original error instead.
            if any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(args)
            ):
                raise
            print(f"[vexpress] transient compile failure{f' in {label}' if label else ''} "
                  f"(attempt {attempt + 1}/{retries}): {msg[:120]}", flush=True)
            time.sleep(wait_s)
    raise last
