"""Unit tests for the runtime resilience helpers (utils.runtime)."""

import jax
import pytest

from vexpress_tpu.utils.runtime import with_compile_retries


def test_retries_transient_then_succeeds(monkeypatch):
    calls = {"n": 0}
    monkeypatch.setattr("time.sleep", lambda s: None)

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: remote_compile: Broken pipe")
        return x + 1

    assert with_compile_retries(flaky, 41, wait_s=0) == 42
    assert calls["n"] == 3


def test_non_transient_raises_immediately(monkeypatch):
    calls = {"n": 0}
    monkeypatch.setattr("time.sleep", lambda s: None)

    def broken(x):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shapes mismatch")

    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
        with_compile_retries(broken, 1, wait_s=0)
    assert calls["n"] == 1


def test_exhausted_retries_reraise(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)

    def always_transient(x):
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: transport closed")

    with pytest.raises(jax.errors.JaxRuntimeError, match="UNAVAILABLE"):
        with_compile_retries(always_transient, 1, retries=2, wait_s=0)
