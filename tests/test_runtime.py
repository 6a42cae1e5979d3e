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


def test_metrics_logger_mlflow_filestore(tmp_path):
    """MLflow FileStore export (reference train.py:657 logs train_loss to
    MLflow): metric files carry '<ts_ms> <value> <step>' lines and the
    meta.yaml files exist where `mlflow ui` looks for them."""
    import os

    from vexpress_tpu.utils.observability import MetricsLogger

    mlruns = str(tmp_path / "mlruns")
    mlog = MetricsLogger(str(tmp_path), mlflow_dir=mlruns, run_name="stage_1")
    mlog.log_param("config", "/abs/stage_1.yaml")
    mlog.log(1, {"train_loss": 0.5})
    mlog.log(2, {"train_loss": 0.25, "it_per_s": 3.0})
    mlog.close()

    assert os.path.isfile(os.path.join(mlruns, "0", "meta.yaml"))
    runs = [d for d in os.listdir(os.path.join(mlruns, "0")) if d != "meta.yaml"]
    assert len(runs) == 1
    run_dir = os.path.join(mlruns, "0", runs[0])
    meta = open(os.path.join(run_dir, "meta.yaml")).read()
    assert f"run_id: {runs[0]}" in meta and "run_name: stage_1" in meta
    # close() finalizes the run: without status 3 + end_time `mlflow ui`
    # shows every completed training run as eternally Running
    assert "status: 3" in meta and "end_time: null" not in meta
    assert open(os.path.join(run_dir, "params", "config")).read() == "/abs/stage_1.yaml"
    lines = open(os.path.join(run_dir, "metrics", "train_loss")).read().splitlines()
    assert len(lines) == 2
    ts, value, step = lines[1].split()
    assert float(value) == 0.25 and int(step) == 2 and int(ts) > 1e12
    # it_per_s only logged at step 2
    assert len(open(os.path.join(run_dir, "metrics", "it_per_s")).read().splitlines()) == 1
