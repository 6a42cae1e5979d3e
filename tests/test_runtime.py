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


def test_quantized_upload_roundtrip():
    """INT8 quantized param upload (io/loaders._quantized_device_put,
    VEXPRESS_QUANT_UPLOAD=1): large float kernels round-trip within the
    127-level per-channel grid (<=0.5% of the channel amax), small leaves
    (biases, norm scales) and int leaves stay EXACT, dtypes preserved."""
    import numpy as np
    import jax.numpy as jnp

    from vexpress_tpu.io.loaders import _quantized_device_put

    rng = np.random.default_rng(0)
    kernel = (rng.standard_normal((64, 512)) *
              np.exp(rng.uniform(-3, 1, (1, 512)))).astype(np.float32)
    kb16 = rng.standard_normal((320, 64)).astype(jnp.bfloat16)
    bias = rng.standard_normal((512,)).astype(np.float32)
    step = np.asarray(7, np.int32)
    tree = {"m": {"kernel": kernel, "bias": bias}, "k16": kb16, "step": step}

    out = _quantized_device_put(tree)
    assert out["m"]["kernel"].dtype == jnp.float32
    assert out["k16"].dtype == jnp.bfloat16
    # exact passthrough for small/int leaves
    np.testing.assert_array_equal(np.asarray(out["m"]["bias"]), bias)
    assert int(out["step"]) == 7
    # per-channel error bound: half a quantization step = amax/254
    amax = np.max(np.abs(kernel), axis=0, keepdims=True)
    err = np.abs(np.asarray(out["m"]["kernel"]) - kernel)
    assert np.all(err <= amax / 254.0 + 1e-7)
    # bf16 kernel: half an int8 step (amax/254) + a bf16 ulp at amax
    # magnitude (~amax/256) => bound ~amax/127
    err16 = np.abs(np.asarray(out["k16"], np.float32) - np.asarray(kb16, np.float32))
    amax16 = np.max(np.abs(np.asarray(kb16, np.float32)), axis=0, keepdims=True)
    assert np.all(err16 <= amax16 / 100.0)


def test_quantized_upload_pipeline_quality():
    """End-to-end quality gate for the int8 upload: the tiny pipeline with
    int8-quantized params generates a video within a few dB of the exact-
    params video (same seed). Guards against a quantizer bug that passes the
    leaf-level roundtrip but wrecks generation."""
    import numpy as np

    from vexpress_tpu.io.loaders import _quantized_device_put
    from .utils import make_tiny_pipeline

    pipe = make_tiny_pipeline()
    rng = np.random.default_rng(5)
    H = W = 64
    L = 8
    kwargs = dict(
        reference_image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        kps_images=rng.uniform(size=(L, H, W, 3)).astype(np.float32),
        audio_waveform=rng.normal(size=(4266,)).astype(np.float32),
        width=W, height=H, video_length=L,
        num_inference_steps=2, guidance_scale=2.0,
        context_frames=8, context_overlap=4,
    )
    exact = np.asarray(pipe(**kwargs))
    pipe.params = _quantized_device_put(pipe.params)
    quant = np.asarray(pipe(**kwargs))
    mse = float(np.mean((exact - quant) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"int8 upload changed generation too much: {psnr:.1f} dB"
