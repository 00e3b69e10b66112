"""bench.py backend probe: must never hang the benchmark when the TPU
tunnel wedges — a hung probe subprocess falls back to the CPU backend."""
import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_probe_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_short_circuits_on_cpu_env(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe subprocess spawned despite cpu env")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    assert bench._probe_backend() == "cpu"


def test_probe_falls_back_on_hang(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    def hang(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", hang)
    out = bench._probe_backend(timeout_s=0.1)
    assert out.startswith("cpu-fallback")
    # children of the bench (scaling subprocesses) must inherit the pin
    assert os.environ["JAX_PLATFORMS"] == "cpu"
    import jax

    assert jax.devices()[0].platform == "cpu"


def test_probe_reports_live_backend(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class R:
        returncode = 0
        stdout = "some-warning\ntpu\n"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    assert bench._probe_backend() == "tpu"
