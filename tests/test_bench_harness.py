"""Unit tests for bench.py's backend-wait harness.

The bench is the driver-facing artifact (BASELINE.md); its outage
insurance — wait for the tunneled backend, then fall back to CPU at the
deadline so a JSON line is always produced — must not regress.  The
probe subprocess is monkeypatched so no real backend is touched.
"""

import subprocess
import sys
import time
import types

import bench


class _FailedProbe:
    returncode = 1


class _OkProbe:
    returncode = 0


def test_wait_disabled_returns_immediately(monkeypatch):
    monkeypatch.setenv("FALCON_TPU_BENCH_WAIT_S", "0")

    def boom(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError("probe must not run when wait is disabled")

    monkeypatch.setattr(subprocess, "run", boom)
    bench._wait_for_backend()


def test_wait_returns_once_probe_succeeds(monkeypatch):
    monkeypatch.setenv("FALCON_TPU_BENCH_WAIT_S", "600")
    calls = []

    def fake_run(cmd, **kwargs):
        calls.append(cmd)
        return _OkProbe() if len(calls) >= 2 else _FailedProbe()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(bench, "_FORCED_CPU", False)
    bench._wait_for_backend()
    assert len(calls) == 2
    # A successful probe must NOT force the CPU platform.
    import os

    assert os.environ.get("JAX_PLATFORMS") is None
    assert not bench._FORCED_CPU


def test_deadline_forces_cpu_platform(monkeypatch):
    """Probe never succeeds -> at the deadline the bench forces CPU and
    the bounded single-run protocol so the run completes before any
    outer timeout (the JSON's jax_backend field labels it)."""
    monkeypatch.setenv("FALCON_TPU_BENCH_WAIT_S", "0.01")
    monkeypatch.setenv("JAX_PLATFORMS", "bogus")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "1.2.3.4")
    monkeypatch.delenv("FALCON_TPU_BENCH_RUNS", raising=False)
    monkeypatch.delenv("FALCON_TPU_BENCH_AGREEMENT", raising=False)
    monkeypatch.setattr(bench, "_FORCED_CPU", False)
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _FailedProbe())
    monkeypatch.setattr(time, "sleep", lambda s: None)
    bench._wait_for_backend()
    import os

    assert os.environ["JAX_PLATFORMS"] == "cpu"
    assert os.environ["PALLAS_AXON_POOL_IPS"] == ""
    assert os.environ["FALCON_TPU_BENCH_RUNS"] == "1"
    assert os.environ["FALCON_TPU_BENCH_AGREEMENT"] == "0"
    assert bench._FORCED_CPU


def test_deadline_respects_explicit_run_count(monkeypatch):
    """An explicit FALCON_TPU_BENCH_RUNS wins over the fallback's
    bounded default."""
    monkeypatch.setenv("FALCON_TPU_BENCH_WAIT_S", "0.01")
    monkeypatch.setenv("FALCON_TPU_BENCH_RUNS", "5")
    monkeypatch.setenv("JAX_PLATFORMS", "bogus")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "1.2.3.4")
    monkeypatch.delenv("FALCON_TPU_BENCH_AGREEMENT", raising=False)
    monkeypatch.setattr(bench, "_FORCED_CPU", False)
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _FailedProbe())
    bench._wait_for_backend()
    import os

    assert os.environ["FALCON_TPU_BENCH_RUNS"] == "5"


def test_deadline_fails_honestly_on_jax_config_failure(monkeypatch, capsys):
    """The in-process jax.config switch is the lever that actually
    forces CPU (the timed runs call cli.main() in-process, so the env
    vars alone cannot help).  If it fails, proceeding would hang on the
    dead tunnel — the bench must exit with an error JSON instead."""
    monkeypatch.setenv("FALCON_TPU_BENCH_WAIT_S", "0.01")
    monkeypatch.setenv("JAX_PLATFORMS", "bogus")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "1.2.3.4")
    monkeypatch.delenv("FALCON_TPU_BENCH_RUNS", raising=False)
    monkeypatch.delenv("FALCON_TPU_BENCH_AGREEMENT", raising=False)
    monkeypatch.setattr(bench, "_FORCED_CPU", False)
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _FailedProbe())

    class _RaisingConfig:
        @staticmethod
        def update(*a, **k):
            raise RuntimeError("backend already initialized")

    fake_jax = types.SimpleNamespace(config=_RaisingConfig())
    monkeypatch.setitem(sys.modules, "jax", fake_jax)
    import pytest

    with pytest.raises(SystemExit) as excinfo:
        bench._wait_for_backend()
    assert excinfo.value.code == 1
    out = capsys.readouterr().out
    import json

    err = json.loads(out.strip().splitlines()[-1])
    assert "CPU fallback failed" in err["error"]
