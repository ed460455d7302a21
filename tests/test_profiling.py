"""Tests for the phase profiler and the --profile CLI flag."""

import os
import time

from falcon_tpu.utils.profiling import PhaseProfiler


def test_phase_profiler_accumulates():
    p = PhaseProfiler()
    with p.phase("a"):
        time.sleep(0.01)
    with p.phase("b"):
        pass
    with p.phase("a"):
        pass
    summary = p.summary()
    assert list(summary) == ["a", "b"]
    assert summary["a"] >= 0.01
    p.log_summary()  # must not raise
    p.reset()
    assert p.summary() == {}


def test_cli_profile_flag_writes_trace(tmp_path):
    from falcon_tpu import cli
    from falcon_tpu.simulate import make_clustered_spectra, write_mgf

    spectra, _ = make_clustered_spectra(
        n_clusters=5, cluster_size=3, n_noise=5, seed=31
    )
    inp = write_mgf(str(tmp_path / "in.mgf"), spectra)
    trace_dir = str(tmp_path / "trace")
    rc = cli.main([
        inp, str(tmp_path / "out"),
        "--work_dir", str(tmp_path / "work"),
        "--backend", "ann", "--profile", trace_dir, "--overwrite",
    ])
    assert rc == 0
    # jax wrote a trace under the directory (plugins/... event files).
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "no trace files written"
