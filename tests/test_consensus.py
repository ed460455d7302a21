"""Tests for on-device consensus spectrum construction (ops/consensus.py)
and its CLI surface (--export_representatives --representative_method
consensus; BASELINE.json config #4)."""

import os

import numpy as np
import pytest

from falcon_tpu.ops.consensus import consensus_spectra


def numpy_consensus(peak_lists, fragment_tol, min_mz, min_fraction,
                    max_peaks):
    """Direct (slow) reference implementation for one cluster."""
    binned = {}
    for member, (mz, inten) in enumerate(peak_lists):
        for m, i in zip(mz, inten):
            b = max(int(np.floor((float(m) - min_mz) / fragment_tol)), 0)
            rec = binned.setdefault(b, [0.0, 0.0, set()])
            rec[0] += float(i)
            rec[1] += float(m) * float(i)
            rec[2].add(member)
    size = len(peak_lists)
    need = max(int(np.ceil(min_fraction * size)), 1)
    rows = [
        (rec[1] / rec[0], rec[0] / len(rec[2]))
        for rec in binned.values()
        if len(rec[2]) >= need
    ]
    if not rows:
        best = max(len(rec[2]) for rec in binned.values())
        rows = [
            (rec[1] / rec[0], rec[0] / len(rec[2]))
            for rec in binned.values()
            if len(rec[2]) == best
        ]
    rows.sort(key=lambda r: r[1])
    rows = rows[-max_peaks:]
    rows.sort(key=lambda r: r[0])
    mz = np.array([r[0] for r in rows], np.float32)
    inten = np.array([r[1] for r in rows], np.float32)
    return mz, inten / np.linalg.norm(inten)


def _ragged(peak_lists):
    lengths = [len(m) for m, _ in peak_lists]
    offsets = np.zeros(len(peak_lists) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mz = np.concatenate([m for m, _ in peak_lists]).astype(np.float32)
    inten = np.concatenate([i for _, i in peak_lists]).astype(np.float32)
    return offsets, mz, inten


def test_consensus_matches_numpy_reference():
    rng = np.random.default_rng(0)
    # Three clusters with shared template peaks + per-member jitter.
    peak_lists, labels = [], []
    for c in range(3):
        template = np.sort(rng.uniform(150, 1400, 30))
        for _ in range(5):
            keep = rng.random(30) < 0.8
            mz = template[keep] + rng.normal(0, 0.002, keep.sum())
            inten = rng.random(keep.sum()).astype(np.float32) + 0.1
            inten /= np.linalg.norm(inten)
            order = np.argsort(mz)
            peak_lists.append((mz[order].astype(np.float32),
                               inten[order]))
            labels.append(c)
    offsets, mz_flat, int_flat = _ragged(peak_lists)
    out = consensus_spectra(
        offsets, mz_flat, int_flat, np.asarray(labels), 0.05, 100.0,
        min_fraction=0.5, max_peaks=50,
    )
    assert set(out) == {0, 1, 2}
    for c in range(3):
        members = [p for p, l in zip(peak_lists, labels) if l == c]
        ref_mz, ref_int = numpy_consensus(members, 0.05, 100.0, 0.5, 50)
        got_mz, got_int = out[c]
        np.testing.assert_allclose(got_mz, ref_mz, rtol=1e-5)
        np.testing.assert_allclose(got_int, ref_int, rtol=1e-4)


def test_consensus_singleton_passthrough():
    mz = np.array([150.0, 300.0, 450.0], np.float32)
    inten = np.array([0.6, 0.8, 0.0] , np.float32)[:3]
    inten = np.array([0.6, 0.8, 0.1], np.float32)
    inten /= np.linalg.norm(inten)
    out = consensus_spectra(
        np.array([0, 3]), mz, inten, np.array([0]), 0.05, 100.0,
        min_fraction=0.5, max_peaks=50,
    )
    got_mz, got_int = out[0]
    np.testing.assert_allclose(got_mz, mz, rtol=1e-6)
    np.testing.assert_allclose(got_int, inten, rtol=1e-6)


def test_consensus_quorum_filters_rare_peaks():
    # 4 members share one peak; a second peak appears in only 1 member.
    peak_lists = []
    for member in range(4):
        if member == 0:
            peak_lists.append((
                np.array([200.0, 500.0], np.float32),
                np.array([0.7, 0.7], np.float32),
            ))
        else:
            peak_lists.append((
                np.array([200.0], np.float32),
                np.array([1.0], np.float32),
            ))
    offsets, mz_flat, int_flat = _ragged(peak_lists)
    out = consensus_spectra(
        offsets, mz_flat, int_flat, np.zeros(4, np.int64), 0.05, 100.0,
        min_fraction=0.5, max_peaks=50,
    )
    got_mz, _ = out[0]
    np.testing.assert_allclose(got_mz, [200.0], rtol=1e-6)


def test_consensus_cluster_filter():
    peak_lists = [
        (np.array([200.0, 300.0], np.float32),
         np.array([0.6, 0.8], np.float32))
        for _ in range(4)
    ]
    offsets, mz_flat, int_flat = _ragged(peak_lists)
    labels = np.array([0, 0, 1, 1])
    out = consensus_spectra(
        offsets, mz_flat, int_flat, labels, 0.05, 100.0,
        cluster_filter=np.array([1]),
    )
    assert set(out) == {1}


def test_cli_consensus_representatives(tmp_path):
    from falcon_tpu import cli
    from falcon_tpu.ms_io import mgf_io
    from falcon_tpu.simulate import make_clustered_spectra, write_mgf

    spectra, _ = make_clustered_spectra(
        n_clusters=8, cluster_size=5, n_noise=10, seed=21
    )
    inp = write_mgf(str(tmp_path / "in.mgf"), spectra)
    out = str(tmp_path / "out")
    # BASELINE.json config #4: aggressive eps with consensus export.
    rc = cli.main([
        inp, out, "--work_dir", str(tmp_path / "work"),
        "--backend", "ann", "--eps", "0.30",
        "--export_representatives",
        "--representative_method", "consensus",
        "--overwrite",
    ])
    assert rc == 0
    reps = list(mgf_io.get_spectra(out + ".mgf"))
    assert reps, "no consensus representatives exported"
    assert all(r.identifier.startswith("consensus_cluster")
               for r in reps)
    # Labels in the MGF match the label set in the CSV.
    import csv

    with open(out + ".csv") as f:
        rows = [r for r in csv.reader(f) if not r[0].startswith("#")][1:]
    csv_labels = {int(r[5]) for r in rows}
    mgf_labels = {
        int(r.identifier.removeprefix("consensus_cluster")) for r in reps
    }
    assert mgf_labels == csv_labels
    # Peaks sorted, L2-normalized.
    for r in reps[:5]:
        assert (np.diff(r.mz) >= 0).all()
        assert abs(np.linalg.norm(r.intensity) - 1.0) < 1e-4
