"""Certified-approx prefilter retrieval (``ops/knn.py`` certified mode).

The production upper-bound prefilter only ever KEEPS candidates whose
scan score reaches the compaction threshold (``cluster/ann_engine.py``
``_compact_rerank``), and the exact rerank re-scores every survivor —
so retrieval needs completeness above the threshold, not exact top-k
order.  ``knn_banded(..., certified_thr=thr)`` retrieves with the fast
``approx_max_k`` and proves completeness against exact in-scan counts;
on any miss (or a row with more above-thr candidates than k) the engine
falls back to the exact-top-k path.  Measured motivation (2026-08-20,
real chip): the exact scan is ~8x slower and entirely top-k-bound.
"""

import numpy as np
import pytest

from falcon_tpu.cluster import ann_engine
from falcon_tpu.ops.knn import knn_banded
from falcon_tpu.preprocess import process_spectrum
from falcon_tpu.simulate import make_clustered_spectra
from falcon_tpu.store.store import SpectrumStore


def _rand_band(n, d, seed, spread=0.003):
    rng = np.random.default_rng(seed)
    vectors = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    q = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    mzs = np.sort(rng.uniform(700.0, 700.0 + spread, n))
    return vectors, q, mzs


def _clustered_band(n, d, seed, cluster=8, spread=0.003):
    """Planted structure: within-cluster cosines ~0.99+, cross-cluster
    ~0.75 (nonnegative random vectors concentrate there), so a 0.9
    threshold keeps per-row above-thr counts at cluster-1 — the
    certified regime, with a wide score margin on both sides."""
    rng = np.random.default_rng(seed)
    centers = np.abs(rng.normal(size=(n // cluster, d)))
    vectors = np.repeat(centers, cluster, axis=0)[:n]
    vectors = vectors + 0.02 * np.abs(rng.normal(size=(n, d)))
    vectors = (vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
               ).astype(np.float32)
    # Shuffle so clusters are scattered across the band (and across
    # column sub-windows when streaming is forced).
    perm = rng.permutation(n)
    mzs = np.sort(rng.uniform(700.0, 700.0 + spread, n))
    return vectors[perm], mzs


def _above_thr_sets(vectors, q, mzs, thr, tol_ppm=20.0):
    sims = (q.astype(np.float32) @ vectors.astype(np.float32).T)
    mz32 = np.asarray(mzs, np.float64).astype(np.float32)
    ppm = np.abs((mz32[:, None] - mz32[None, :]) / mz32[None, :] * 1e6)
    n = len(mzs)
    valid = (ppm <= tol_ppm) & ~np.eye(n, dtype=bool)
    return [set(np.flatnonzero(valid[r] & (sims[r] >= thr)).tolist())
            for r in range(n)]


def test_certified_retrieval_is_threshold_complete():
    """When the certificate passes, the lists contain EVERY band-valid
    candidate at or above the threshold — verified against a brute
    force oracle — and agree with the exact-top-k path's survivors."""
    n, d, k = 400, 48, 64
    vectors, mzs = _clustered_band(n, d, seed=7)
    thr = 0.9
    s, i, ok = knn_banded(
        vectors, mzs, 20.0, "ppm", k, as_device=True,
        certified_thr=thr,
    )
    assert ok, "certificate must pass when every count fits in k"
    s_h, i_h = np.asarray(s)[:n], np.asarray(i)[:n]
    got = [set(i_h[r][(i_h[r] >= 0) & (s_h[r] >= thr)].tolist())
           for r in range(n)]
    want = _above_thr_sets(vectors, vectors, mzs, thr)
    assert got == want
    assert sum(len(w) for w in want) > 0, "degenerate oracle"


def test_certified_fails_when_counts_exceed_k():
    """More above-thr candidates than k slots must surface as ok=False
    (the count can never equal the retrieved number), so the engine
    falls back to exact retrieval instead of silently truncating."""
    n, d, k = 128, 32, 8
    # Identical unit rows: every pair scores 1.0 >= thr, counts = n-1 >> k.
    v = np.zeros((n, d), np.float32)
    v[:, :4] = 0.5
    mzs = np.sort(np.linspace(500.0, 500.001, n))
    _, _, ok = knn_banded(
        v, mzs, 20.0, "ppm", k, as_device=True, certified_thr=0.9,
    )
    assert not ok


def test_certified_counts_respect_column_streaming(monkeypatch):
    """Counts accumulate correctly across forced column sub-window
    passes (disjoint column ranges sum)."""
    n, d, k = 600, 32, 64
    vectors, mzs = _clustered_band(n, d, seed=11, spread=0.004)
    thr = 0.9
    s1, i1, ok1 = knn_banded(vectors, mzs, 20.0, "ppm", k,
                             as_device=True, certified_thr=thr)
    monkeypatch.setenv("FALCON_TPU_KNN_COL_CHUNK", "256")
    s2, i2, ok2 = knn_banded(vectors, mzs, 20.0, "ppm", k,
                             as_device=True, certified_thr=thr)
    assert ok1 and ok2
    n_ = n

    def above(s, i):
        s_h, i_h = np.asarray(s)[:n_], np.asarray(i)[:n_]
        return [set(i_h[r][(i_h[r] >= 0) & (s_h[r] >= thr)].tolist())
                for r in range(n_)]

    assert above(s1, i1) == above(s2, i2)


def test_certified_rejects_incompatible_modes():
    n, d = 64, 16
    vectors, q, mzs = _rand_band(n, d, seed=3)
    with pytest.raises(ValueError):
        knn_banded(vectors, mzs, 20.0, "ppm", 8, as_device=True,
                   exact_topk=True, certified_thr=0.5)
    with pytest.raises(ValueError):
        knn_banded(vectors, mzs, 20.0, "ppm", 8, as_device=False,
                   certified_thr=0.5)


@pytest.fixture(scope="module")
def band_store(tmp_path_factory):
    spectra, _ = make_clustered_spectra(
        n_clusters=14, cluster_size=8, n_noise=80, seed=33,
        charges=(2,), precursor_classes=4,
    )
    rows = [
        p for s in spectra
        if (p := process_spectrum(s, 5, 250, 101.0, 1500.0, 1.5, 0.01,
                                  50, None)) is not None
    ]
    path = tmp_path_factory.mktemp("cert") / "spectra"
    store = SpectrumStore(str(path))
    w = store.writer()
    w.add_many(rows)
    w.close()
    store.save_charges([2])
    return store.dataset(2)


COMMON = dict(
    min_samples=2, min_matches=2,
    precursor_tol_mass=20.0, precursor_tol_mode="ppm", rt_tol=None,
    fragment_tol=0.05, batch_size=2**15,
    n_neighbors=32, n_neighbors_ann=32,
)


@pytest.mark.parametrize("method", ["dbscan", "linkage"])
@pytest.mark.parametrize("eps", [0.1, 0.3])
def test_engine_labels_identical_certified_vs_exact(band_store,
                                                    monkeypatch,
                                                    method, eps):
    """End-to-end labels are identical with the certified-approx
    retrieval on (default) and off (exact top-k path) — across both
    cluster methods, a tight and a loose eps."""
    kwargs = dict(COMMON, eps=eps, cluster_method=method)
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "0")
    labels_exact, _ = ann_engine.generate_clusters(band_store, **kwargs)
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "1")
    labels_cert, _ = ann_engine.generate_clusters(band_store, **kwargs)
    np.testing.assert_array_equal(labels_cert, labels_exact)


def test_engine_falls_back_when_certificate_fails(band_store,
                                                  monkeypatch, caplog):
    """A k_ann smaller than the densest row's above-thr count forces
    the certificate to fail; the engine must log the fallback and still
    produce exact-path labels."""
    import logging

    kwargs = dict(COMMON, eps=0.3, cluster_method="dbscan",
                  n_neighbors=4, n_neighbors_ann=4)
    # Keep the widening heuristic from raising k past the dense count.
    monkeypatch.setenv("FALCON_TPU_MAX_NEIGHBORS", "4")
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "0")
    labels_exact, _ = ann_engine.generate_clusters(band_store, **kwargs)
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "1")
    with caplog.at_level(logging.INFO, logger="falcon_tpu"):
        labels_cert, _ = ann_engine.generate_clusters(band_store,
                                                      **kwargs)
    np.testing.assert_array_equal(labels_cert, labels_exact)
    assert any("Certified-approx retrieval not complete" in r.message
               for r in caplog.records)
