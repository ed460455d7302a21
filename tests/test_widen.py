"""Multi-pass neighbor widening past the per-pass (rows, k) envelope.

The banded scan's boundary continuation (``ops/knn.py``) retrieves each
row's candidates in the strict (score DESC, id ASC) order k at a time;
the engine merges per-pass exact reranks into the running top-k_final
(``cluster/ann_engine.py``).  Round-4 verdict item 8: dense-band
retrieval must be able to exceed the measured single-pass worker-fault
envelope (rows * k * 8 <= 2^28) without widening any resident array.
"""

import os

import numpy as np
import pytest

from falcon_tpu.cluster import ann_engine
from falcon_tpu.ops.knn import band_bounds, knn_banded
from falcon_tpu.preprocess import process_spectrum
from falcon_tpu.simulate import make_clustered_spectra
from falcon_tpu.store.store import SpectrumStore


def _brute_candidates(vectors, q_vectors, mzs, tol_ppm):
    """All valid (in-tolerance, non-self) candidates per row with their
    asymmetric scores, using the kernels' own f32 band acceptance."""
    n = len(mzs)
    sims = (q_vectors.astype(np.float32)
            @ vectors.astype(np.float32).T).astype(np.float32)
    mz32 = np.asarray(mzs, np.float64).astype(np.float32)
    ppm = np.abs((mz32[:, None] - mz32[None, :]) / mz32[None, :] * 1e6)
    valid = (ppm <= tol_ppm) & ~np.eye(n, dtype=bool)
    return sims, valid


def test_boundary_passes_cover_band_exactly():
    """Successive boundary-continued passes retrieve every valid in-band
    candidate exactly once (no duplicates, no drops), in k-sized steps."""
    rng = np.random.default_rng(3)
    n, d, k = 300, 64, 32
    # Nonnegative embeddings, like the production UB scan's (hashed
    # intensities / tolerance spreads): all scores >= 0, so no real
    # candidate can reach the NEG sentinel (a documented precondition
    # of the boundary continuation).
    vectors = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    q = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    # One wide band: every row within tolerance of every other.
    mzs = np.sort(rng.uniform(700.0, 700.003, n))

    seen = [set() for _ in range(n)]
    boundary = None
    for _ in range(-(-(n - 1) // k) + 1):
        s, i, boundary = knn_banded(
            vectors, mzs, 20.0, "ppm", k, as_device=True,
            exact_topk=True, q_vectors=q, want_boundary=True,
            resume_boundary=boundary,
        )
        i_host = np.asarray(i)[:n]
        for r in range(n):
            ids = i_host[r][i_host[r] >= 0]
            assert len(set(ids.tolist())) == len(ids)
            assert not (seen[r] & set(ids.tolist())), "duplicate across passes"
            seen[r].update(ids.tolist())
    _, valid = _brute_candidates(vectors, q, mzs, 20.0)
    for r in range(n):
        assert seen[r] == set(np.flatnonzero(valid[r]).tolist())


def test_boundary_passes_progress_on_exact_ties():
    """All-identical spectra (every pairwise score ties exactly) still
    advance k new candidates per pass — the (score, id) lexicographic
    order is strict even when scores are not."""
    n, d, k = 96, 32, 16
    v = np.zeros((n, d), np.float32)
    v[:, :4] = 0.5  # identical unit rows
    mzs = np.sort(np.linspace(500.0, 500.001, n))
    seen = [set() for _ in range(n)]
    boundary = None
    for _ in range(-(-(n - 1) // k)):
        _, i, boundary = knn_banded(
            v, mzs, 20.0, "ppm", k, as_device=True, exact_topk=True,
            want_boundary=True, resume_boundary=boundary,
        )
        i_host = np.asarray(i)[:n]
        for r in range(n):
            ids = set(i_host[r][i_host[r] >= 0].tolist())
            assert not (seen[r] & ids)
            seen[r].update(ids)
    for r in range(n):
        assert seen[r] == set(range(n)) - {r}


def test_boundary_respects_column_streaming(monkeypatch):
    """Boundary continuation composes with forced multi-column passes
    (the merge keeps the id-ascending tie order across sub-windows)."""
    rng = np.random.default_rng(5)
    n, d, k = 600, 32, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    mzs = np.sort(rng.uniform(700.0, 700.004, n))

    def run_all():
        seen, boundary = [[] for _ in range(n)], None
        for _ in range(-(-(n - 1) // k)):
            s, i, boundary = knn_banded(
                vectors, mzs, 20.0, "ppm", k, as_device=True,
                exact_topk=True, want_boundary=True,
                resume_boundary=boundary,
            )
            s_h, i_h = np.asarray(s)[:n], np.asarray(i)[:n]
            for r in range(n):
                m = i_h[r] >= 0
                seen[r].extend(zip(i_h[r][m].tolist(),
                                   s_h[r][m].tolist()))
        return seen

    ref = run_all()
    monkeypatch.setenv("FALCON_TPU_KNN_COL_CHUNK", "256")
    split = run_all()
    for r in range(0, n, 17):
        assert sorted(x[0] for x in ref[r]) == sorted(
            x[0] for x in split[r])


@pytest.fixture(scope="module")
def dense_store(tmp_path_factory):
    """One dense precursor band whose width exceeds small k budgets."""
    spectra, _ = make_clustered_spectra(
        n_clusters=12, cluster_size=8, n_noise=64, seed=21,
        charges=(2,), precursor_classes=1,
    )
    rows = [
        p for s in spectra
        if (p := process_spectrum(s, 5, 250, 101.0, 1500.0, 1.5, 0.01,
                                  50, None)) is not None
    ]
    path = tmp_path_factory.mktemp("widen") / "spectra"
    store = SpectrumStore(str(path))
    w = store.writer()
    w.add_many(rows)
    w.close()
    store.save_charges([2])
    return store.dataset(2)


COMMON = dict(
    eps=0.2, min_samples=2, min_matches=2,
    precursor_tol_mass=20.0, precursor_tol_mode="ppm", rt_tol=None,
    fragment_tol=0.05, batch_size=2**15,
)


@pytest.mark.parametrize("method", ["dbscan", "linkage"])
def test_multipass_widening_matches_single_wide_pass(dense_store,
                                                     monkeypatch,
                                                     method):
    """Forcing the per-pass width down to n_neighbors_ann (the envelope
    hook) and covering the band with boundary-continued passes yields
    the SAME labels and the same final exact neighbor lists as one wide
    pass — across both cluster methods and both scan dtypes."""
    kwargs = dict(COMMON, n_neighbors=16, n_neighbors_ann=16,
                  cluster_method=method)
    # Pin the exact boundary-continued path: certified-approx retrieval
    # (tests/test_certified.py) would otherwise satisfy these configs
    # in one pass and leave the widening machinery unexercised.
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "0")
    monkeypatch.setenv("FALCON_TPU_MAX_NEIGHBORS", "1024")
    labels_wide, _ = ann_engine.generate_clusters(dense_store, **kwargs)
    monkeypatch.setenv("FALCON_TPU_WIDEN_PASS_CAP", "16")
    labels_multi, _ = ann_engine.generate_clusters(dense_store, **kwargs)
    np.testing.assert_array_equal(labels_multi, labels_wide)


def test_multipass_widening_bf16_and_f32(dense_store, monkeypatch):
    """Multi-pass widening is label-identical between the bf16 and f32
    scans (the certified margin keeps every reachable survivor in both,
    and the per-pass boundary continuation never drops a candidate)."""
    kwargs = dict(COMMON, n_neighbors=16, n_neighbors_ann=16,
                  cluster_method="dbscan")
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "0")
    monkeypatch.setenv("FALCON_TPU_MAX_NEIGHBORS", "1024")
    monkeypatch.setenv("FALCON_TPU_WIDEN_PASS_CAP", "16")
    monkeypatch.setenv("FALCON_TPU_KNN_DTYPE", "f32")
    labels_f32, _ = ann_engine.generate_clusters(dense_store, **kwargs)
    monkeypatch.setenv("FALCON_TPU_KNN_DTYPE", "bf16")
    labels_bf16, _ = ann_engine.generate_clusters(dense_store, **kwargs)
    np.testing.assert_array_equal(labels_bf16, labels_f32)


def test_widening_stops_early_below_threshold(dense_store, monkeypatch,
                                              caplog):
    """With a tight eps the boundary bounds fall below the prefilter
    threshold after few passes — the engine must not run all budgeted
    passes (observable via the scan-call count)."""
    import falcon_tpu.cluster.ann_engine as eng

    calls = {"n": 0}
    real = eng.knn_banded

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(eng, "knn_banded", counting)
    monkeypatch.setenv("FALCON_TPU_KNN_CERTIFIED", "0")
    monkeypatch.setenv("FALCON_TPU_MAX_NEIGHBORS", "1024")
    monkeypatch.setenv("FALCON_TPU_WIDEN_PASS_CAP", "16")
    kwargs = dict(COMMON, n_neighbors=16, n_neighbors_ann=16,
                  cluster_method="dbscan")
    kwargs["eps"] = 0.02  # tight: few candidates can reach 1 - eps
    ann_engine.generate_clusters(dense_store, **kwargs)
    # The band is ~100+ wide, so the budget allows ~8 passes; the
    # early stop must cut that down.
    assert calls["n"] < 6
