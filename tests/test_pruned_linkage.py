"""UB-pruned per-component linkage (round-4 verdict item 2).

The linkage cut at eps is invariant to clamping every >eps distance to
1.0 for complete and single linkage (proof sketch in
``ops/pairwise.pruned_condensed_distances``); these tests assert the
invariance empirically against the unpruned path — flat labels, medoids
(complete linkage), and the exactness of every <=eps entry — at both a
tight and a loose (0.3) eps, plus end-to-end engine label parity with
the pruning toggled via ``FALCON_TPU_LINKAGE_PRUNE``.
"""

import numpy as np
import pytest

from falcon_tpu import native
from falcon_tpu.ops import pairwise
from falcon_tpu.ops.vectorize import SpectrumHasher

FRAG_TOL = 0.05


def _chained_spectra(n_chains, chain_len, p=64, seed=0, drift=3):
    """Chains of spectra where consecutive members share most peaks but
    distant members share few — complete linkage splits each chain into
    several flat clusters at moderate eps, exercising both <=eps and
    >eps (clamped) distances inside one eps-component."""
    rng = np.random.default_rng(seed)
    mz = np.full((n_chains * chain_len, p), -1e6, np.float32)
    intensity = np.zeros((n_chains * chain_len, p), np.float32)
    row = 0
    for _ in range(n_chains):
        n_peaks = 30
        base_mz = np.sort(rng.uniform(150, 1400, n_peaks))
        base_int = rng.random(n_peaks).astype(np.float32) + 0.1
        for step in range(chain_len):
            m = base_mz.copy()
            x = base_int.copy()
            # Replace `drift` peaks per step: distance grows along the
            # chain.
            repl = rng.choice(n_peaks, drift, replace=False)
            base_mz[repl] = rng.uniform(150, 1400, drift)
            base_int[repl] = rng.random(drift).astype(np.float32) + 0.1
            order = np.argsort(m)
            x = x[order] / np.linalg.norm(x)
            mz[row, :n_peaks] = np.sort(m)
            intensity[row, :n_peaks] = x
            row += 1
    return mz, intensity


def _flat_labels(pdist, n, eps, linkage):
    z = native.linkage(pdist, linkage)
    return native.fcluster(z, eps, n=n)


@pytest.fixture(scope="module")
def hasher():
    return SpectrumHasher(101.0, 1500.0, FRAG_TOL, low_dim=400, seed=0)


@pytest.mark.parametrize("eps", [0.1, 0.3])
@pytest.mark.parametrize("linkage", ["complete", "single"])
def test_pruned_labels_match_unpruned(hasher, eps, linkage):
    mz, intensity = _chained_spectra(4, 60, seed=3)
    n = mz.shape[0]
    full = pairwise.condensed_distances(mz, intensity, FRAG_TOL)
    pruned = pairwise.pruned_condensed_distances(
        mz, intensity, hasher, eps, FRAG_TOL
    )
    assert pruned.shape == full.shape

    # Every entry the cut can read (<= eps in the true matrix) must be
    # exact; clamped entries must be provably irrelevant (> eps truly).
    le = full <= eps
    np.testing.assert_allclose(pruned[le], full[le], rtol=1e-4,
                               atol=1e-5)
    clamped = pruned == 1.0
    assert (full[clamped] > eps).all()
    # The pruning must actually fire at a loose eps on chained data.
    if eps == 0.3:
        assert clamped.sum() > 0

    lab_full = _flat_labels(full, n, eps, linkage)
    lab_pruned = _flat_labels(pruned, n, eps, linkage)
    # Same partition (label ids may permute).
    pairs_full = {tuple(sorted(np.flatnonzero(lab_full == c)))
                  for c in np.unique(lab_full)}
    pairs_pruned = {tuple(sorted(np.flatnonzero(lab_pruned == c)))
                    for c in np.unique(lab_pruned)}
    assert pairs_full == pairs_pruned


def test_pruned_medoids_match_complete(hasher):
    """Complete-linkage flat clusters have diameter <= eps, so every
    medoid row-sum reads only exact entries — medoids are invariant."""
    from falcon_tpu.cluster.postprocess import cluster_medoids

    eps = 0.25
    mz, intensity = _chained_spectra(3, 50, seed=7)
    n = mz.shape[0]
    full = pairwise.condensed_distances(mz, intensity, FRAG_TOL)
    pruned = pairwise.pruned_condensed_distances(
        mz, intensity, hasher, eps, FRAG_TOL
    )
    for pd_name, pd in (("full", full), ("pruned", pruned)):
        lab = _flat_labels(pd, n, eps, "complete")
        order1 = np.argsort(lab, kind="stable")
        med = cluster_medoids(
            np.arange(n, dtype=np.int64)[order1],
            lab[order1].astype(np.int32), pd, order1,
        )
        if pd_name == "full":
            want = med
        else:
            np.testing.assert_array_equal(med, want)


def test_min_matches_zeroing_matches_reference_semantics(hasher):
    """min_matches forces similarity to 0 (distance 1.0) in BOTH paths
    (reference falcon/cluster/cluster.py:620-626)."""
    eps = 0.3
    mz, intensity = _chained_spectra(2, 40, seed=11)
    full = pairwise.condensed_distances(mz, intensity, FRAG_TOL,
                                        min_matches=20)
    pruned = pairwise.pruned_condensed_distances(
        mz, intensity, hasher, eps, FRAG_TOL, min_matches=20
    )
    le = full <= eps
    np.testing.assert_allclose(pruned[le], full[le], rtol=1e-4,
                               atol=1e-5)


def test_tiny_and_degenerate_inputs(hasher):
    mz, intensity = _chained_spectra(1, 2, seed=1)
    out = pairwise.pruned_condensed_distances(
        mz[:1], intensity[:1], hasher, 0.2, FRAG_TOL
    )
    assert out.shape == (0,)
    out = pairwise.pruned_condensed_distances(
        mz, intensity, hasher, 0.2, FRAG_TOL
    )
    full = pairwise.condensed_distances(mz, intensity, FRAG_TOL)
    if full[0] <= 0.2:
        np.testing.assert_allclose(out, full, rtol=1e-4, atol=1e-5)
    # eps ~ 1 disables pruning entirely (thr <= 0) and falls back.
    out = pairwise.pruned_condensed_distances(
        mz, intensity, hasher, 1.0, FRAG_TOL
    )
    np.testing.assert_allclose(out, full, rtol=1e-4, atol=1e-5)


def test_engine_linkage_labels_prune_parity(tmp_path, monkeypatch):
    """End-to-end: the ann engine's linkage mode produces identical
    labels and medoids with pruning on and off (GROUP_MAX lowered so
    bench-sized components take the pruned large-component path)."""
    from falcon_tpu.cluster import ann_engine
    from falcon_tpu.ingest import prepare_spectra
    from falcon_tpu.simulate import make_clustered_spectra, write_mgf
    from falcon_tpu.store.store import SpectrumStore

    spectra, _ = make_clustered_spectra(
        n_clusters=12, cluster_size=14, n_noise=30, seed=21
    )
    path = write_mgf(str(tmp_path / "in.mgf"), spectra)
    store = SpectrumStore(str(tmp_path / "spectra"))
    kwargs = dict(min_peaks=5, min_mz_range=250.0, mz_min=101.0,
                  mz_max=1500.0, remove_precursor_tolerance=1.5,
                  min_intensity=0.01, max_peaks_used=50, scaling=None)
    charges = prepare_spectra(store, [path], kwargs)
    monkeypatch.setenv("FALCON_TPU_LINKAGE_GROUP_MAX", "4")
    results = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("FALCON_TPU_LINKAGE_PRUNE", flag)
        labels_all, medoids_all = [], []
        for charge in charges:
            ds = store.dataset(charge)
            labels, medoids = ann_engine.generate_clusters(
                ds, eps=0.3, min_samples=2, min_matches=0,
                precursor_tol_mass=20.0, precursor_tol_mode="ppm",
                rt_tol=None, fragment_tol=FRAG_TOL, batch_size=2**15,
                rerank="exact", cluster_method="linkage",
                linkage="complete",
            )
            labels_all.append(labels)
            medoids_all.append(medoids)
        results[flag] = (labels_all, medoids_all)
    for a, b in zip(results["0"][0], results["1"][0]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(results["0"][1], results["1"][1]):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
