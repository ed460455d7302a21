"""Tests for exact candidate reranking (ops/rerank.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from falcon_tpu.ops.matching import pair_scores
from falcon_tpu.ops.rerank import rerank_exact


def _random_spectra(n, p=64, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(10, 40, n)
    mz = np.full((n, p), -1e6, np.float32)
    intensity = np.zeros((n, p), np.float32)
    for i, ln in enumerate(lengths):
        m = np.sort(rng.uniform(150, 1400, ln)).astype(np.float32)
        x = rng.random(ln).astype(np.float32)
        x /= np.linalg.norm(x)
        mz[i, :ln] = m
        intensity[i, :ln] = x
    return mz, intensity


def test_rerank_scores_match_direct_pair_scores():
    n, k = 40, 6
    mz, intensity = _random_spectra(n)
    rng = np.random.default_rng(1)
    neigh = np.stack([
        rng.choice(np.delete(np.arange(n), i), size=k, replace=False)
        for i in range(n)
    ]).astype(np.int32)
    scores, ids, matches = rerank_exact(mz, intensity, neigh, 0.05, k)
    for i in range(0, n, 7):
        for j_pos in range(k):
            j = ids[i, j_pos]
            assert j >= 0
            want, want_m = pair_scores(
                jnp.asarray(mz[i]), jnp.asarray(intensity[i]),
                jnp.asarray(mz[j]), jnp.asarray(intensity[j]), 0.05,
            )
            np.testing.assert_allclose(scores[i, j_pos], float(want),
                                       rtol=1e-5, atol=1e-6)
            assert matches[i, j_pos] == int(want_m)
        # Ranked descending.
        assert (np.diff(scores[i]) <= 1e-6).all()


def test_rerank_keeps_top_k_and_masks_missing():
    n, k_in, k_out = 16, 8, 3
    mz, intensity = _random_spectra(n, seed=2)
    rng = np.random.default_rng(3)
    neigh = np.full((n, k_in), -1, np.int32)
    # Row 0 has only 2 candidates; others full.
    neigh[0, :2] = [1, 2]
    for i in range(1, n):
        neigh[i] = rng.choice(np.delete(np.arange(n), i), size=k_in,
                              replace=False)
    scores, ids, _ = rerank_exact(mz, intensity, neigh, 0.05, k_out)
    assert scores.shape == (n, k_out)
    assert (ids[0, 2:] == -1).all()
    assert set(ids[0, :2].tolist()) <= {1, 2}
    # Full rows: ids drawn from the candidate set, exact top-k_out.
    for i in range(1, n, 5):
        all_scores = [
            float(pair_scores(
                jnp.asarray(mz[i]), jnp.asarray(intensity[i]),
                jnp.asarray(mz[j]), jnp.asarray(intensity[j]), 0.05,
            )[0])
            for j in neigh[i]
        ]
        want = np.sort(all_scores)[::-1][:k_out]
        np.testing.assert_allclose(np.sort(scores[i])[::-1], want,
                                   rtol=1e-5, atol=1e-6)


def test_ann_engine_rerank_improves_or_matches_recall(tmp_path):
    """End-to-end: the reranked ann backend clusters the synthetic data
    with at least the purity of the hash-only path."""
    from falcon_tpu import metrics
    from falcon_tpu.cluster import ann_engine
    from falcon_tpu.ingest import prepare_spectra
    from falcon_tpu.simulate import make_clustered_spectra, write_mgf
    from falcon_tpu.store.store import SpectrumStore

    spectra, truth = make_clustered_spectra(
        n_clusters=25, cluster_size=6, n_noise=40, seed=9
    )
    path = write_mgf(str(tmp_path / "in.mgf"), spectra)
    store = SpectrumStore(str(tmp_path / "spectra"))
    kwargs = dict(min_peaks=5, min_mz_range=250.0, mz_min=101.0,
                  mz_max=1500.0, remove_precursor_tolerance=1.5,
                  min_intensity=0.01, max_peaks_used=50, scaling=None)
    charges = prepare_spectra(store, [path], kwargs)
    purities = {}
    for mode in ("off", "exact"):
        labels_all = []
        truth_all = []
        for charge in charges:
            ds = store.dataset(charge)
            meta = ds.read_metadata()
            labels, _ = ann_engine.generate_clusters(
                ds, eps=0.1, min_samples=2, min_matches=0,
                precursor_tol_mass=20.0, precursor_tol_mode="ppm",
                rt_tol=None, fragment_tol=0.05, batch_size=2**15,
                rerank=mode,
            )
            labels_all.append(labels + (len(labels_all) + 1) * 100000)
            truth_all.extend(
                i.split("_scan")[0].split("_member")[0]
                for i in meta["identifier"]
            )
        labels_all = np.concatenate(labels_all)
        truth_ids = {t: n for n, t in enumerate(sorted(set(truth_all)))}
        truth_arr = np.asarray([truth_ids[t] for t in truth_all])
        purities[mode] = metrics.cluster_purity(labels_all, truth_arr)
    assert purities["exact"] >= purities["off"] - 1e-9
    assert purities["exact"] > 0.95
