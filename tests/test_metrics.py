"""Tests for the clustering quality metrics (falcon_tpu/metrics.py)."""

import numpy as np

from falcon_tpu import metrics


def test_nn_recall_perfect_and_partial():
    exact = np.array([[1, 2, 3], [0, 2, -1]])
    assert metrics.nn_recall_at_k(exact, exact, 3) == 1.0
    approx = np.array([[1, 2, 9], [0, 2, -1]])
    # Query 0: 2/3; query 1: 2/2.
    assert abs(metrics.nn_recall_at_k(approx, exact, 3)
               - (2 / 3 + 1.0) / 2) < 1e-9


def test_nn_recall_ignores_empty_exact_lists():
    exact = np.array([[-1, -1], [0, -1]])
    approx = np.array([[5, 6], [0, 3]])
    assert metrics.nn_recall_at_k(approx, exact, 2) == 1.0


def test_purity_majority_and_singleton_exclusion():
    # Cluster 0: 3x truth A + 1x truth B -> 3/4 correct.
    # Cluster 1: singleton (excluded).
    labels = np.array([0, 0, 0, 0, 1])
    truth = np.array([0, 0, 0, 1, 2])
    assert abs(metrics.cluster_purity(labels, truth) - 0.75) < 1e-9
    # All singletons -> vacuous purity 1.
    assert metrics.cluster_purity(np.arange(4), truth[:4]) == 1.0


def test_completeness_extremes():
    truth = np.array([0, 0, 1, 1])
    # Perfect: each truth class in one cluster.
    assert metrics.cluster_completeness(np.array([5, 5, 7, 7]),
                                        truth) == 1.0
    # Every point its own cluster: H(c|t) = log2 per class, H(c) = log4
    # -> completeness 0.5 under the standard V-measure definition.
    assert abs(metrics.cluster_completeness(np.arange(4), truth)
               - 0.5) < 1e-9
    # Single cluster -> H(cluster) == 0 -> defined as 1.
    assert metrics.cluster_completeness(np.zeros(4), truth) == 1.0


def test_clustered_fraction():
    assert metrics.clustered_fraction(np.array([0, 0, 1, 2])) == 0.5
    assert metrics.clustered_fraction(np.array([], np.int64)) == 0.0


def test_evaluate_bundle_on_good_clustering():
    from falcon_tpu.simulate import make_clustered_spectra

    _, truth = make_clustered_spectra(
        n_clusters=10, cluster_size=5, n_noise=5, seed=2
    )
    truth = np.asarray(truth)
    out = metrics.evaluate_clustering(truth, truth)
    assert out["purity"] == 1.0
    assert out["completeness"] == 1.0
    assert 0 < out["clustered_fraction"] < 1


def test_pairwise_agreement():
    from falcon_tpu.metrics import pairwise_agreement

    a = np.array([0, 0, 1, 1, 2])
    # identical partition, different numbering
    b = np.array([5, 5, 9, 9, 7])
    r = pairwise_agreement(a, b)
    assert r["precision"] == r["recall"] == r["f1"] == 1.0

    # b merges clusters 0 and 1: all of a's pairs survive (precision 1
    # from a's view: tp / pairs_a = 2/2), b has extra pairs.
    b2 = np.array([0, 0, 0, 0, 2])
    r2 = pairwise_agreement(a, b2)
    assert r2["precision"] == 1.0       # tp=2 / pairs_a=2
    assert r2["recall"] == 2 / 6        # tp=2 / pairs_b=6
    assert 0 < r2["f1"] < 1

    # all singletons on both sides
    r3 = pairwise_agreement(np.arange(4), np.arange(4) + 10)
    assert r3["f1"] == 1.0


def test_adversarial_corpus_stresses_purity():
    """The adversarial generator's near-duplicate twins put cross-class
    pairs above 1 - eps, so purity < 1.00 is structurally attainable
    (round-3 verdict #7: 'a quality corpus that can fail')."""
    import numpy as np

    from falcon_tpu.cluster.oracle import cosine_exact
    from falcon_tpu.preprocess import process_spectrum
    from falcon_tpu.simulate import make_adversarial_spectra

    spectra, labels = make_adversarial_spectra(
        n_clusters=40, cluster_size=4, n_noise=0, seed=3,
    )
    rows, kept = [], []
    for s, t in zip(spectra, labels):
        out = process_spectrum(s, 5, 250.0, 101.0, 1500.0, 1.5, 0.01,
                               50, None)
        if out is not None:
            rows.append(out)
            kept.append(t)
    kept = np.asarray(kept)
    # Find a cross-class pair within precursor tolerance whose exact
    # cosine distance is under eps=0.1 — the oracle-level proof that NO
    # eps-0.1 clustering can reach purity 1.0 on this corpus.
    pmz = np.asarray([r["precursor_mz"] for r in rows])
    chg = np.asarray([r["precursor_charge"] for r in rows])
    found = False
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if kept[i] == kept[j] or chg[i] != chg[j]:
                continue
            if abs(pmz[i] - pmz[j]) / pmz[j] * 1e6 > 20.0:
                continue
            s, _ = cosine_exact(rows[i]["mz"], rows[i]["intensity"],
                                rows[j]["mz"], rows[j]["intensity"],
                                0.05)
            if s >= 0.9:
                found = True
                break
        if found:
            break
    assert found, "no cross-class pair above 1 - eps; corpus too easy"
