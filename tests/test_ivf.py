import numpy as np
import pytest

from falcon_tpu.ops.ivf import IVFIndex


@pytest.fixture(scope="module")
def clustered_vectors():
    rng = np.random.default_rng(0)
    n_centers, per, d = 30, 40, 128
    centers = rng.normal(size=(n_centers, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        0, 0.15, (n_centers * per, d)
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    mzs = np.sort(rng.uniform(400, 1200, len(vecs)))
    return vecs.astype(np.float32), mzs


def test_ivf_deterministic(clustered_vectors):
    vecs, mzs = clustered_vectors
    a = IVFIndex(vecs, mzs, n_lists=32, seed=42)
    b = IVFIndex(vecs, mzs, n_lists=32, seed=42)
    np.testing.assert_allclose(a.centroids, b.centroids)
    np.testing.assert_array_equal(a.order, b.order)


def test_ivf_recall_vs_bruteforce(clustered_vectors):
    vecs, mzs = clustered_vectors
    index = IVFIndex(vecs, mzs, n_lists=32, seed=42)
    rng = np.random.default_rng(1)
    q = rng.choice(len(vecs), 64, replace=False)
    k = 10
    sims, idx = index.search(
        vecs[q], mzs[q], q.astype(np.int32), k,
        n_probe=8, tol_mass=np.inf, tol_mode="Da",
    )
    full = vecs[q] @ vecs.T
    hits = total = 0
    for qi, row in enumerate(q):
        exact = full[qi].copy()
        exact[row] = -2
        want = set(np.argsort(-exact)[:k].tolist())
        got = set(int(x) for x in idx[qi] if x >= 0)
        hits += len(want & got)
        total += k
    recall = hits / total
    assert recall >= 0.9, recall
    # Full probe = exact.
    sims_f, idx_f = index.search(
        vecs[q], mzs[q], q.astype(np.int32), k,
        n_probe=32, tol_mass=np.inf, tol_mode="Da",
    )
    for qi, row in enumerate(q):
        exact = full[qi].copy()
        exact[row] = -2
        # The scan matmul runs in bf16 (scores only rank candidates for
        # the exact rerank) — compare at bf16 resolution.
        np.testing.assert_allclose(
            np.sort(sims_f[qi])[::-1],
            np.sort(exact)[::-1][:k],
            atol=4e-3,
        )


def test_ivf_non_power_of_two_n_lists(clustered_vectors):
    # n_lists is forced to a power of two (round down): a tiny corpus
    # (2 < n < 16 -> n_lists = min(16, n)) or an explicit odd n_lists
    # previously crashed the chunked probe scan's reshape (advisor
    # round-2 finding).
    vecs, mzs = clustered_vectors
    small = IVFIndex(vecs[:7], mzs[:7], seed=42)
    assert small.n_lists in (1, 2, 4)
    sims, idx = small.search(
        vecs[:7], mzs[:7], np.arange(7, dtype=np.int32), 3,
        n_probe=16, tol_mass=np.inf, tol_mode="Da",
    )
    assert idx.shape == (7, 3)
    assert (idx[:, 0] >= 0).all()

    odd = IVFIndex(vecs, mzs, n_lists=20, seed=42)
    assert odd.n_lists == 16
    sims, idx = odd.search(
        vecs[:8], mzs[:8], np.arange(8, dtype=np.int32), 4,
        n_probe=16, tol_mass=np.inf, tol_mode="Da",
    )
    assert idx.shape == (8, 4)


def test_ivf_precise_float32_scan(clustered_vectors):
    # precise=True (storage AND scan in float32): similarities match the
    # NumPy exact inner products to float32 tolerance (not just bf16's).
    vecs, mzs = clustered_vectors
    index = IVFIndex(vecs, mzs, n_lists=32, seed=42, precise=True)
    rng = np.random.default_rng(2)
    q = rng.choice(len(vecs), 32, replace=False)
    k = 5
    sims, idx = index.search(
        vecs[q], mzs[q], q.astype(np.int32), k,
        n_probe=32, tol_mass=np.inf, tol_mode="Da", precise=True,
    )
    full = vecs[q] @ vecs.T
    for qi, row in enumerate(q):
        exact = full[qi].copy()
        exact[row] = -2
        np.testing.assert_allclose(
            np.sort(sims[qi])[::-1],
            np.sort(exact)[::-1][:k],
            atol=2e-5,
        )


def test_ivf_precursor_tolerance_mask(clustered_vectors):
    vecs, mzs = clustered_vectors
    index = IVFIndex(vecs, mzs, n_lists=16, seed=42)
    q = np.arange(10)
    sims, idx = index.search(
        vecs[q], mzs[q], q.astype(np.int32), 5,
        n_probe=16, tol_mass=0.5, tol_mode="Da",
    )
    for qi in range(len(q)):
        for sim, j in zip(sims[qi], idx[qi]):
            if j >= 0:
                assert abs(mzs[j] - mzs[q[qi]]) <= 0.5
                assert j != q[qi]


def test_balanced_placement_caps_and_spills():
    from falcon_tpu.ops.ivf import _balanced_placement

    # 10 rows all preferring list 0 with cap 4: 4 land in list 0, the
    # rest fall to their 2nd choice (list 1, cap 4), then spill
    # capacity-round-robin over the remaining lists.
    choices = np.tile(np.array([[0, 1]]), (10, 1))
    order, counts = _balanced_placement(choices, 4, 4)
    assert counts[0] == 4 and counts[1] == 4
    assert counts.sum() == 10
    assert counts.max() <= 4  # the cap is a hard bound
    # Rank priority: rows 0-3 (first in row order) won list 0, rows
    # 4-7 won list 1, rows 8-9 spilled to list 2.
    assert order[:4].tolist() == [0, 1, 2, 3]
    assert order[4:8].tolist() == [4, 5, 6, 7]
    assert order[8:].tolist() == [8, 9] and counts[2] == 2
    # Deterministic: same input -> same placement.
    order2, counts2 = _balanced_placement(choices, 4, 4)
    np.testing.assert_array_equal(order, order2)
    np.testing.assert_array_equal(counts, counts2)
    # Every row placed exactly once.
    assert sorted(order.tolist()) == list(range(10))


def test_balanced_placement_matches_greedy_oracle():
    # The vectorized rank-pass placement must match a straightforward
    # per-row greedy oracle processing choices rank-major.
    rng = np.random.default_rng(3)
    n, n_lists, k, cap = 500, 8, 3, 128
    choices = np.stack([rng.permutation(n_lists)[:k] for _ in range(n)])
    order, counts = _balanced_placement_import()(choices, n_lists, cap)

    assigned = np.full(n, -1)
    oracle_counts = np.zeros(n_lists, np.int64)
    for rank in range(k):
        for row in range(n):
            if assigned[row] >= 0:
                continue
            lst = choices[row, rank]
            if oracle_counts[lst] < cap:
                assigned[row] = lst
                oracle_counts[lst] += 1
    np.testing.assert_array_equal(counts, oracle_counts)
    np.testing.assert_array_equal(order, np.argsort(assigned,
                                                    kind="stable"))


def _balanced_placement_import():
    from falcon_tpu.ops.ivf import _balanced_placement

    return _balanced_placement


def test_ivf_slab_memory_is_bounded(clustered_vectors):
    # Even with an adversarial assignment skew, the slab width is the
    # capacity cap, not the largest k-means list.
    vecs, mzs = clustered_vectors
    # Make all vectors nearly identical so k-means wants one giant list.
    skew = np.tile(vecs[:1], (len(vecs), 1)) + 1e-4 * vecs
    skew /= np.linalg.norm(skew, axis=1, keepdims=True)
    index = IVFIndex(skew.astype(np.float32), mzs, n_lists=16, seed=42)
    n = len(mzs)
    cap_expected = 128
    while cap_expected < 2 * ((n + 15) // 16):
        cap_expected *= 2
    assert index._lb <= cap_expected
    # The index still answers self-queries.
    sims, idx = index.search(
        skew.astype(np.float32), mzs, np.arange(n, dtype=np.int32), 3,
        n_probe=16, tol_mass=np.inf, tol_mode="Da",
    )
    assert (idx[:, 0] >= 0).all()


def test_ivf_coarse_and_rank_vectors(clustered_vectors):
    """An index built with a separate coarse embedding and asymmetric
    rank vectors (the spread-UB configuration, round-4 verdict item 4)
    retrieves by rank_q . vectors_c and keeps at least the recall of
    the symmetric index on well-separated clusters."""
    vecs, mzs = clustered_vectors
    n = len(vecs)
    rng = np.random.default_rng(7)
    # A "spread-like" coarse/rank embedding: the scoring vectors plus
    # correlated noise (stands in for the tolerance-spread transform —
    # the unit here is plumbing, not hash physics).
    coarse = vecs + rng.normal(0, 0.02, vecs.shape).astype(np.float32)
    coarse /= np.linalg.norm(coarse, axis=1, keepdims=True)
    rank = 1.5 * vecs  # strict upper bound of the inner product

    sym = IVFIndex(vecs, mzs, n_lists=32, seed=42)
    asym = IVFIndex(vecs, mzs, n_lists=32, seed=42,
                    coarse_vectors=coarse, rank_vectors=rank)
    assert asym._query3d is not None
    k = 10
    s_sym, i_sym = sym.search(
        vecs, mzs, np.arange(n, dtype=np.int32), k, n_probe=32,
    )
    s_asym, i_asym = asym.search(
        vecs, mzs, np.arange(n, dtype=np.int32), k, n_probe=32,
    )
    # Asymmetric scan scores = 1.5x the symmetric inner products for
    # the same pairs; neighbor sets stay high-overlap.
    overlap = []
    for q in range(0, n, 37):
        a = set(i_sym[q][i_sym[q] >= 0].tolist())
        b = set(i_asym[q][i_asym[q] >= 0].tolist())
        if a or b:
            overlap.append(len(a & b) / max(len(a | b), 1))
    assert np.mean(overlap) > 0.8
    got = s_asym[s_asym > -1.0]
    assert got.max() <= 1.5 + 1e-3
    # Determinism with the same coarse/rank inputs.
    asym2 = IVFIndex(vecs, mzs, n_lists=32, seed=42,
                     coarse_vectors=coarse, rank_vectors=rank)
    np.testing.assert_array_equal(asym.order, asym2.order)
