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
