"""Tests for device DBSCAN label propagation (ops/density.py) against a
direct host reference implementation."""

import numpy as np

from falcon_tpu.ops.density import dbscan


def host_dbscan(sims, neigh, eps, min_samples):
    """Reference implementation (union-find over core-core edges)."""
    n = len(sims)
    within = (neigh >= 0) & ((1.0 - sims) <= eps)
    core = within.sum(axis=1) + 1 >= min_samples
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j_pos in range(neigh.shape[1]):
            j = neigh[i, j_pos]
            if j >= 0 and within[i, j_pos] and core[j]:
                ra, rb = find(i), find(int(j))
                if ra != rb:
                    parent[ra] = rb
    labels = np.full(n, -1, np.int64)
    seen = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            labels[i] = seen.setdefault(r, len(seen))
    for i in range(n):
        if core[i]:
            continue
        best, best_sim = -1, -np.inf
        for j_pos in range(neigh.shape[1]):
            j = neigh[i, j_pos]
            if (j >= 0 and within[i, j_pos] and core[j]
                    and sims[i, j_pos] > best_sim):
                best, best_sim = int(j), sims[i, j_pos]
        if best >= 0:
            labels[i] = labels[best]
    uniq, counts = np.unique(labels[labels >= 0], return_counts=True)
    for u in uniq[counts < 2]:
        labels[labels == u] = -1
    return labels


def _random_graph(n, k, seed, frac_close=0.3):
    rng = np.random.default_rng(seed)
    neigh = np.full((n, k), -1, np.int64)
    sims = np.full((n, k), -2.0, np.float32)
    for i in range(n):
        m = rng.integers(0, k + 1)
        if m:
            cand = rng.choice(np.delete(np.arange(n), i), m,
                              replace=False)
            neigh[i, :m] = cand
            close = rng.random(m) < frac_close
            sims[i, :m] = np.where(
                close, rng.uniform(0.92, 1.0, m),
                rng.uniform(0.0, 0.7, m),
            )
    return sims, neigh


def _same_partition(a, b):
    assert (a == -1).sum() == (b == -1).sum()
    mapping = {}
    for x, y in zip(a, b):
        if x == -1 or y == -1:
            assert x == y == -1 or (x == -1) == (y == -1)
            continue
        assert mapping.setdefault(x, y) == y
    # Injective both ways.
    assert len(set(mapping.values())) == len(mapping)


def test_dbscan_matches_host_reference():
    for seed in range(5):
        sims, neigh = _random_graph(120, 8, seed)
        got = dbscan(sims, neigh, eps=0.1, n=120, min_samples=2)
        want = host_dbscan(sims, neigh, eps=0.1, min_samples=2)
        _same_partition(got, want)


def test_dbscan_min_samples_and_chain():
    # A long chain of mutually-close core points must collapse into ONE
    # cluster (stresses propagation depth).
    n = 200
    neigh = np.full((n, 2), -1, np.int64)
    sims = np.full((n, 2), -2.0, np.float32)
    for i in range(n - 1):
        neigh[i, 0] = i + 1
        sims[i, 0] = 0.99
    got = dbscan(sims, neigh, eps=0.1, n=n, min_samples=2)
    # Node n-1 lists no neighbors itself (asymmetric top-k lists), so it
    # is not core and has no core out-neighbor -> noise; all others form
    # ONE cluster.
    assert (got[:-1] == got[0]).all() and got[0] >= 0
    assert got[-1] == -1
    # min_samples=3: interior chain points see only 2 neighbors (1
    # out-edge listed) -> everything noise with these asymmetric lists.
    got3 = dbscan(sims, neigh, eps=0.1, n=n, min_samples=3)
    assert (got3 == -1).all()


def test_dbscan_all_noise_and_empty():
    sims = np.full((10, 4), -2.0, np.float32)
    neigh = np.full((10, 4), -1, np.int64)
    got = dbscan(sims, neigh, eps=0.1, n=10, min_samples=2)
    assert (got == -1).all()
