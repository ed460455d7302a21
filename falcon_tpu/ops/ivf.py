"""From-scratch TPU IVF (inverted file) nearest-neighbor index.

Replaces the reference's per-bucket Faiss IVF index (published algorithm,
reference ``README.md:132-142``; Faiss survives in the snapshot only as
dead code, ``falcon/cluster/spectrum.py:5``).  Design:

- **Coarse quantizer**: spherical k-means trained on the MXU — assignment
  is an argmax over ``V @ C.T`` inner products, the update is a
  segment-sum + renormalize.  Seeded and deterministic (SURVEY.md §4:
  the IVF path introduces k-means randomness that must be reproducible).
- **Lists**: vectors are reordered list-major on the host; each list is a
  contiguous slab.
- **Query**: ``Q @ C.T`` picks the top ``n_probe`` lists per query;
  execution is *inverted* — for each list, the queries probing it are
  grouped and scored against the list slab in one MXU matmul with a fused
  running top-k, so total FLOPs are the true IVF cost
  (n_queries x n_probe x avg_list_size x D) with full-size matmuls.
  Group/slab sizes are bucketed to powers of two to bound compilation
  count.

Precursor-tolerance masking composes at query time exactly like the
banded brute-force path (``ops/knn.py``).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-2.0)


@functools.partial(jax.jit, static_argnames=("n_lists", "n_iters"))
def _kmeans_fit(
    vectors: jnp.ndarray, init: jnp.ndarray, n_lists: int, n_iters: int
) -> jnp.ndarray:
    """Spherical k-means via Lloyd iterations on the MXU."""

    def step(centroids, _):
        sims = jnp.dot(vectors, centroids.T,
                       preferred_element_type=jnp.float32)
        assign = jnp.argmax(sims, axis=1)
        one_hot = jax.nn.one_hot(assign, n_lists, dtype=jnp.float32)
        sums = jnp.dot(one_hot.T, vectors,
                       preferred_element_type=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums, centroids)
        norms = jnp.linalg.norm(new, axis=1, keepdims=True)
        return new / jnp.maximum(norms, 1e-12), None

    centroids, _ = jax.lax.scan(step, init, None, length=n_iters)
    return centroids


@functools.partial(jax.jit, static_argnames=())
def _assign(vectors: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(
        jnp.dot(vectors, centroids.T, preferred_element_type=jnp.float32),
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("k", "tol_is_da"))
def _list_scan_topk(
    q_vec, q_mz, q_rows, l_vec, l_mz, l_rows, tol_mass, k, tol_is_da,
    prev_scores, prev_idx,
):
    """Score one query group against one list slab; merge into top-k."""
    sims = jnp.dot(q_vec, l_vec.T, preferred_element_type=jnp.float32)
    diff = q_mz[:, None] - l_mz[None, :]
    if tol_is_da:
        mass_diff = jnp.abs(diff)
    else:
        mass_diff = jnp.abs(diff / l_mz[None, :] * 1e6)
    valid = (
        (mass_diff <= tol_mass)
        & (q_rows[:, None] != l_rows[None, :])
        & (l_rows[None, :] >= 0)
    )
    sims = jnp.where(valid, sims, NEG)
    all_scores = jnp.concatenate([prev_scores, sims], axis=1)
    all_idx = jnp.concatenate(
        [prev_idx, jnp.broadcast_to(l_rows[None, :], sims.shape)], axis=1
    )
    top_scores, top_pos = jax.lax.top_k(all_scores, k)
    top_idx = jnp.take_along_axis(all_idx, top_pos, axis=1)
    return top_scores, top_idx


def _bucket(n: int, minimum: int = 128) -> int:
    size = minimum
    while size < n:
        size *= 2
    return size


class IVFIndex:
    """IVF index over L2-normalized vectors with precursor metadata."""

    def __init__(
        self,
        vectors: np.ndarray,
        precursor_mzs: np.ndarray,
        n_lists: Optional[int] = None,
        n_iters: int = 10,
        seed: int = 42,
    ):
        n, d = vectors.shape
        if n_lists is None:
            # Faiss heuristic: ~sqrt(n) lists.
            n_lists = max(1, min(n, int(np.sqrt(n) + 0.5)))
        self.n_lists = int(n_lists)
        rng = np.random.default_rng(seed)
        init = vectors[rng.choice(n, self.n_lists, replace=False)]
        self.centroids = np.asarray(_kmeans_fit(
            jnp.asarray(vectors), jnp.asarray(init), self.n_lists, n_iters
        ))
        assign = np.asarray(_assign(jnp.asarray(vectors),
                                    jnp.asarray(self.centroids)))
        # Reorder vectors list-major.
        self.order = np.argsort(assign, kind="stable")
        self.vectors = np.ascontiguousarray(vectors[self.order])
        self.mzs = np.asarray(precursor_mzs, np.float64)[self.order]
        self.rows = self.order.astype(np.int32)  # original row per slot
        counts = np.bincount(assign, minlength=self.n_lists)
        self.offsets = np.zeros(self.n_lists + 1, np.int64)
        np.cumsum(counts, out=self.offsets[1:])

    def search(
        self,
        q_vec: np.ndarray,
        q_mz: np.ndarray,
        q_rows: np.ndarray,
        k: int,
        n_probe: int = 32,
        tol_mass: float = np.inf,
        tol_mode: str = "Da",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """k-NN of each query; returns (similarities, original row ids).

        Queries are inverted into per-list groups; each (query group,
        list slab) pair is one MXU matmul.  Missing neighbors: sim -2,
        id -1.
        """
        nq = len(q_vec)
        n_probe = min(n_probe, self.n_lists)
        tol_is_da = tol_mode == "Da"
        # Which lists does each query probe?
        centroid_sims = q_vec @ self.centroids.T
        probe_lists = np.argpartition(
            -centroid_sims, n_probe - 1, axis=1
        )[:, :n_probe]

        scores = np.full((nq, k), float(NEG), np.float32)
        idx = np.full((nq, k), -1, np.int32)
        # Invert: list -> queries probing it.
        flat_lists = probe_lists.reshape(-1)
        flat_queries = np.repeat(np.arange(nq), n_probe)
        list_order = np.argsort(flat_lists, kind="stable")
        flat_lists = flat_lists[list_order]
        flat_queries = flat_queries[list_order]
        boundaries = np.searchsorted(
            flat_lists, np.arange(self.n_lists + 1)
        )

        def padded(a, size, fill):
            if len(a) == size:
                return a
            out = np.full((size,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        for lst in range(self.n_lists):
            qs = flat_queries[boundaries[lst]:boundaries[lst + 1]]
            lo, hi = int(self.offsets[lst]), int(self.offsets[lst + 1])
            if len(qs) == 0 or hi == lo:
                continue
            qb = _bucket(len(qs))
            lb = _bucket(hi - lo)
            new_scores, new_idx = _list_scan_topk(
                jnp.asarray(padded(q_vec[qs].astype(np.float32), qb, 0.0)),
                jnp.asarray(padded(q_mz[qs].astype(np.float32), qb,
                                   np.float32(-1e9))),
                jnp.asarray(padded(q_rows[qs].astype(np.int32), qb, -2)),
                jnp.asarray(padded(self.vectors[lo:hi], lb, 0.0)),
                jnp.asarray(padded(self.mzs[lo:hi].astype(np.float32), lb,
                                   np.float32(1e9))),
                jnp.asarray(padded(self.rows[lo:hi], lb, -1)),
                jnp.float32(tol_mass), k, tol_is_da,
                jnp.asarray(padded(scores[qs], qb, float(NEG))),
                jnp.asarray(padded(idx[qs], qb, -1)),
            )
            scores[qs] = np.asarray(new_scores)[: len(qs)]
            idx[qs] = np.asarray(new_idx)[: len(qs)]
        return scores, idx
