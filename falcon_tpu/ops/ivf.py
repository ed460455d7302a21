"""From-scratch TPU IVF (inverted file) nearest-neighbor index.

Replaces the reference's per-bucket Faiss IVF index (published algorithm,
reference ``README.md:132-142``; Faiss survives in the snapshot only as
dead code, ``falcon/cluster/spectrum.py:5``).  Design:

- **Coarse quantizer**: spherical k-means trained on the MXU — assignment
  is an argmax over ``V @ C.T`` inner products, the update is a
  segment-sum + renormalize.  Seeded and deterministic (SURVEY.md §4:
  the IVF path introduces k-means randomness that must be reproducible).
- **Lists**: vectors are reordered list-major on the host; each list is a
  contiguous slab of the device-resident corpus matrix.
- **Query**: ``Q @ C.T`` picks the top ``n_probe`` lists per query;
  execution is *inverted* — queries probing the same list form a group,
  groups are bucketed by (query-group, list-slab) power-of-two size
  class, and every class is scored in ONE batched dispatch (gathered
  query block x dynamic-sliced slab on the MXU, fused per-list top-k).
  A final single top-k merges each query's per-list candidates.  Total
  dispatch count is logarithmic in the size spread — not linear in the
  number of lists — which matters both for tunneled TPUs (tens of ms per
  dispatch) and for keeping the MXU fed with large batched matmuls.

Each probed list contributes at most ``per_list_k`` candidates to the
final merge (default ``min(k, 32)``) to bound the merge buffer; with the
default over-retrieval + exact rerank downstream this does not measurably
affect recall (tests/test_ivf.py).

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


@functools.partial(jax.jit, static_argnames=("n_probe",))
def _probe_topk(q_vec, centroids, n_probe):
    sims = jnp.dot(q_vec, centroids.T, preferred_element_type=jnp.float32)
    _, lists = jax.lax.top_k(sims, n_probe)
    return lists


@functools.partial(
    jax.jit,
    static_argnames=("k_p", "tol_is_da", "qb", "lb", "n_probe", "k"),
)
def _scan_and_merge(
    q_vec,        # (nq_pad, D) device-resident queries
    q_mz,         # (nq_pad,)
    q_orig,       # (nq_pad,) original row id per query
    corpus,       # (n_pad, D) device-resident list-major corpus
    corpus_mz,    # (n_pad,)
    corpus_rows,  # (n_pad,) original row id per corpus slot
    q_idx,        # (G, qb) query ids per group, -1 padding
    slab_lo,      # (G,)
    slab_len,     # (G,)
    perm,         # (nq_pad * n_probe,) buffer position per query-major
                  # pair; G*qb = dump slot for padding
    tol_mass,
    k_p: int,
    tol_is_da: bool,
    qb: int,
    lb: int,
    n_probe: int,
    k: int,
):
    """IVF query in ONE dispatch: scan all (query group, list slab)
    pairs, then merge each query's per-list candidates — nothing but the
    final (nq_pad, k) results ever leaves the device."""

    def one_group(args):
        qi, lo, ln = args
        safe_q = jnp.maximum(qi, 0)
        q = q_vec[safe_q]
        qm = q_mz[safe_q]
        qr = q_orig[safe_q]
        slab = jax.lax.dynamic_slice_in_dim(corpus, lo, lb)
        sm = jax.lax.dynamic_slice_in_dim(corpus_mz, lo, lb)
        sr = jax.lax.dynamic_slice_in_dim(corpus_rows, lo, lb)
        sims = jnp.dot(q, slab.T, preferred_element_type=jnp.float32)
        diff = qm[:, None] - sm[None, :]
        if tol_is_da:
            mass_diff = jnp.abs(diff)
        else:
            mass_diff = jnp.abs(diff / sm[None, :] * 1e6)
        col = jnp.arange(lb, dtype=jnp.int32)
        valid = (
            (mass_diff <= tol_mass)
            & (col[None, :] < ln)
            & (qi[:, None] >= 0)
            & (qr[:, None] != sr[None, :])
        )
        sims = jnp.where(valid, sims, NEG)
        top_scores, top_pos = jax.lax.approx_max_k(
            sims, k_p, recall_target=0.99
        )
        top_slot = jnp.where(top_scores > NEG, lo + top_pos, -1)
        return top_scores, top_slot

    scores, slots = jax.lax.map(
        one_group, (q_idx, slab_lo, slab_len)
    )  # (G, qb, k_p)
    g = q_idx.shape[0]
    buf_s = jnp.concatenate(
        [scores.reshape(g * qb, k_p),
         jnp.full((1, k_p), NEG)]
    )
    buf_i = jnp.concatenate(
        [slots.reshape(g * qb, k_p),
         jnp.full((1, k_p), -1, slots.dtype)]
    )
    cand_s = buf_s[perm].reshape(-1, n_probe * k_p)
    cand_slot = buf_i[perm].reshape(-1, n_probe * k_p)
    cand_rows = jnp.where(
        cand_slot >= 0,
        corpus_rows[jnp.clip(cand_slot, 0, corpus_rows.shape[0] - 1)],
        -1,
    )
    nq_pad = cand_s.shape[0]
    self_mask = cand_rows == q_orig[:nq_pad][:, None]
    cand_s = jnp.where(self_mask | (cand_rows < 0), NEG, cand_s)
    top_scores, top_pos = jax.lax.top_k(cand_s, k)
    top_rows = jnp.take_along_axis(cand_rows, top_pos, axis=1)
    return top_scores, jnp.where(top_scores > NEG, top_rows, -1)


def _bucket(n: int, minimum: int = 128) -> int:
    size = minimum
    while size < n:
        size *= 2
    return size


class IVFIndex:
    """IVF index over L2-normalized vectors with precursor metadata."""

    def __init__(
        self,
        vectors,
        precursor_mzs: np.ndarray,
        n_lists: Optional[int] = None,
        n_iters: int = 10,
        seed: int = 42,
    ):
        """``vectors``: (n, D) L2-normalized, NumPy or DEVICE-resident
        (pass the vectorizer's device output — the big matrix then never
        crosses the host boundary: training, list reordering, and
        queries are all device gathers)."""
        from .xfer import device_put_chunked

        # ``vectors`` may carry padded zero rows past len(precursor_mzs)
        # (the engines keep device arrays at power-of-two row counts);
        # only the first n rows are indexed.
        n = len(precursor_mzs)
        d = vectors.shape[1]
        if n_lists is None:
            # Faiss heuristic: ~sqrt(n) lists.
            n_lists = max(1, min(n, int(np.sqrt(n) + 0.5)))
        self.n_lists = int(n_lists)
        rng = np.random.default_rng(seed)
        init_rows = rng.choice(n, self.n_lists, replace=False)
        if isinstance(vectors, np.ndarray):
            vectors_dev = device_put_chunked(
                np.ascontiguousarray(vectors, dtype=np.float32)
            )
        else:
            vectors_dev = vectors
        init = vectors_dev[jnp.asarray(init_rows)]
        self.centroids = np.asarray(_kmeans_fit(
            vectors_dev, init, self.n_lists, n_iters
        ))
        # Only the n int32 assignments cross to the host.
        assign = np.asarray(_assign(vectors_dev,
                                    jnp.asarray(self.centroids)))[:n]
        # Reorder list-major ON DEVICE (gather); keep the corpus padded
        # so slab slices never run off the end.
        self.order = np.argsort(assign, kind="stable")
        self.mzs = np.asarray(precursor_mzs, np.float64)[self.order]
        self.rows = self.order.astype(np.int32)  # original row per slot
        counts = np.bincount(assign, minlength=self.n_lists)
        self.offsets = np.zeros(self.n_lists + 1, np.int64)
        np.cumsum(counts, out=self.offsets[1:])
        self._max_list = int(counts.max(initial=1))
        pad = _bucket(self._max_list)
        gather = np.concatenate(
            [self.order, np.zeros(pad, np.int64)]
        ).astype(np.int32)
        self._corpus = vectors_dev[jnp.asarray(gather)]
        # Padding slots must be zero vectors (they alias row order[0]
        # via the gather) — masked by corpus_mz = +big below, and zeroed
        # here for cleanliness.
        self._corpus = self._corpus.at[len(self.order):].set(0.0)
        self._corpus_mz = jnp.asarray(np.concatenate(
            [self.mzs, np.full(pad, 1e12)]
        ).astype(np.float32))
        self._corpus_rows = jnp.asarray(np.concatenate(
            [self.rows, np.full(pad, -1, np.int32)]
        ))

    def search(
        self,
        q_vec: np.ndarray,
        q_mz: np.ndarray,
        q_rows: np.ndarray,
        k: int,
        n_probe: int = 32,
        tol_mass: float = np.inf,
        tol_mode: str = "Da",
        per_list_k: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """k-NN of each query; returns (similarities, original row ids).

        Missing neighbors: sim -2, id -1.  ``per_list_k`` bounds each
        probed list's contribution to the final merge.
        """
        nq = len(q_mz)
        n_probe = min(n_probe, self.n_lists)
        k_p = min(k, per_list_k or max(k // 8, 16), self._max_list)
        k_p = max(k_p, 1)
        tol_is_da = tol_mode == "Da"

        nq_pad = _bucket(nq, 512)
        if isinstance(q_vec, np.ndarray):
            from .xfer import device_put_chunked

            q_pad = np.zeros((nq_pad, q_vec.shape[1]), np.float32)
            q_pad[:nq] = q_vec[:nq]
            q_vec_dev = device_put_chunked(q_pad)
        elif q_vec.shape[0] < nq_pad:
            q_vec_dev = jnp.pad(
                q_vec, ((0, nq_pad - q_vec.shape[0]), (0, 0))
            )
        else:
            q_vec_dev = q_vec[:nq_pad]
        q_mz_dev = jnp.asarray(np.concatenate(
            [np.asarray(q_mz, np.float32),
             np.full(nq_pad - nq, 1e12, np.float32)]
        ))
        q_orig_dev = jnp.asarray(np.concatenate(
            [np.asarray(q_rows, np.int32),
             np.full(nq_pad - nq, -2, np.int32)]
        ))

        # Probe selection on device (one dispatch).
        probe_lists = np.asarray(_probe_topk(
            q_vec_dev, jnp.asarray(self.centroids), n_probe
        ))[:nq]

        # Invert (query, probe) pairs to per-list groups.
        flat_lists = probe_lists.reshape(-1)
        flat_queries = np.repeat(np.arange(nq, dtype=np.int32), n_probe)
        list_order = np.argsort(flat_lists, kind="stable")
        flat_lists_s = flat_lists[list_order]
        flat_queries_s = flat_queries[list_order]
        boundaries = np.searchsorted(
            flat_lists_s, np.arange(self.n_lists + 1)
        )

        # (query group, list slab) work items with ONE compiled shape:
        # qb fixed per index run, lb = the padded max list size.  The
        # whole query — every group scan plus the per-query merge — runs
        # as ONE device dispatch (_scan_and_merge); only the final
        # (nq, k) results come back.
        lb = _bucket(self._max_list, 128)
        qb = min(_bucket(int(
            np.diff(boundaries).max(initial=1)), 128), 4096)
        groups = []
        for lst in range(self.n_lists):
            b0, b1 = boundaries[lst], boundaries[lst + 1]
            lo, hi = int(self.offsets[lst]), int(self.offsets[lst + 1])
            if b0 == b1 or hi == lo:
                continue
            for c0 in range(b0, b1, qb):
                groups.append((c0, min(c0 + qb, b1), lo, hi - lo))
        g_pad = _bucket(max(len(groups), 1), 1)
        q_idx = np.full((g_pad, qb), -1, np.int32)
        slab_lo = np.zeros(g_pad, np.int32)
        slab_len = np.zeros(g_pad, np.int32)
        # perm: query-major pair position -> buffer slot (group*qb +
        # offset); the trailing buffer row is the NEG/-1 dump for
        # unassigned pairs.
        perm = np.full(nq_pad * n_probe, g_pad * qb, np.int32)
        for gi, (c0, c1, lo, ln) in enumerate(groups):
            q_idx[gi, : c1 - c0] = flat_queries_s[c0:c1]
            slab_lo[gi] = lo
            slab_len[gi] = ln
            perm[list_order[c0:c1]] = gi * qb + np.arange(
                c1 - c0, dtype=np.int32
            )
        top_scores, top_idx = _scan_and_merge(
            q_vec_dev, q_mz_dev, q_orig_dev,
            self._corpus, self._corpus_mz, self._corpus_rows,
            jnp.asarray(q_idx), jnp.asarray(slab_lo),
            jnp.asarray(slab_len), jnp.asarray(perm),
            jnp.float32(tol_mass),
            min(k_p, lb), tol_is_da, qb, lb, n_probe,
            min(k, n_probe * min(k_p, lb)),
        )
        out_scores = np.array(top_scores[:nq])
        out_idx = np.asarray(top_idx)[:nq]
        if out_scores.shape[1] < k:
            pad = k - out_scores.shape[1]
            out_scores = np.concatenate(
                [out_scores, np.full((nq, pad), float(NEG), np.float32)],
                axis=1,
            )
            out_idx = np.concatenate(
                [out_idx, np.full((nq, pad), -1, np.int32)], axis=1
            )
        return out_scores, out_idx
