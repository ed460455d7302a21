"""Banded k-nearest-neighbor search over hashed spectrum vectors.

The published falcon algorithm finds each spectrum's nearest neighbors
among spectra within the precursor m/z tolerance (reference
``README.md:132-142``; per-bucket Faiss IVF indexes).  TPU-native design:
spectra are already sorted by precursor m/z, so the tolerance constraint
makes the candidate set a contiguous *band* around the diagonal — k-NN
becomes banded blocked matmuls on the MXU with a fused running top-k, no
inverted index needed until bands outgrow HBM (see ``ops/ivf.py`` for
that regime).

All similarities are inner products of L2-normalized vectors; distance =
1 - similarity.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-2.0)  # below any cosine similarity


@functools.partial(
    jax.jit,
    static_argnames=("k", "tol_is_da"),
)
def _block_topk(
    q_vec: jnp.ndarray,       # (B, D) query vectors
    q_mz: jnp.ndarray,        # (B,) query precursor m/z
    q_rows: jnp.ndarray,      # (B,) global row ids of queries
    c_vec: jnp.ndarray,       # (C, D) candidate vectors
    c_mz: jnp.ndarray,        # (C,) candidate precursor m/z
    c_rows: jnp.ndarray,      # (C,) global row ids of candidates
    tol_mass: jnp.ndarray,    # scalar
    k: int,
    tol_is_da: bool,
    prev_scores: jnp.ndarray,  # (B, k) running best scores
    prev_idx: jnp.ndarray,     # (B, k) running best global rows
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score one candidate block and merge into the running top-k."""
    sims = jnp.dot(q_vec, c_vec.T, preferred_element_type=jnp.float32)
    diff = q_mz[:, None] - c_mz[None, :]
    if tol_is_da:
        mass_diff = jnp.abs(diff)
    else:
        mass_diff = jnp.abs(diff / c_mz[None, :] * 1e6)
    valid = (
        (mass_diff <= tol_mass)
        & (q_rows[:, None] != c_rows[None, :])
        & (c_rows[None, :] >= 0)  # candidate padding
    )
    sims = jnp.where(valid, sims, NEG)
    all_scores = jnp.concatenate([prev_scores, sims], axis=1)
    all_idx = jnp.concatenate(
        [prev_idx, jnp.broadcast_to(c_rows[None, :], sims.shape)], axis=1
    )
    top_scores, top_pos = jax.lax.top_k(all_scores, k)
    top_idx = jnp.take_along_axis(all_idx, top_pos, axis=1)
    return top_scores, top_idx


def knn_banded(
    vectors: np.ndarray,
    precursor_mzs: np.ndarray,
    tol_mass: float,
    tol_mode: str,
    k: int,
    block_rows: int = 4096,
    block_cols: int = 8192,
    rts: Optional[np.ndarray] = None,
    rt_tol: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors within the precursor tolerance band.

    ``vectors`` (n, D) L2-normalized, ``precursor_mzs`` (n,) SORTED
    ascending.  Returns (similarities (n, k), neighbor row indices
    (n, k)); missing neighbors have similarity -2 and index -1.
    """
    n = len(precursor_mzs)
    mzs = np.asarray(precursor_mzs, np.float64)
    tol_is_da = tol_mode == "Da"

    # Band bounds per row (inclusive lo, exclusive hi) via searchsorted.
    if tol_is_da:
        lo_vals, hi_vals = mzs - tol_mass, mzs + tol_mass
    else:
        lo_vals = mzs / (1 + tol_mass / 1e6)
        hi_vals = mzs * (1 + tol_mass / 1e6)
    band_lo = np.searchsorted(mzs, lo_vals, side="left")
    band_hi = np.searchsorted(mzs, hi_vals, side="right")

    out_scores = np.full((n, k), float(NEG), np.float32)
    out_idx = np.full((n, k), -1, np.int64)
    vectors = np.asarray(vectors, np.float32)
    d = vectors.shape[1]

    def padded(a, size, fill):
        if len(a) == size:
            return a
        pad_shape = (size - len(a),) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    block_rows = min(block_rows, max(128, n))
    block_cols = min(block_cols, max(128, n))
    for r0 in range(0, n, block_rows):
        r1 = min(r0 + block_rows, n)
        lo = int(band_lo[r0])
        hi = int(band_hi[r1 - 1])
        # Fixed block shapes so there is exactly one compilation.
        q_vec = jnp.asarray(padded(vectors[r0:r1], block_rows, 0.0))
        q_mz = jnp.asarray(
            padded(mzs[r0:r1].astype(np.float32), block_rows, -1e9)
        )
        q_rows = jnp.asarray(
            padded(np.arange(r0, r1, dtype=np.int32), block_rows, -1)
        )
        scores = jnp.full((block_rows, k), NEG)
        idx = jnp.full((block_rows, k), -1, jnp.int32)
        for c0 in range(lo, hi, block_cols):
            c1 = min(c0 + block_cols, hi)
            scores, idx = _block_topk(
                q_vec, q_mz, q_rows,
                jnp.asarray(padded(vectors[c0:c1], block_cols, 0.0)),
                jnp.asarray(
                    padded(mzs[c0:c1].astype(np.float32), block_cols,
                           np.float32(1e9))
                ),
                jnp.asarray(
                    padded(np.arange(c0, c1, dtype=np.int32), block_cols,
                           -1)
                ),
                jnp.float32(tol_mass), k, tol_is_da,
                scores, idx,
            )
        out_scores[r0:r1] = np.asarray(scores)[: r1 - r0]
        out_idx[r0:r1] = np.asarray(idx)[: r1 - r0]

    # Optional retention-time post-filter.
    if rt_tol is not None and rts is not None:
        rts = np.asarray(rts, np.float64)
        neigh_rt = np.where(out_idx >= 0, rts[np.clip(out_idx, 0, n - 1)],
                            np.inf)
        bad = np.abs(neigh_rt - rts[:, None]) > rt_tol
        out_scores[bad] = float(NEG)
        out_idx[bad] = -1
    return out_scores, out_idx
