"""Row-sharded exact pairwise scoring for the exact backend.

The exact engine scores each precursor-m/z interval's all-pairs
peak-matching cosine matrix on one device (``ops/pairwise.py``); this
module distributes a large interval's ROW PANELS over the device mesh —
rows sharded, the interval's (modest) peak arrays replicated — so the
condensed distance matrix of a 2^15-row interval is computed by N chips
in parallel.  Communication is a single broadcast of the column arrays;
the row panels are embarrassingly parallel (the reference proves the
block-diagonal structure needs no within-interval communication,
SURVEY.md §2.4).

Used by ``cluster/engine.py`` when ``--devices N`` is given; falls back
to the single-device path otherwise.  Parity with the single-device
scorer is enforced by tests/test_multichip.py.
"""

from typing import Optional

import numpy as np

from ..ops.matching import DEFAULT_ROUNDS
from ..ops.pairwise import PAD_MZ

_FNS = {}


def _build(mesh, axis, statics):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.matching import match_score, pair_weights

    fragment_tol, rounds, pair_chunk, n_pad, with_matches = statics

    def local_fn(row_ids, mz_cols, int_cols):
        # row_ids: (local,) global row indices of this shard's panel.
        local = row_ids.shape[0]
        n_cols = mz_cols.shape[0]
        q_mz = mz_cols[row_ids]
        q_int = int_cols[row_ids]
        n_pairs = local * n_cols
        n_chunks = max(1, (n_pairs + pair_chunk - 1) // pair_chunk)
        padded = n_chunks * pair_chunk
        ii, jj = jnp.divmod(jnp.arange(padded) % n_pairs, n_cols)

        def chunk_fn(carry, idx):
            del carry
            ci, cj = ii[idx], jj[idx]
            w = pair_weights(q_mz[ci], q_int[ci], mz_cols[cj],
                             int_cols[cj], fragment_tol)
            score, matches = match_score(w, rounds)
            return 0, (score, matches)

        idx = jnp.arange(padded).reshape(n_chunks, pair_chunk)
        _, (scores, matches) = jax.lax.scan(chunk_fn, 0, idx)
        scores = scores.reshape(-1)[:n_pairs].reshape(local, n_cols)
        if with_matches:
            matches = matches.reshape(-1)[:n_pairs].reshape(
                local, n_cols)
        else:
            matches = jnp.zeros((local, 1), jnp.int32)
        return scores, matches

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )


def condensed_distances_sharded(
    mz_pad: np.ndarray,
    int_pad: np.ndarray,
    fragment_tol: float,
    min_matches: int,
    mesh,
    rounds: int = DEFAULT_ROUNDS,
    pair_chunk: int = 4096,
    axis: str = "spectra",
) -> Optional[np.ndarray]:
    """Condensed distance matrix of one interval, rows over the mesh.

    Same contract as ``pairwise.condensed_distances``; returns the
    float32 condensed upper triangle.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, p = mz_pad.shape
    if n < 2:
        return np.zeros(0, np.float32)
    n_dev = mesh.devices.size
    n_cols = 128
    while n_cols < n:
        n_cols *= 2
    n_rows = max(n_cols, n_dev)  # divisible row count
    with_matches = min_matches > 0

    statics = (float(fragment_tol), int(rounds), int(pair_chunk),
               int(n_cols), bool(with_matches))
    key = (id(mesh), axis, statics)
    fn = _FNS.get(key)
    if fn is None:
        fn = _build(mesh, axis, statics)
        _FNS[key] = fn

    mz_cols = np.full((n_cols, p), PAD_MZ, np.float32)
    int_cols = np.zeros((n_cols, p), np.float32)
    mz_cols[:n], int_cols[:n] = mz_pad, int_pad
    row_ids = np.arange(n_rows, dtype=np.int32) % n_cols

    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    scores, matches = fn(
        jax.device_put(row_ids, shard),
        jax.device_put(jnp.asarray(mz_cols), rep),
        jax.device_put(jnp.asarray(int_cols), rep),
    )
    scores = np.asarray(scores)[:n, :n]
    if with_matches:
        matches = np.asarray(matches)[:n, :n]
        scores = np.where(matches >= min_matches, scores, 0.0)
    iu = np.triu_indices(n, k=1)
    return (1.0 - scores[iu]).astype(np.float32)
