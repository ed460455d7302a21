"""Blocked all-pairs spectrum similarity — the Pallas TPU kernel.

This is the hot kernel of the exact backend: the reference evaluates
``cosine_fast`` once per spectrum pair with one ThreadPoolExecutor future
per pair (``falcon/cluster/cluster.py:630-637``, its hottest loop; SURVEY.md
§3.2); here a single Pallas kernel computes a whole (rows × cols) panel of
pair scores, keeping the per-pair (P × P) weight matrices resident in VMEM
across the locally-dominant matching rounds (see ``ops/matching.py`` for
the algorithm and its accuracy vs the Hungarian optimum).

Layout: spectra are padded ``(n, P)`` m/z / intensity arrays.  The grid is
(rows × column tiles); each kernel instance matches one row spectrum
against TILE_J column spectra with a live ``(TILE_J, P, P)`` weight tensor
(2 MB at the defaults) in VMEM.  Row spectra are fed peak-major
``(n, P, 1)`` so their peaks sit on sublanes without any lane<->sublane
relayout, and the kernel body contains no unrolled loops (Mosaic compile
time stays low).

For condensed (upper-triangle) distance computation the kernel skips
column tiles entirely at-or-below the diagonal, using a scalar-prefetched
global row offset so one compiled kernel serves every row panel.  Panel
and column sizes are bucketed to powers of two so the number of distinct
compiled shapes stays logarithmic in the largest interval.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import (DEFAULT_ROUNDS, block_scores_xla, match_rounds_body,
                       match_score, pair_weights)

TILE_J = 512   # columns per grid step (per output block)
SUB = 16       # columns matched per inner-loop iteration (live W size)
PAD_MZ = -1e6  # padding m/z: outside every tolerance window
_VMEM_LIMIT = 64 * 1024 * 1024


def _pair_panel_kernel(
    row_off_ref,  # scalar prefetch: (1,) global row offset of this panel
    mz_i_ref,     # (1, P, 1)   one row spectrum, peak-major
    int_i_ref,    # (1, P, 1)
    mz_j_ref,     # (TILE_J, P) column spectra
    int_j_ref,    # (TILE_J, P)
    score_ref,    # (1, TILE_J, 1) f32 out
    match_ref,    # (1, TILE_J, 1) i32 out, or None (match counts skipped)
    *,
    fragment_tol: float,
    rounds: int,
    upper_only: bool,
    tile_j: int = TILE_J,
    sub: int = SUB,
    early_exit: bool = True,
):
    # NOTES:
    # - every value is kept >= 2-D; Mosaic's layout inference aborts on
    #   rank-1 vectors (observed on v5e);
    # - the live weight tensor is only (SUB, P, P): Mosaic unrolls
    #   elementwise ops to vreg granularity, so IR size (and compile time)
    #   scales with the largest live value — the inner fori_loop over
    #   column subtiles keeps the compiled body small while the grid step
    #   still covers TILE_J columns;
    # - with upper_only, subtiles entirely at-or-below the diagonal are
    #   skipped by starting the loop at the first needed subtile; their
    #   output region is left unwritten and the host never reads it.
    i = pl.program_id(0)
    j0 = pl.program_id(1) * tile_j
    gi = row_off_ref[0] + i
    n_sub = tile_j // sub
    if upper_only:
        # First subtile s whose max column index j0 + s*sub + sub-1 > gi.
        s_start = jnp.maximum(0, (gi - j0 - sub + 1) // sub + 1)
    else:
        s_start = 0

    mz_i = mz_i_ref[0][None, :, :]    # (1, P, 1)
    int_i = int_i_ref[0][None, :, :]  # (1, P, 1)

    def sub_body(s, _):
        off = pl.multiple_of(s * sub, sub)
        mz_j = mz_j_ref[pl.ds(off, sub), :][:, None, :]    # (SUB, 1, P)
        int_j = int_j_ref[pl.ds(off, sub), :][:, None, :]  # (SUB, 1, P)
        # (SUB, P_i, P_j) banded intensity products.
        within = jnp.abs(mz_i - mz_j) <= fragment_tol
        w = jnp.where(within, int_i * int_j, 0.0)

        def round_body(carry):
            w, score, matches, r = carry
            w, selected, cand = match_rounds_body(w)
            # Reduce (SUB, P, P) -> (SUB, 1) in two 2-D steps.
            score = score + jnp.sum(
                jnp.sum(selected, axis=-1), axis=-1, keepdims=True
            )
            matches = matches + jnp.sum(
                jnp.sum(cand.astype(jnp.int32), axis=-1),
                axis=-1, keepdims=True,
            )
            return w, score, matches, r + 1

        def round_cond(carry):
            w, _, _, r = carry
            # Early exit once every weight in the subtile is consumed —
            # real spectrum pairs typically finish in 1-2 rounds.
            return jnp.logical_and(r < rounds, jnp.max(w) > 0)

        score0 = jnp.zeros((w.shape[0], 1), jnp.float32)
        match0 = jnp.zeros((w.shape[0], 1), jnp.int32)
        if early_exit:
            _, score, matches, _ = jax.lax.while_loop(
                round_cond, round_body, (w, score0, match0, jnp.int32(0))
            )
        else:
            _, score, matches, _ = jax.lax.fori_loop(
                0, rounds,
                lambda _, c: round_body(c),
                (w, score0, match0, jnp.int32(0)),
            )
        score_ref[0, pl.ds(off, sub), :] = jnp.clip(score, 0.0, 1.0)
        if match_ref is not None:
            match_ref[0, pl.ds(off, sub), :] = matches
        return 0

    jax.lax.fori_loop(s_start, n_sub, sub_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("fragment_tol", "rounds", "upper_only", "interpret",
                     "tile_j", "sub", "with_matches", "early_exit"),
)
def panel_scores_pallas(
    mz_rows: jnp.ndarray,
    int_rows: jnp.ndarray,
    mz_cols: jnp.ndarray,
    int_cols: jnp.ndarray,
    row_offset: jnp.ndarray,
    fragment_tol: float,
    rounds: int = DEFAULT_ROUNDS,
    upper_only: bool = False,
    interpret: bool = False,
    tile_j: int = TILE_J,
    sub: int = SUB,
    with_matches: bool = True,
    early_exit: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scores for every (row, col) spectrum pair of a panel.

    ``mz_rows``/``int_rows``: (n_rows, P); ``mz_cols``/``int_cols``:
    (n_cols, P) with n_cols % TILE_J == 0.  ``row_offset``: scalar int32 —
    the global index of row 0, used with ``upper_only`` to skip
    below-diagonal tiles.  Returns (scores, matches), each
    (n_rows, n_cols); ``matches`` is None when ``with_matches`` is False
    (saves compute and halves the device->host transfer — the default
    ``min_matched_peaks = 0`` never reads it).
    """
    n_rows, p = mz_rows.shape
    n_cols = mz_cols.shape[0]
    grid = (n_rows, n_cols // tile_j)
    impl = functools.partial(
        _pair_panel_kernel,
        fragment_tol=float(fragment_tol),
        rounds=int(rounds),
        upper_only=bool(upper_only),
        tile_j=int(tile_j),
        sub=int(sub),
        early_exit=bool(early_exit),
    )
    if with_matches:
        kernel = impl
    else:
        def kernel(row_off_ref, mzi, inti, mzj, intj, score_ref):
            impl(row_off_ref, mzi, inti, mzj, intj, score_ref, None)

    out_spec = pl.BlockSpec((1, tile_j, 1), lambda i, j, s: (i, j, 0))
    score_shape = jax.ShapeDtypeStruct((n_rows, n_cols, 1), jnp.float32)
    match_shape = jax.ShapeDtypeStruct((n_rows, n_cols, 1), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p, 1), lambda i, j, s: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, j, s: (i, 0, 0)),
            pl.BlockSpec((tile_j, p), lambda i, j, s: (j, 0)),
            pl.BlockSpec((tile_j, p), lambda i, j, s: (j, 0)),
        ],
        out_specs=[out_spec, out_spec] if with_matches else [out_spec],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [score_shape, match_shape] if with_matches else [score_shape]
        ),
        # The matching rounds keep a few (SUB, P, P) temporaries live at
        # once, which can exceed the 16 MB default scoped-VMEM budget at
        # larger subtile sizes; v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        jnp.asarray(row_offset, jnp.int32).reshape(1),
        mz_rows[:, :, None], int_rows[:, :, None], mz_cols, int_cols,
    )
    scores = outs[0][:, :, 0]
    matches = outs[1][:, :, 0] if with_matches else None
    return scores, matches


@functools.partial(
    jax.jit, static_argnames=("fragment_tol", "rounds", "pair_chunk")
)
def batched_block_scores(
    mz: jnp.ndarray,        # (B, m, P) padded spectra per interval
    intensity: jnp.ndarray,
    fragment_tol: float,
    rounds: int = DEFAULT_ROUNDS,
    pair_chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs scores for B same-size intervals in ONE dispatch.

    The exact engine's precursor-m/z splits produce hundreds of small
    intervals; scoring each with its own device call is dominated by
    per-dispatch latency on a tunneled TPU.  This kernel flattens the
    B * m * (m-1) / 2 upper-triangle pairs of a whole size-class group
    into one chunked ``lax.scan`` (weights stay (pair_chunk, P, P)).

    Returns (scores, matches), each (B, m, m), upper triangle filled
    (diagonal and lower triangle are zero).
    """
    b, m, p = mz.shape
    iu_i, iu_j = jnp.triu_indices(m, k=1)
    n_tri = iu_i.shape[0]
    n_pairs = b * n_tri
    n_chunks = max(1, (n_pairs + pair_chunk - 1) // pair_chunk)
    padded = n_chunks * pair_chunk
    flat = jnp.arange(padded) % n_pairs
    bb, tt = jnp.divmod(flat, n_tri)
    ii, jj = iu_i[tt], iu_j[tt]

    mz2 = mz.reshape(b * m, p)
    int2 = intensity.reshape(b * m, p)

    def chunk_fn(carry, idx):
        del carry
        qi = bb[idx] * m + ii[idx]
        qj = bb[idx] * m + jj[idx]
        w = pair_weights(mz2[qi], int2[qi], mz2[qj], int2[qj],
                         fragment_tol)
        score, matches = match_score(w, rounds)
        return 0, (score, matches)

    idx = jnp.arange(padded).reshape(n_chunks, pair_chunk)
    _, (scores, matches) = jax.lax.scan(chunk_fn, 0, idx)
    scores = scores.reshape(-1)[:n_pairs]
    matches = matches.reshape(-1)[:n_pairs]
    out_s = jnp.zeros((b, m, m), jnp.float32)
    out_m = jnp.zeros((b, m, m), jnp.int32)
    bb_r = jnp.arange(n_pairs) // n_tri
    tt_r = jnp.arange(n_pairs) % n_tri
    out_s = out_s.at[bb_r, iu_i[tt_r], iu_j[tt_r]].set(scores)
    out_m = out_m.at[bb_r, iu_i[tt_r], iu_j[tt_r]].set(matches)
    return out_s, out_m


def grouped_condensed_distances(
    interval_peaks,  # list of (mz (m_i, P), intensity (m_i, P))
    fragment_tol: float,
    min_matches: int = 0,
    rounds: int = DEFAULT_ROUNDS,
    max_group_cells: int = 16 * 2**20,
    devices=None,
):
    """Condensed distance matrices for many small intervals, batched.

    Intervals are bucketed by the power-of-two envelope of their size and
    scored in groups of up to ``max_group_cells`` (B * m_pad^2) cells per
    dispatch.  Yields (original interval index, condensed float32 pdist)
    in arbitrary order.

    ``devices``: optional list of JAX devices.  Group dispatches are
    round-robined over them with a bounded in-flight window (async
    dispatch keeps every device busy; results are fetched in dispatch
    order), so the linkage engine's per-component scoring scales over a
    ``--devices N`` mesh (SURVEY §2.4 / §7 step 5) instead of idling
    N - 1 chips during its dominant stage.
    """
    by_size = {}
    for idx, (mz, intensity) in enumerate(interval_peaks):
        m = mz.shape[0]
        m_pad = 8
        while m_pad < m:
            m_pad *= 2
        by_size.setdefault(m_pad, []).append(idx)

    tasks = []
    for m_pad, indices in sorted(by_size.items()):
        group_cap = max(1, max_group_cells // (m_pad * m_pad))
        for g0 in range(0, len(indices), group_cap):
            tasks.append((m_pad, indices[g0:g0 + group_cap]))

    def dispatch(task_i):
        m_pad, group = tasks[task_i]
        # Pad the group count to a power of two for stable shapes.
        b_pad = 1
        while b_pad < len(group):
            b_pad *= 2
        p = interval_peaks[group[0]][0].shape[1]
        mz_g = np.full((b_pad, m_pad, p), PAD_MZ, np.float32)
        int_g = np.zeros((b_pad, m_pad, p), np.float32)
        for gi, idx in enumerate(group):
            mz_i, int_i = interval_peaks[idx]
            mz_g[gi, : mz_i.shape[0]] = mz_i
            int_g[gi, : int_i.shape[0]] = int_i
        if devices:
            dev = devices[task_i % len(devices)]
            mz_d = jax.device_put(mz_g, dev)
            int_d = jax.device_put(int_g, dev)
        else:
            mz_d, int_d = jnp.asarray(mz_g), jnp.asarray(int_g)
        scores, matches = batched_block_scores(
            mz_d, int_d, float(fragment_tol), rounds,
        )
        return group, scores, matches

    def drain(pending):
        group, scores, matches = pending.pop(0)
        scores = np.asarray(scores)
        if min_matches > 0:
            matches = np.asarray(matches)
            scores = np.where(matches >= min_matches, scores, 0.0)
        out = []
        for gi, idx in enumerate(group):
            m = interval_peaks[idx][0].shape[0]
            iu = np.triu_indices(m, k=1)
            out.append(
                (idx, (1.0 - scores[gi][:m, :m][iu]).astype(np.float32))
            )
        return out

    window = 2 * len(devices) if devices else 1
    pending = []
    for task_i in range(len(tasks)):
        pending.append(dispatch(task_i))
        if len(pending) >= window:
            yield from drain(pending)
    while pending:
        yield from drain(pending)


@functools.partial(jax.jit, static_argnames=("thr", "panel"))
def _ub_pass_counts(spread, plain, thr, panel):
    """Per-row count of upper-triangle pairs whose tolerance-spread
    upper bound ``spread_i . plain_j`` reaches ``thr``.  One dispatch:
    a ``lax.scan`` over row panels of the (m, m) bound matrix."""
    m = spread.shape[0]
    plain_t = plain.T
    cols = jnp.arange(m, dtype=jnp.int32)[None, :]

    def body(_, i):
        r0 = i * panel
        s = jax.lax.dynamic_slice_in_dim(spread, r0, panel)
        ub = s @ plain_t
        rows = (r0 + jnp.arange(panel, dtype=jnp.int32))[:, None]
        ok = (cols > rows) & (ub >= thr)
        return 0, jnp.sum(ok, axis=1).astype(jnp.int32)

    _, counts = jax.lax.scan(
        body, 0, jnp.arange(m // panel, dtype=jnp.int32)
    )
    return counts.reshape(m)


@functools.partial(jax.jit, static_argnames=("thr", "k", "panel"))
def _ub_pass_topk(spread, plain, thr, k, panel):
    """Column ids of the upper-triangle pairs passing the spread bound,
    per row, -1 padded.  ``k`` must cover the max per-row pass count
    (from ``_ub_pass_counts``).  Per-panel ``top_k`` with NO cross-step
    running merge (the in-scan merged-carry shape class faults the
    pooled TPU worker; see CLAUDE.md / ops/knn.py)."""
    m = spread.shape[0]
    plain_t = plain.T
    cols = jnp.arange(m, dtype=jnp.int32)[None, :]

    def body(_, i):
        r0 = i * panel
        s = jax.lax.dynamic_slice_in_dim(spread, r0, panel)
        ub = s @ plain_t
        rows = (r0 + jnp.arange(panel, dtype=jnp.int32))[:, None]
        ok = (cols > rows) & (ub >= thr)
        vals, pos = jax.lax.top_k(jnp.where(ok, ub, -1.0), k)
        return 0, jnp.where(vals >= thr, pos.astype(jnp.int32), -1)

    _, ids = jax.lax.scan(
        body, 0, jnp.arange(m // panel, dtype=jnp.int32)
    )
    return ids.reshape(m, k)


# Pool-variant rerank (queries and candidate pool are different arrays)
# for row-chunked exact scoring of the pruned pair lists.
def _rerank_pool():
    from .rerank import rerank_scan_body

    return functools.partial(
        jax.jit,
        static_argnames=("fragment_tol", "k_out", "rounds", "chunk_q",
                         "chunk_c"),
    )(rerank_scan_body)


_RERANK_POOL = None


def pruned_condensed_distances(
    mz: np.ndarray,
    intensity: np.ndarray,
    hasher,
    eps: float,
    fragment_tol: float,
    min_matches: int = 0,
    rounds: int = 4,
    panel_rows: int = 1024,
    device=None,
) -> np.ndarray:
    """Condensed distances with provably-unused pairs clamped to 1.0.

    The linkage cut at ``eps`` (reference default semantics,
    ``falcon/cluster/cluster.py:280-290``) never reads the exact value
    of a distance > ``eps`` — for COMPLETE linkage every merge at
    height <= eps involves only pairwise distances <= eps (cluster
    diameter equals merge height), and for SINGLE linkage the flat
    clusters at eps are the connected components of the <=eps graph;
    reducible linkages are monotone, so all >eps merges happen above
    the cut in both the true and the clamped matrix.  Exact
    peak-matching scores are therefore computed ONLY for pairs whose
    tolerance-spread upper bound (``ops/vectorize.py`` docstring: a
    strict upper bound on the matched-peak score when bin width >=
    fragment tolerance) can reach ``1 - eps``; every other pair's
    distance is clamped to 1.0.  NOT valid for average linkage (merge
    heights are means over >eps distances too) — callers must keep
    full scoring there.

    Medoids (min row-sum, reference ``cluster.py:512-553``) read only
    intra-flat-cluster entries; under complete linkage those all have
    true distance <= eps, hence exact scores, so medoids are invariant
    too.  Under single linkage a chained flat cluster can span >eps
    pairs whose clamped value shifts row sums — a documented
    tie-break-level divergence (PARITY.md).

    Flow (all device work, 4 dispatches + small fetches): hash the
    block's peaks into spread/plain vectors, count passing pairs per
    row (one scanned matmul pass), take the per-row top-k_max bound
    ids (second pass), exact-score the surviving (row, col) pair lists
    with the rerank kernel (``ops/rerank.py``), and fill the condensed
    matrix on host with 1 - score (1.0 elsewhere).
    """
    from .knn import NEG, _pow2_at_least

    n = mz.shape[0]
    if n < 2:
        return np.zeros(0, np.float32)
    thr = 1.0 - float(eps) - 1e-3
    if thr <= 0.0:
        # eps ~ 1: nothing can be pruned.
        return condensed_distances(mz, intensity, fragment_tol,
                                   min_matches, rounds=DEFAULT_ROUNDS,
                                   device=device)
    m_pad = _pow2_at_least(n, 512)
    put = ((lambda a: jax.device_put(a, device)) if device is not None
           else jnp.asarray)
    mz_d = put(_pad_rows(np.asarray(mz, np.float32), m_pad, PAD_MZ))
    int_d = put(_pad_rows(np.asarray(intensity, np.float32), m_pad, 0.0))
    # Padding rows hash to zero vectors (PAD_MZ is outside the binning
    # range), so their bounds are 0 < thr and they can never pass.
    spread = hasher.vectorize(mz_d, int_d, norm=False, spread=True)
    plain = hasher.vectorize(mz_d, int_d, norm=False)
    panel = min(panel_rows, m_pad)

    counts = np.asarray(_ub_pass_counts(spread, plain, thr, panel))
    kmax = int(counts.max(initial=0))
    if kmax == 0:
        return np.ones(n * (n - 1) // 2, np.float32)
    k = _pow2_at_least(kmax, 16)
    if k > m_pad // 4:
        # Dense component: most pairs pass the bound, the panel kernel
        # is cheaper than gather-based pair scoring.
        return condensed_distances(mz, intensity, fragment_tol,
                                   min_matches, rounds=DEFAULT_ROUNDS,
                                   device=device)
    neigh = _ub_pass_topk(spread, plain, thr, k, panel)

    # Exact-score the pair lists, row-chunked so the resident
    # (rows, k) slabs stay far inside the measured HBM fault envelope
    # (rows * k * 8 <= 2^28; CLAUDE.md).
    row_chunk = m_pad
    while row_chunk * k > 2**23 and row_chunk > 512:
        row_chunk //= 2
    global _RERANK_POOL
    if _RERANK_POOL is None:
        _RERANK_POOL = _rerank_pool()
    scores = np.full((m_pad, k), float(NEG), np.float32)
    ids = np.full((m_pad, k), -1, np.int32)
    matches = np.zeros((m_pad, k), np.int32)
    for r0 in range(0, m_pad, row_chunk):
        s, i_, mt = _RERANK_POOL(
            jax.lax.dynamic_slice_in_dim(mz_d, r0, row_chunk),
            jax.lax.dynamic_slice_in_dim(int_d, r0, row_chunk),
            mz_d, int_d,
            jax.lax.dynamic_slice_in_dim(neigh, r0, row_chunk),
            fragment_tol=float(fragment_tol), k_out=k,
            rounds=int(rounds), chunk_q=min(512, row_chunk), chunk_c=16,
        )
        scores[r0:r0 + row_chunk] = np.asarray(s)
        ids[r0:r0 + row_chunk] = np.asarray(i_)
        matches[r0:r0 + row_chunk] = np.asarray(mt)

    out = np.ones(n * (n - 1) // 2, np.float32)
    scores, ids, matches = scores[:n], ids[:n], matches[:n]
    valid = (ids >= 0) & (scores > float(NEG))
    if min_matches > 0:
        # Reference semantics: too few matched peaks forces similarity
        # to 0, i.e. distance 1.0 — identical to the clamp
        # (falcon/cluster/cluster.py:620-626).
        valid &= matches >= min_matches
    ii = np.broadcast_to(
        np.arange(n, dtype=np.int64)[:, None], ids.shape
    )[valid]
    jj = ids[valid].astype(np.int64)
    cond = ii * n - ii * (ii + 1) // 2 + (jj - ii - 1)
    out[cond] = 1.0 - np.clip(scores[valid], 0.0, 1.0)
    return out


def _pad_rows(a: np.ndarray, target: int, fill: float) -> np.ndarray:
    n = a.shape[0]
    if n == target:
        return a
    return np.concatenate(
        [a, np.full((target - n,) + a.shape[1:], fill, a.dtype)], axis=0
    )


def _bucket_size(n: int, minimum: int = TILE_J) -> int:  # noqa: D401
    """Next power of two >= n (at least ``minimum``), so the number of
    distinct compiled kernel shapes stays logarithmic.  One shared
    bucketing rule for every stage (``knn._pow2_at_least``) — a policy
    change (e.g. a cap) must apply everywhere or the compile cache
    fragments into different shape families per stage."""
    from .knn import _pow2_at_least

    return _pow2_at_least(n, minimum)


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def condensed_distances(
    mz: np.ndarray,
    intensity: np.ndarray,
    fragment_tol: float,
    min_matches: int = 0,
    rounds: int = DEFAULT_ROUNDS,
    panel_rows: int = 2048,
    backend: Optional[str] = None,
    device=None,
) -> np.ndarray:
    """Condensed upper-triangle distance matrix for one block of spectra.

    Semantics of reference ``compute_condensed_distance_matrix``
    (``falcon/cluster/cluster.py:593-639``): distance = 1 - similarity,
    with similarity forced to 0 when fewer than ``min_matches`` peaks
    match.  Row panels are streamed through the device so HBM usage is
    O(panel_rows * n) rather than O(n^2).

    ``backend``: None -> auto (Pallas on TPU, XLA elsewhere);
    "pallas_interpret" forces the Pallas kernel in interpreter mode (for
    CPU testing of the kernel itself); "xla" forces the XLA fallback.
    """
    n = mz.shape[0]
    if n < 2:
        return np.zeros(0, np.float32)
    if backend is None:
        backend = "pallas" if use_pallas() else "xla"

    out = np.ones(n * (n - 1) // 2, np.float32)

    put = ((lambda a: jax.device_put(a, device)) if device is not None
           else jnp.asarray)

    if backend == "xla":
        scores, matches = block_scores_xla(
            put(np.asarray(mz, np.float32)),
            put(np.asarray(intensity, np.float32)), float(fragment_tol),
            rounds,
        )
        scores = np.asarray(scores)
        if min_matches > 0:
            scores = np.where(np.asarray(matches) >= min_matches,
                              scores, 0.0)
        iu = np.triu_indices(n, k=1)
        out[:] = 1.0 - scores[iu]
        return out

    interpret = backend == "pallas_interpret"
    n_cols = _bucket_size(n)
    mz_cols = put(_pad_rows(np.asarray(mz, np.float32), n_cols, PAD_MZ))
    int_cols = put(
        _pad_rows(np.asarray(intensity, np.float32), n_cols, 0.0)
    )
    panel = min(panel_rows, n_cols)

    with_matches = min_matches > 0
    for r0 in range(0, n - 1, panel):
        r1 = min(r0 + panel, n)
        mz_rows = _pad_rows(mz[r0:r1].astype(np.float32), panel, PAD_MZ)
        int_rows = _pad_rows(intensity[r0:r1].astype(np.float32), panel,
                             0.0)
        scores, matches = panel_scores_pallas(
            put(mz_rows), put(int_rows),
            mz_cols, int_cols,
            jnp.int32(r0), float(fragment_tol), rounds,
            upper_only=True, interpret=interpret,
            with_matches=with_matches,
        )
        scores = np.asarray(scores)[: r1 - r0, :n]
        if with_matches:
            matches = np.asarray(matches)[: r1 - r0, :n]
            scores = np.where(matches >= min_matches, scores, 0.0)
        for local_i in range(r1 - r0):
            gi = r0 + local_i
            if gi + 1 >= n:
                continue
            # Condensed row slice for row gi: indices of (gi, gi+1..n-1).
            start = n * gi - gi * (gi + 1) // 2
            out[start:start + (n - 1 - gi)] = (
                1.0 - scores[local_i, gi + 1:]
            )
    return out
