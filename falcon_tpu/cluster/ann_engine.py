"""Scalable clustering engine — the published falcon algorithm, TPU-first.

Pipeline (reference ``README.md:119-146``; the snapshot's code no longer
contains it, cf. SURVEY.md §0):

1. spectra -> binned, MurmurHash3-feature-hashed, L2-normalized dense
   vectors (``ops/vectorize.py``) — MXU-friendly scatter + matmuls;
2. k-nearest neighbors within the precursor m/z tolerance: the sorted
   precursor order makes candidates a contiguous band, so k-NN is banded
   blocked matmuls with fused top-k, column-STREAMED for bands beyond
   HBM (``ops/knn.py``); the from-scratch TPU IVF index stays available
   via ``--ann_index ivf`` (``ops/ivf.py``; measured recall in that
   regime documented in README "Index selection");
3. cluster formation from the sparse distance matrix
   (1 - inner product, tolerance-masked), two methods:

   - ``cluster_method="linkage"`` (default): eps-connected components
     via device label propagation, then the REFERENCE's hierarchical
     clustering (``--linkage`` criterion, ``fcluster`` cut at eps,
     reference ``falcon/cluster/cluster.py:280-290``) on exact
     peak-matching distances inside each component.  Cutting a
     reducible linkage (single/complete/average) at ``t`` never merges
     across single-linkage-at-``t`` components, so per-component
     linkage reproduces the full-matrix flat clusters exactly — the
     scalable backend produces reference-default labels
     (tests/test_ann.py parity vs the exact engine).
   - ``cluster_method="dbscan"``: the published algorithm's density
     clustering with ``min_samples`` core points, eps-reachable core
     components, and border attachment (ops/density.py);
4. the same cluster refinement as the exact engine (precursor m/z / RT
   splitting, noise -> singletons, medoid representatives), so both
   backends share output semantics.
"""

import logging
from typing import Optional, Tuple

import numpy as np


from ..ops.knn import knn_banded, NEG
from ..ops.vectorize import SpectrumHasher
from ..store.store import ChargeDataset, padded_peaks
from ..utils.profiling import StageTimer
from .postprocess import (
    cluster_group_slices,
    cluster_medoids,
    postprocess_cluster,
)

logger = logging.getLogger("falcon_tpu")

_medoid_scores_jit = None

import contextlib as _contextlib
import os as _os
import threading as _threading

# Gauge of concurrently running device blocks (observability for the
# cross-block dispatch; tests assert max >= 2 when blocks parallelize).
_block_gauge = {"active": 0, "max": 0}
_block_gauge_lock = _threading.Lock()


def _scan_bf16() -> bool:
    """bf16 upper-bound scan toggle (default ON; FALCON_TPU_KNN_DTYPE=
    f32 restores the float32 scan).  Only the PREFILTER scan consults
    this — eps-threshold consumers (no-rerank paths) always keep f32."""
    return _os.environ.get("FALCON_TPU_KNN_DTYPE", "bf16") != "f32"


@_contextlib.contextmanager
def _block_gauge_tracked():
    with _block_gauge_lock:
        _block_gauge["active"] += 1
        _block_gauge["max"] = max(_block_gauge["max"],
                                  _block_gauge["active"])
    try:
        yield
    finally:
        with _block_gauge_lock:
            _block_gauge["active"] -= 1

_SYNC_STAGES = _os.environ.get("FALCON_TPU_SYNC_STAGES") == "1"


def device_block_cap() -> int:
    """Rows per device mega-block (``FALCON_TPU_DEVICE_BLOCK_CAP``).

    Default 2^19: MEASURED as the largest block size whose arrays fit
    HBM with the default 2-deep block pipeline (two 2^20-row blocks
    resident OOM the device right after the k-NN stage; two 2^19-row
    blocks ran the 25M corpus at its best wall clock).  The CLI's
    charge-overlap threshold reads the SAME value (two sub-cap charges
    occupy the same memory envelope as two pipelined blocks), so keep
    every consumer on this helper.
    """
    return int(_os.environ.get("FALCON_TPU_DEVICE_BLOCK_CAP", 2**19))


def _sync(*arrays):
    """Block on device arrays at stage boundaries when the
    FALCON_TPU_SYNC_STAGES=1 diagnostic is on, so the profiler's
    per-stage times reflect device cost instead of async dispatch
    (cost otherwise lands in whichever stage first forces a fetch)."""
    if _SYNC_STAGES:
        import jax
        import jax.numpy as jnp

        for a in arrays:
            if a is not None and not isinstance(a, np.ndarray):
                jax.block_until_ready(a)
                # The tunneled backend's block_until_ready (and a
                # tiny-slice fetch) can return before execution
                # finishes (CLAUDE.md); fetching a scalar REDUCTION of
                # the whole array cannot — it depends on every element.
                float(jnp.sum(a.astype(jnp.float32)))


_normalize_jit = None


def _normalize_rows(v):
    """L2-normalize rows on device (idempotent tiny jit)."""
    global _normalize_jit
    if _normalize_jit is None:
        import jax
        import jax.numpy as jnp

        _normalize_jit = jax.jit(
            lambda x: x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
        )
    return _normalize_jit(v)


def _medoid_scores(vectors_dev, seg: np.ndarray, n_seg: int) -> np.ndarray:
    """Per-row medoid scores v_i . sum_{j in segment(i)} v_j on device.

    Shapes are bucketed to powers of two (rows and segment count) so the
    kernel compiles once per size class.
    """
    global _medoid_scores_jit
    import functools

    import jax
    import jax.numpy as jnp

    if _medoid_scores_jit is None:
        @functools.partial(jax.jit, static_argnames=("n_seg_pad",))
        def fn(v, seg_idx, n_seg_pad):
            sums = jnp.zeros((n_seg_pad, v.shape[1]), jnp.float32)
            sums = sums.at[seg_idx].add(v)
            return jnp.einsum("nd,nd->n", v, sums[seg_idx])

        _medoid_scores_jit = fn

    n_rows = vectors_dev.shape[0]
    n = len(seg)
    n_pad = 512
    while n_pad < max(n_rows, n):
        n_pad *= 2
    n_seg_pad = 256
    while n_seg_pad < n_seg:
        n_seg_pad *= 2
    v = jnp.asarray(vectors_dev)
    if n_rows < n_pad:
        v = jnp.pad(v, ((0, n_pad - n_rows), (0, 0)))
    # Padded rows are zero vectors scattered into segment 0 — harmless.
    seg_pad = np.zeros(n_pad, np.int32)
    seg_pad[:n] = seg
    out = _medoid_scores_jit(v, jnp.asarray(seg_pad), n_seg_pad)
    return np.asarray(out[:n])


_sparse_medoid_jit = None


def _sparse_exact_medoid_scores(sims, neigh, seg: np.ndarray,
                                n_seg: int) -> np.ndarray:
    """Per-row medoid scores from the sparse EXACT neighbor lists.

    The reference picks each cluster's medoid by the minimum row-sum of
    the CLUSTERING distances (``falcon/cluster/cluster.py:512-553``).
    With distance = 1 - sim, row_sum_i = (|C|-1) - sum_j sim(i, j), so
    argmin row-sum == argmax of the within-cluster similarity sum.  This
    computes that sum over the reranked exact neighbor lists on device:
    each unordered within-cluster pair is counted ONCE (a directed edge
    a->b is counted iff a < b or the edge is not mutual) and its exact
    similarity added to both endpoints.  Pairs absent from both rows'
    top-k lists contribute 0 — i.e. missing distances are taken as the
    maximum 1 — so the selection is EXACT whenever every within-cluster
    pair is listed (clusters of size <= k_final + 1 at full recall;
    tests/test_ann.py::test_dbscan_medoids_match_exact_distances), and a
    most-connected-core tie-down otherwise.  Replaces the hashed-vector
    approximation for the rerank paths (round-3 verdict #4).

    ``seg``: per-row cluster id with noise in the spill segment
    ``n_seg - 1`` (the `_refine_and_medoids` convention).
    """
    global _sparse_medoid_jit
    import jax
    import jax.numpy as jnp

    if _sparse_medoid_jit is None:
        @jax.jit
        def fn(sims, neigh, seg, spill_id):
            n_pad, k = sims.shape
            neigh_safe = jnp.clip(neigh, 0, n_pad - 1)
            valid = (
                (neigh >= 0)
                & (seg[:, None] != spill_id)
                & (seg[neigh_safe] == seg[:, None])
            )
            w_all = jnp.where(valid, jnp.maximum(sims, 0.0), 0.0)

            # n_pad is a power of two, so chunks tile it exactly (an
            # oversized chunk would clamp-index and double-count rows).
            chunk = min(1024, n_pad)

            def body(scores, i0):
                i = i0 + jnp.arange(chunk, dtype=jnp.int32)
                nb = neigh_safe[i]                      # (c, k)
                # Mutual edge: i appears in its neighbor's own list.
                mutual = (neigh[nb] == i[:, None, None]).any(-1)
                counted = valid[i] & ((i[:, None] < nb) | ~mutual)
                w = jnp.where(counted, w_all[i], 0.0)
                scores = scores.at[i].add(w.sum(axis=1))
                tgt = jnp.where(counted, nb, n_pad)
                scores = scores.at[tgt.reshape(-1)].add(w.reshape(-1))
                return scores, None

            starts = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)
            scores0 = jnp.zeros(n_pad + 1, jnp.float32)
            scores, _ = jax.lax.scan(body, scores0, starts)
            return scores[:n_pad]

        _sparse_medoid_jit = fn

    n = len(seg)
    n_pad = 512
    while n_pad < sims.shape[0]:
        n_pad *= 2
    if sims.shape[0] != n_pad:
        # Host (e.g. IVF-path) arrays arrive unpadded; device arrays are
        # already power-of-two bucketed upstream.
        s = np.full((n_pad, sims.shape[1]), -2.0, np.float32)
        s[: sims.shape[0]] = np.asarray(sims)
        g = np.full((n_pad, neigh.shape[1]), -1, np.int32)
        g[: neigh.shape[0]] = np.asarray(neigh)
        sims, neigh = s, g
    # Pad seg to match, parking padded rows in the spill segment.
    seg_pad = np.full(n_pad, n_seg - 1, np.int32)
    seg_pad[:n] = seg
    out = _sparse_medoid_jit(
        jnp.asarray(sims), jnp.asarray(neigh, jnp.int32),
        jnp.asarray(seg_pad), jnp.int32(n_seg - 1),
    )
    return np.asarray(out[:n])


def generate_clusters(
    dataset: ChargeDataset,
    eps: float,
    min_samples: int,
    min_matches: int,
    precursor_tol_mass: float,
    precursor_tol_mode: str,
    rt_tol: Optional[float],
    fragment_tol: float,
    batch_size: int,
    low_dim: int = 400,
    n_neighbors: int = 64,
    n_neighbors_ann: int = 128,
    n_probe: int = 32,
    hash_seed: int = 0,
    min_mz: float = 101.0,
    max_mz: float = 1500.0,
    max_peaks: int = 50,
    use_ivf: Optional[bool] = None,
    rerank: str = "exact",
    devices: Optional[int] = None,
    ann_index: Optional[str] = None,
    cluster_method: str = "linkage",
    linkage: str = "complete",
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster one charge bucket with the vectorized ANN pipeline.

    Returns (labels, medoid row indices) with the same semantics as the
    exact engine: every spectrum labeled, noise as singletons, one medoid
    per cluster plus each noise point.

    ``ann_index`` (the ``--ann_index`` surface) supersedes ``use_ivf``:
    'auto' | 'brute' | 'ivf' pick the hashed-vector search as before;
    'exact' replaces hash + search + rerank with the hash-free banded
    exact-cosine top-k (``ops/exact_knn.py``) — recall@k = 1.0 vs exact
    cosine by construction, the oracle path PARITY.md advertises.

    ``cluster_method="linkage"`` (default) forms clusters with the
    reference's hierarchical clustering (``linkage`` criterion, cut at
    ``eps``) on exact peak-matching distances inside each eps-connected
    component of the neighbor graph; ``min_samples`` is ignored (the
    reference's fixed minimum cluster size of 2 applies).
    ``cluster_method="dbscan"`` keeps the published algorithm's density
    clustering.
    """
    import jax.numpy as jnp  # deferred: keep module import light

    exact_index = ann_index == "exact"
    if ann_index is not None:
        # Documented precedence: an explicit ann_index wins over any
        # use_ivf value a library caller also passed.
        use_ivf = {"auto": None, "brute": False, "ivf": True,
                   "exact": False}[ann_index]

    meta = dataset.read_metadata(
        columns=("precursor_mz", "retention_time")
    )
    offsets, mz_flat, int_flat = dataset.read_peaks()
    n = len(meta["precursor_mz"])
    precursor_mzs = np.asarray(meta["precursor_mz"], np.float64)
    rts = np.asarray(meta["retention_time"], np.float64)
    order = np.argsort(precursor_mzs, kind="stable")
    mz_sorted = precursor_mzs[order]
    rt_sorted = rts[order]

    logger.info(
        "Cluster %d spectra with the ANN engine (eps=%.3f, "
        "min_samples=%d, low_dim=%d, n_neighbors=%d)",
        n, eps, min_samples, low_dim, n_neighbors,
    )
    if n == 1:
        return np.zeros(1, np.int32), np.zeros(1, np.int64)

    hasher = SpectrumHasher(min_mz, max_mz, fragment_tol, low_dim,
                            hash_seed)
    pad_to = ((max_peaks + 63) // 64) * 64

    # Device-capacity blocking: a charge bucket whose vector/peak
    # arrays would outgrow HBM is split into precursor-m/z mega-blocks
    # (gap-aware splits, reference `_get_precursor_mz_splits` semantics
    # at a much larger cap — the reference caps at 2^15,
    # falcon/cluster/cluster.py:159-209) and each block runs the full
    # chain; labels are offset per block and noise promotion happens
    # once at the end.  This is how 5M+ spectra per charge (configs
    # #2/#5, the 25M north star) fit a 16 GB chip.
    device_cap = device_block_cap()
    if n > device_cap:
        from .intervals import precursor_mz_splits

        raw = precursor_mz_splits(
            mz_sorted, precursor_tol_mass, precursor_tol_mode,
            device_cap,
        )
        # The reference-semantics splits break at EVERY tolerance gap;
        # here we want as FEW blocks as possible (each block pays full
        # pipeline dispatches), so adjacent gap-separated blocks are
        # coalesced greedily up to the cap.  Block boundaries stay on
        # gap boundaries whenever the data has gaps, so no
        # within-tolerance pair is dropped in that case.
        splits = [int(raw[0])]
        for i in range(1, len(raw)):
            nxt = int(raw[i + 1]) if i + 1 < len(raw) else None
            if nxt is None or nxt - splits[-1] > device_cap:
                splits.append(int(raw[i]))
        splits = np.asarray(splits, np.int64)
        logger.info(
            "Charge bucket of %d spectra split into %d device blocks "
            "(cap %d)", n, len(splits) - 1, device_cap,
        )
        # A gap-free m/z run longer than the cap forces mid-run cuts
        # that permanently sever within-tolerance neighbor pairs across
        # the boundary (documented divergence, SURVEY.md §3.5) — make
        # every forced cut visible in the log.
        interior = splits[1:-1]
        if len(interior):
            from .intervals import mass_diff

            boundary_diffs = mass_diff(
                mz_sorted[interior], mz_sorted[interior - 1],
                precursor_tol_mode == "Da",
            )
            n_forced = int((boundary_diffs <= precursor_tol_mass).sum())
            if n_forced:
                logger.warning(
                    "%d of %d device-block boundaries are forced "
                    "mid-run cuts (no tolerance gap at the boundary): "
                    "within-tolerance pairs across those cuts are not "
                    "compared", n_forced, len(interior),
                )
    else:
        splits = np.asarray([0, n], np.int64)

    labels_sorted = np.full(n, -1, np.int32)
    medoids_all = []
    current = 0

    block_ranges = [
        (int(b0), int(b1))
        for b0, b1 in zip(splits[:-1], splits[1:]) if b1 - b0 > 0
    ]
    multi_blocks = [b for b in block_ranges if b[1] - b[0] > 1]

    # Cross-block parallelism: independent mega-blocks share no state
    # (reference block independence: falcon/cluster/cluster.py:159-209),
    # so with a multi-device mesh each block runs its SINGLE-device
    # chain on its own device (zero collectives — the embarrassingly
    # parallel layout a v5e-8 wants at the 25M scale); on one chip a
    # 2-deep pipeline overlaps block k's host refinement with block
    # k+1's device work (the regime where the cli-level charge overlap
    # turns itself off).  Results are merged in block order, so labels
    # are identical to the serial loop.
    import jax

    block_devices = None
    n_workers = 1
    if len(multi_blocks) > 1:
        if (devices is not None and devices > 1
                and len(jax.devices()) >= devices):
            block_devices = jax.devices()[:devices]
            n_workers = min(devices, len(multi_blocks))
            logger.info(
                "Dispatching %d device blocks round-robin over %d "
                "devices", len(multi_blocks), devices,
            )
        else:
            n_workers = min(
                int(_os.environ.get("FALCON_TPU_BLOCK_PIPELINE", "2")),
                len(multi_blocks),
            )

    def run_block(i: int, b0: int, b1: int):
        m = b1 - b0
        block_timer = StageTimer("ann: ")
        try:
            if block_devices is not None:
                ctx = jax.default_device(
                    block_devices[i % len(block_devices)]
                )
            else:
                ctx = _contextlib.nullcontext()
            with ctx, _block_gauge_tracked():
                return _cluster_range(
                    block_timer, offsets, mz_flat, int_flat,
                    order[b0:b1], mz_sorted[b0:b1], rt_sorted[b0:b1],
                    m, hasher, pad_to, eps, min_samples, min_matches,
                    precursor_tol_mass, precursor_tol_mode, rt_tol,
                    fragment_tol, n_neighbors, n_neighbors_ann, n_probe,
                    use_ivf, rerank,
                    # Block-level parallelism supersedes the
                    # within-block sharded pipeline.
                    None if block_devices is not None else devices,
                    exact_index,
                    cluster_method, linkage, batch_size,
                )
        finally:
            block_timer.finish()

    if n_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        multi_idx = {b: i for i, b in enumerate(multi_blocks)}
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            futures = {
                b: pool.submit(run_block, i, *b)
                for b, i in multi_idx.items()
            }
            results = {b: futures[b].result() for b in multi_blocks}
    else:
        results = {b: run_block(i, *b)
                   for i, b in enumerate(multi_blocks)}

    for b0, b1 in block_ranges:
        if b1 - b0 == 1:
            medoids_all.append(order[b0:b1].astype(np.int64))
            continue
        final_b, med_b = results[(b0, b1)]
        mask = final_b >= 0
        final_b = final_b.astype(np.int32)
        final_b[mask] += current
        if mask.any():
            current = int(final_b[mask].max()) + 1
        labels_sorted[b0:b1] = final_b
        medoids_all.append(med_b)

    noise_mask = labels_sorted == -1
    n_noise = int(noise_mask.sum())
    logger.info(
        "%d spectra grouped in %d clusters, %d spectra remain as "
        "singletons",
        int((~noise_mask).sum()), current, n_noise,
    )
    labels_sorted[noise_mask] = np.arange(
        current, current + n_noise, dtype=np.int32
    )
    labels_out = np.empty(n, np.int32)
    labels_out[order] = labels_sorted
    medoids = (np.concatenate(medoids_all) if medoids_all
               else np.zeros(0, np.int64))
    return labels_out, medoids


def _cluster_range(
    timer, offsets, mz_flat, int_flat, order, mz_sorted, rt_sorted, n,
    hasher, pad_to, eps, min_samples, min_matches, precursor_tol_mass,
    precursor_tol_mode, rt_tol, fragment_tol, n_neighbors,
    n_neighbors_ann, n_probe, use_ivf, rerank, devices,
    exact_index=False, cluster_method="linkage", linkage="complete",
    batch_size=2**15,
):
    """Cluster one device block (a sorted precursor-m/z range).

    Returns (labels in sorted-range order, -1 = noise, numbered from 0;
    medoid dataset-row ids, noise singletons first)."""
    # Linkage mode: the device graph stage only has to find the
    # eps-connected COMPONENTS (min_samples=1 makes every point core, so
    # DBSCAN degenerates to the transitive closure of the eps graph);
    # hierarchical clustering inside each component happens on host with
    # exact distances (_linkage_refine_and_medoids).
    if cluster_method == "linkage":
        min_samples = 1
    k_final = min(n_neighbors, max(n - 1, 1))
    # The exact index produces exact scores directly — no rerank stage.
    do_rerank = rerank == "exact" and not exact_index
    k_ann = (min(max(n_neighbors_ann, k_final), max(n - 1, 1))
             if do_rerank else k_final)

    # Multi-chip: the FULL pipeline (vectorize -> halo k-NN -> exact
    # rerank -> DBSCAN propagation) runs as one shard_map over the mesh
    # (parallel/sharded_pipeline.py); labels are identical to the
    # single-device chain below.  Falls back when bands outgrow the
    # one-shard halo or fewer devices are visible.
    labels = None
    medoid_scores_fn = None
    if (devices is not None and devices > 1 and do_rerank
            and use_ivf is not True and not exact_index):
        import jax

        if len(jax.devices()) >= devices:
            from ..parallel.mesh import make_mesh
            from ..parallel.sharded_pipeline import (
                ann_cluster_sharded, sharded_medoid_scores)

            timer.stage("sharded pipeline")
            mesh = make_mesh(devices)
            mz_host, int_host, _ = padded_peaks(
                offsets, mz_flat, int_flat, pad_to, order
            )
            result = ann_cluster_sharded(
                mz_host, int_host, mz_sorted,
                rt_sorted if rt_tol is not None else None,
                hasher, precursor_tol_mass, precursor_tol_mode,
                k_ann, k_final, fragment_tol, eps, min_samples,
                min_matches, rt_tol, mesh,
            )
            if result is None:
                logger.warning(
                    "Precursor band wider than one shard halo; falling "
                    "back to the single-device pipeline"
                )
            else:
                labels, vectors_sharded, _ = result

                def medoid_scores_fn(seg, n_seg, _v=vectors_sharded,
                                     _m=mesh):
                    return sharded_medoid_scores(_v, seg, n_seg, _m)
        else:
            logger.warning(
                "Requested %d devices but only %d visible; using the "
                "single-device pipeline", devices, len(jax.devices()),
            )

    if labels is None:
        labels = _single_device_chain(
            timer, offsets, mz_flat, int_flat, order, mz_sorted,
            rt_sorted, n, hasher, pad_to, k_ann, k_final, do_rerank,
            use_ivf, eps, min_samples, min_matches, precursor_tol_mass,
            precursor_tol_mode, rt_tol, fragment_tol, n_neighbors_ann,
            n_probe, devices, exact_index,
        )
        labels, medoid_scores_fn = labels

    if cluster_method == "linkage":
        # Drop the chain's medoid closure: it pins the (rows, k) sims/
        # neigh (or vector) device arrays, and linkage mode computes
        # medoids from per-component exact distances instead.
        medoid_scores_fn = None
        return _linkage_refine_and_medoids(
            timer, labels, order, mz_sorted, rt_sorted, n, offsets,
            mz_flat, int_flat, pad_to, linkage, eps, min_matches,
            fragment_tol, precursor_tol_mass, precursor_tol_mode, rt_tol,
            batch_size, hasher=hasher, devices=devices,
        )
    return _refine_and_medoids(
        timer, labels, order, mz_sorted, rt_sorted, n,
        precursor_tol_mass, precursor_tol_mode, rt_tol, min_samples,
        medoid_scores_fn,
    )


def _single_device_chain(
    timer, offsets, mz_flat, int_flat, order, mz_sorted, rt_sorted, n,
    hasher, pad_to, k_ann, k_final, do_rerank, use_ivf, eps, min_samples,
    min_matches, precursor_tol_mass, precursor_tol_mode, rt_tol,
    fragment_tol, n_neighbors_ann, n_probe, devices, exact_index=False,
):
    """Single-device (or kNN-only sharded) chain: vectorize -> k-NN ->
    rerank -> DBSCAN.  Returns (labels, medoid_scores_fn)."""
    import jax.numpy as jnp

    # Band geometry + index selection first (host-only, cheap): the
    # vectorize stage below computes different vector sets per path.
    if precursor_tol_mode == "Da":
        lo_vals = mz_sorted - precursor_tol_mass
        hi_vals = mz_sorted + precursor_tol_mass
    else:
        lo_vals = mz_sorted / (1 + precursor_tol_mass / 1e6)
        hi_vals = mz_sorted / (1 - precursor_tol_mass / 1e6)
    spans = (np.searchsorted(mz_sorted, hi_vals, side="right")
             - np.searchsorted(mz_sorted, lo_vals, side="left"))
    # Adaptive neighbor budget for dense bands (round-3 verdict #6):
    # when precursor bands hold more candidates than the retrieval
    # width, the k-NN stage silently truncates above-eps-capable
    # neighbors and retrieval quality degrades with no signal.  Widen
    # the candidate width in power-of-two steps (compiled shapes stay
    # cached) up to FALCON_TPU_MAX_NEIGHBORS; coverage BEYOND the
    # per-pass worker-fault envelope comes from successive boundary-
    # continued scan passes (round-4 verdict item 8), so the budget is
    # no longer a wall — only bands exceeding the total budget warn.
    span_max = int(spans.max(initial=1)) - 1  # candidates excl. self
    widen_passes = 1
    # Only the rerank paths benefit: without a rerank the banded
    # scan's exact top-k is truncated back to k_final before DBSCAN,
    # so widening would only inflate HBM for bit-identical labels.
    if do_rerank and not exact_index and span_max > k_ann:
        budget = int(_os.environ.get("FALCON_TPU_MAX_NEIGHBORS", "1024"))
        # Measured-safe per-PASS envelope (2026-08-19, standalone
        # repro on the real chip): the scan with widened k=256 at a
        # 262144-row padded block crashed the TPU worker at every
        # dispatch/chunk granularity, while k=256 at 131072 rows and
        # k=128 at 262144 rows both pass — so cap each pass's widened
        # (rows, k) neighbor arrays at 2^28 bytes (k * rows * 8).
        n_bucket_est = 512
        while n_bucket_est < n:
            n_bucket_est *= 2
        per_pass = max(
            min(budget, 2**28 // (8 * n_bucket_est)), k_ann)
        cap_env = _os.environ.get("FALCON_TPU_WIDEN_PASS_CAP")
        if cap_env:  # test hook: force multi-pass at small scales
            per_pass = max(min(per_pass, int(cap_env)), k_ann)
        new_k = k_ann
        while new_k < min(span_max, per_pass, max(n - 1, 1)):
            new_k *= 2
        new_k = min(new_k, max(n - 1, 1))
        frac_over = float((spans - 1 > k_ann).mean())
        if new_k > k_ann:
            logger.info(
                "Dense precursor bands (max %d candidates, %.1f%% of "
                "rows exceed n_neighbors_ann=%d): widening the "
                "retrieval width to %d (per-pass budget %d)",
                span_max, 100.0 * frac_over, k_ann, new_k, per_pass,
            )
            k_ann = new_k
        if span_max > k_ann:
            # Cover the rest with boundary-continued passes on the
            # prefilter path (each pass stays at the proven-safe
            # (rows, k_ann) shape); passes stop early once every row's
            # boundary bound falls below the prefilter threshold.
            target = min(budget, span_max, max(n - 1, 1))
            widen_passes = max(1, -(-target // k_ann))
        if span_max > k_ann * widen_passes:
            logger.warning(
                "%.1f%% of rows have more in-band candidates (max %d) "
                "than the neighbor budget %d; retrieval may truncate "
                "true neighbors in those bands (raise "
                "FALCON_TPU_MAX_NEIGHBORS or --n_neighbors_ann)",
                100.0 * float((spans - 1 > k_ann * widen_passes).mean()),
                span_max, k_ann * widen_passes,
            )
    if exact_index:
        use_ivf = False
    if use_ivf is None:
        # Auto selection, calibrated by measurement on the target
        # hardware (README "Index selection"): the banded MXU scan
        # sustains ~PFLOP/s effective on this backend and beat the IVF
        # index at EVERY tested band width, and since round 4 it
        # STREAMS column chunks with a running top-k (ops/knn.py), so
        # no band width exceeds HBM — the former IVF switch-over, which
        # traded eps-neighbor recall for memory (measured 0.71 vs the
        # scan's 1.00 on the wideband corpus, probe-miss dominated:
        # benchmarks/ivf_attrib3.py, README "Index selection"), is
        # gone.  IVF remains available via ``--ann_index ivf``.
        use_ivf = False
    # Tolerance-spread upper-bound prefilter (see ops/vectorize.py
    # docstring): spread_a . plain_b with UNNORMALIZED vectors is a
    # STRICT upper bound on the exact matched-peak score, so candidates
    # bounded below 1 - eps can never form a DBSCAN edge and are skipped
    # by the exact rerank — typically cutting its (q, c, P, P) work by
    # ~8x with label-identical output (tests/test_ann.py).
    prefilter = bool(do_rerank and not use_ivf)
    # Multi-pass widening state (set by the prefilter scan below when
    # bands outgrow one pass; the IVF/exact/sharded paths keep their
    # single-retrieval semantics).
    widen_boundary = widen_slabs = None

    timer.stage("vectorize")
    # 1. Vectorize (chunked through the device).  Chunk row counts are
    # bucketed to powers of two so compiled shapes are reused across
    # charge buckets and runs.  Vectors stay DEVICE-RESIDENT end to end
    # (k-NN consumes them in place, medoids reduce them on device):
    # device->host readback of computed arrays is the scarce resource on
    # a tunneled TPU, and 20 MB of hashed vectors per charge is the
    # single largest avoidable transfer.
    # Peaks are uploaded ONCE per charge in their RAGGED form (~0.7x the
    # padded bytes over the bandwidth-limited tunnel) and padded to the
    # (n_bucket, pad_to) device layout by an on-device scatter
    # (ops/xfer.py); the arrays are shared by vectorization and the
    # exact rerank stage.
    from ..ops.xfer import upload_padded_peaks

    n_bucket = 512
    while n_bucket < n:
        n_bucket *= 2
    mz_pad_dev, int_pad_dev = upload_padded_peaks(
        offsets, mz_flat, int_flat, order, pad_to, n_bucket
    )
    chunk = 65536
    chunks = []
    for c0 in range(0, n_bucket, chunk):
        size = min(chunk, n_bucket - c0)
        chunks.append(hasher.vectorize(
            mz_pad_dev[c0:c0 + size], int_pad_dev[c0:c0 + size],
            norm=False,
        ))
    # Kept at the padded row count: every downstream op works on the
    # same power-of-two shapes (padded rows are zero vectors / +inf m/z
    # and can never win a similarity comparison).
    plain_unnorm = (chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks))

    def make_spread():
        # Tolerance-spread vectors are built LAZILY at the prefilter
        # call site: when the multi-device sharded k-NN supersedes the
        # prefilter (below), this second full hash-scatter pass (and
        # its (n_bucket, D) HBM slab) is never paid.
        spread_chunks = [
            hasher.vectorize(
                mz_pad_dev[c0:c0 + min(chunk, n_bucket - c0)],
                int_pad_dev[c0:c0 + min(chunk, n_bucket - c0)],
                norm=False, spread=True,
            )
            for c0 in range(0, n_bucket, chunk)
        ]
        return (spread_chunks[0] if len(spread_chunks) == 1
                else jnp.concatenate(spread_chunks))
    del chunks
    # Normalized vectors serve the hashed/IVF cosine search, the
    # non-prefilter banded search, and the hashed-medoid fallback; the
    # unnormalized pair feeds the prefilter bound.  Built LAZILY: on
    # the prefilter + exact-rerank default path (where medoids come
    # from the sparse exact lists) they are never needed, and at a
    # 2^19-row wideband block the (rows, D) f32 slab is 1 GB of HBM
    # that tipped the worker over (measured crash, 500k one-band run).
    _vectors_cache = []

    def get_vectors_dev():
        if not _vectors_cache:
            _vectors_cache.append(_normalize_rows(plain_unnorm))
        return _vectors_cache[0]

    _sync(plain_unnorm)
    timer.stage("knn")
    # 2. k-NN within the precursor band: banded brute force (exact within
    # the band) by default, or the from-scratch TPU IVF index for very
    # large buckets where the O(n * band) matmuls outgrow the budget.
    # With exact reranking (the default), the search ranks candidates by
    # the upper bound and step 2b re-scores the survivors exactly.
    if exact_index:
        # Hash-free oracle path (--ann_index exact): score EVERY in-band
        # pair with the exact peak-matching cosine and take the top-k —
        # recall@k = 1.0 vs exact cosine by construction.  Scores are
        # exact, so they feed DBSCAN directly (no rerank stage);
        # min_matches zeroing happens inside (reference semantics,
        # falcon/cluster/cluster.py:620-626).
        from ..ops.exact_knn import exact_banded_topk

        sims = None
        if devices is not None and devices > 1:
            import jax

            if len(jax.devices()) >= devices:
                from ..parallel.mesh import make_mesh
                from ..parallel.sharded_exact_index import (
                    exact_banded_topk_sharded)

                # Pad on HOST from the raw columns (a device
                # fetch of the padded arrays would pay ~16 s of
                # ~16 MB/s readback per 2^19-row block).
                mz_host, int_host, _ = padded_peaks(
                    offsets, mz_flat, int_flat, pad_to, order
                )
                result = exact_banded_topk_sharded(
                    mz_host, int_host,
                    mz_sorted, precursor_tol_mass, precursor_tol_mode,
                    k_final, fragment_tol, make_mesh(devices),
                    rts=rt_sorted if rt_tol is not None else None,
                    rt_tol=rt_tol, min_matches=min_matches,
                )
                if result is None:
                    logger.warning(
                        "Precursor band wider than one shard halo; "
                        "falling back to the single-device exact index"
                    )
                else:
                    sims, neigh = result
            else:
                logger.warning(
                    "Requested %d devices but only %d visible; using "
                    "the single-device exact index", devices,
                    len(jax.devices()),
                )
        if sims is None:
            sims, neigh = exact_banded_topk(
                mz_pad_dev, int_pad_dev, mz_sorted, precursor_tol_mass,
                precursor_tol_mode, k_final, fragment_tol,
                rts=rt_sorted if rt_tol is not None else None,
                rt_tol=rt_tol, min_matches=min_matches,
            )
    elif use_ivf:
        from ..ops.ivf import IVFIndex

        # The device-resident hashed vectors go straight into the index;
        # nothing large crosses the host boundary.  The coarse quantizer
        # (train/assign/probe) runs in the tolerance-SPREAD embedding by
        # default (round-4 verdict item 4): the plain hashed embedding
        # scatters ~10% of eps pairs across unrelated lists via fragment
        # bin splits (measured, benchmarks/ivf_attrib3.py), while the
        # spread embedding is immune by construction.  The spread slab
        # is dropped the moment list choices exist (HBM: one extra
        # (n_pad, D) array during init only).
        ivf_coarse = _os.environ.get(
            "FALCON_TPU_IVF_COARSE", "spread") == "spread"
        # With an exact rerank downstream, in-scan candidates are ranked
        # by the tolerance-spread UPPER BOUND (spread_q . plain_c) —
        # the ranking whose banded exact-top-k measures recall 1.00 —
        # instead of the plain hashed cosine that drops bin-split pairs
        # from the top-k (benchmarks/ivf_attrib4.py).  Without a rerank
        # the scan similarities feed eps directly and must stay true
        # cosines.
        ivf_rank_ub = do_rerank and _os.environ.get(
            "FALCON_TPU_IVF_RANK", "ub") == "ub"
        coarse = spread_unnorm = None
        if ivf_coarse or ivf_rank_ub:
            spread_unnorm = make_spread()
        if ivf_coarse:
            coarse = _normalize_rows(spread_unnorm)
        vectors_dev = plain_unnorm if ivf_rank_ub else get_vectors_dev()
        index = IVFIndex(vectors_dev, mz_sorted, n_lists=None, seed=42,
                         precise=not do_rerank, coarse_vectors=coarse,
                         rank_vectors=spread_unnorm if ivf_rank_ub
                         else None)
        del coarse, spread_unnorm
        k_ivf = min(max(n_neighbors_ann, k_ann), max(n - 1, 1))
        sims = None
        if devices is not None and devices > 1:
            # Multi-chip IVF: corpus slab sharded on the list axis and
            # ring-rotated over the mesh (parallel/sharded_ivf.py).
            import jax

            if len(jax.devices()) >= devices:
                from ..parallel.mesh import make_mesh
                from ..parallel.sharded_ivf import ivf_search_sharded

                result = ivf_search_sharded(
                    index, k_ivf, n_probe, precursor_tol_mass,
                    precursor_tol_mode, make_mesh(devices),
                    precise=not do_rerank,
                )
                if result is None:
                    logger.warning(
                        "Mesh size does not divide the IVF list count; "
                        "falling back to the single-device list scan"
                    )
                else:
                    sims, neigh = result
            else:
                logger.warning(
                    "Requested %d devices but only %d visible; using "
                    "the single-device IVF scan", devices,
                    len(jax.devices()),
                )
        if sims is None:
            sims, neigh = index.search(
                vectors_dev, mz_sorted, np.arange(n, dtype=np.int32),
                k_ivf,
                n_probe=n_probe, tol_mass=precursor_tol_mass,
                tol_mode=precursor_tol_mode,
                # Without an exact rerank the scan similarities feed the
                # eps threshold directly — keep them float32 (bfloat16
                # would shift membership near the threshold).
                precise=not do_rerank,
            )
        sims, neigh = sims[:, :k_ann], neigh[:, :k_ann]
        if rt_tol is not None:
            neigh_rt = np.where(
                neigh >= 0, rt_sorted[np.clip(neigh, 0, n - 1)], np.inf
            )
            bad = np.abs(neigh_rt - rt_sorted[:, None]) > rt_tol
            sims = np.where(bad, float(NEG), sims)
            neigh = np.where(bad, -1, neigh)
    else:
        sims = neigh = None
        if sims is None and devices is not None and devices > 1:
            # Multi-chip: rows sharded over the mesh, halo exchange for
            # cross-shard bands (parallel/sharded_knn.py).
            import jax

            from ..parallel.mesh import make_mesh
            from ..parallel.sharded_knn import knn_banded_sharded

            if len(jax.devices()) >= devices:
                mesh = make_mesh(devices)
                result = knn_banded_sharded(
                    np.asarray(get_vectors_dev()[:n]), mz_sorted,
                    precursor_tol_mass, precursor_tol_mode, k_ann, mesh,
                )
                if result is None:
                    logger.warning(
                        "Precursor band wider than one shard halo; "
                        "falling back to single-device k-NN"
                    )
                else:
                    sims, neigh = result
                    if rt_tol is not None:
                        neigh_rt = np.where(
                            neigh >= 0,
                            rt_sorted[np.clip(neigh, 0, n - 1)], np.inf,
                        )
                        bad = (np.abs(neigh_rt - rt_sorted[:, None])
                               > rt_tol)
                        sims[bad] = float(NEG)
                        neigh[bad] = -1
            else:
                logger.warning(
                    "Requested %d devices but only %d visible; using "
                    "single-device k-NN", devices, len(jax.devices()),
                )
        if sims is None and prefilter:
            # Upper-bound search: rank by spread_q . plain_c (a strict
            # upper bound on the exact matched score), exact top-k so
            # no above-threshold candidate can be missed.  The scan
            # runs in bfloat16 with f32 accumulation by default
            # (round-4 verdict item 7: 2x MXU rate, half the HBM
            # streaming) — sound because the compaction threshold
            # below carries the certified bf16 rounding margin
            # (ops/knn.py _banded_topk docstring) and the exact rerank
            # re-scores every survivor in f32.
            spread_dev = make_spread()
            thr_pref = (1.0 - eps) * (0.99 if _scan_bf16() else 1.0) - 1e-3
            # Certified-approx retrieval first (measured 2026-08-20:
            # the exact-top-k scan is ~8x slower than approx_max_k and
            # entirely top-k-bound, ops/knn.py).  The certificate
            # (exact in-scan >=thr counts == retrieved >=thr
            # candidates) PROVES the lists contain every candidate the
            # threshold compaction below can keep — which also proves
            # any boundary-continued widening pass would retrieve
            # nothing above thr, so widening is skipped when certified.
            # On failure (a row with more above-thr candidates than
            # k_ann, or an approx miss) fall back to the exact paths
            # below, unchanged.
            certified = False
            if (thr_pref > 0.0 and _os.environ.get(
                    "FALCON_TPU_KNN_CERTIFIED", "1") != "0"):
                sims, neigh, certified = knn_banded(
                    plain_unnorm, mz_sorted, precursor_tol_mass,
                    precursor_tol_mode, k=k_ann, rts=rt_sorted,
                    rt_tol=rt_tol, as_device=True,
                    q_vectors=spread_dev, scan_bf16=_scan_bf16(),
                    certified_thr=thr_pref,
                )
                if not certified:
                    logger.info(
                        "Certified-approx retrieval not complete at "
                        "k=%d (dense above-threshold rows or approx "
                        "misses); re-running with exact top-k", k_ann,
                    )
                    sims = neigh = None
            if certified:
                widen_boundary = widen_slabs = None
            elif widen_passes > 1:
                # Multi-pass retrieval: keep the UB slabs alive for the
                # continuation scans in the rerank stage below; each
                # pass reuses this pass's compiled program (the
                # boundary program, sentinel on pass 1).
                sims, neigh, widen_boundary = knn_banded(
                    plain_unnorm, mz_sorted, precursor_tol_mass,
                    precursor_tol_mode, k=k_ann, rts=rt_sorted,
                    rt_tol=rt_tol, as_device=True, exact_topk=True,
                    q_vectors=spread_dev, scan_bf16=_scan_bf16(),
                    want_boundary=True,
                )
                widen_slabs = (plain_unnorm, spread_dev)
            else:
                sims, neigh = knn_banded(
                    plain_unnorm, mz_sorted, precursor_tol_mass,
                    precursor_tol_mode, k=k_ann, rts=rt_sorted,
                    rt_tol=rt_tol, as_device=True, exact_topk=True,
                    q_vectors=spread_dev, scan_bf16=_scan_bf16(),
                )
                widen_boundary = widen_slabs = None
            # Release the UB slabs (on the single-pass path): at a
            # 2^19-row wideband block the plain + spread (rows, D)
            # arrays are 2 GB of HBM and nothing downstream reads them
            # (the exact rerank gathers peaks; medoids read the sparse
            # exact lists — prefilter implies do_rerank, so
            # get_vectors_dev is never called).
            plain_unnorm = spread_dev = None
            _vectors_cache.clear()
        elif sims is None:
            # Results stay on device (padded) — the density stage
            # consumes them in place; nothing large is fetched.
            sims, neigh = knn_banded(
                get_vectors_dev(), mz_sorted, precursor_tol_mass,
                precursor_tol_mode, k=k_ann, rts=rt_sorted, rt_tol=rt_tol,
                as_device=True, exact_topk=not do_rerank,
            )

    _sync(sims, neigh)
    timer.stage("rerank")
    # 2b. Exact rerank: re-score the candidates with the exact
    # peak-matching cosine on device (ops/rerank.py) and keep the exact
    # top n_neighbors.  Density clustering then runs on exact distances,
    # so eps means the same thing in both backends, and min_matches
    # applies just like in the reference kernel
    # (falcon/cluster/cluster.py:620-626).
    if do_rerank:
        import jax.numpy as jnp_  # local alias for clarity

        from ..ops.rerank import rerank_exact

        thr = (1.0 - eps) * (0.99 if _scan_bf16() else 1.0) - 1e-3
        prefilter_dev = prefilter and not isinstance(sims, np.ndarray)

        def _compact_rerank(sims_in, neigh_in):
            """Threshold-compact a scan pass and exact-score it.
            Returns the rerank triple (scores, ids, match counts);
            min_matches zeroing runs AFTER pass merging (identical to a
            single wide pass, where rerank selects by TRUE score and
            zeroing only rewrites kept values)."""
            if prefilter_dev:
                # Candidates are sorted by descending upper bound, but
                # the RT filter (when --rt_tol is set) punches holes
                # into the sorted lists IN PLACE, so survivors (bound
                # >= 1 - eps) need NOT form a prefix — size the
                # compacted width from the LAST surviving column
                # position, not the survivor count (a count undercounts
                # past holes and silently drops valid candidates before
                # the exact rerank).  One scalar fetch — the only host
                # sync before dbscan.  With the bf16 scan the threshold
                # carries the certified rounding margin (1%): a
                # candidate whose TRUE bound reaches 1 - eps cannot
                # read below (1 - eps) * 0.99 in bf16 (ops/knn.py
                # _banded_topk docstring).
                keep = sims_in >= thr
                neigh_in = jnp_.where(keep, neigh_in, -1)
                cols = jnp_.arange(sims_in.shape[1], dtype=jnp_.int32)
                max_keep = int(jnp_.max(jnp_.where(keep, cols + 1, 0)))
                k_compact = 16
                while k_compact < max_keep:
                    k_compact *= 2
            else:
                # Candidate lists are score-sorted with -1 padding at
                # the tail; when the precursor bands are narrower than
                # n_neighbors_ann the trailing columns are all -1 —
                # drop them (saves exact-kernel work proportionally).
                real_k = max(
                    min(int(spans.max(initial=1)) - 1, k_ann), 1)
                k_compact = 16
                while k_compact < real_k:
                    k_compact *= 2
            neigh_in = neigh_in[:, :min(k_compact, neigh_in.shape[1])]
            # The full padded device arrays go in as-is (padded rows
            # carry only -1 candidates), so no re-padding ops are
            # traced.
            return rerank_exact(
                mz_pad_dev, int_pad_dev, neigh_in, fragment_tol,
                min(k_final, neigh_in.shape[1]), as_device=True,
            )

        sims, neigh, n_match = _compact_rerank(sims, neigh)
        if widen_boundary is not None:
            # Boundary-continued widening passes (round-4 verdict item
            # 8): each pass re-scans the band for the NEXT k_ann
            # candidates per row in the strict (UB desc, id asc)
            # retrieval order (ops/knn.py), reranks its survivors
            # exactly, and merges into the running exact top-k_final —
            # every device array stays at the proven-safe (rows, k)
            # shape class, so k_ann * passes can exceed the single-pass
            # worker-fault envelope.  Passes stop early once NO row's
            # boundary bound can still reach the prefilter threshold
            # (the k-th upper bound below thr proves the row's survivor
            # list is complete).
            from ..ops.knn import _merge_topk_payload

            plain_w, spread_w = widen_slabs
            b_s, b_i = widen_boundary
            for _pass in range(1, widen_passes):
                if not bool(jnp_.any(b_s >= thr)):
                    break
                s_p, g_p, (b_s, b_i) = knn_banded(
                    plain_w, mz_sorted, precursor_tol_mass,
                    precursor_tol_mode, k=k_ann, rts=rt_sorted,
                    rt_tol=rt_tol, as_device=True, exact_topk=True,
                    q_vectors=spread_w, scan_bf16=_scan_bf16(),
                    want_boundary=True, resume_boundary=(b_s, b_i),
                )
                s_p, g_p, m_p = _compact_rerank(s_p, g_p)
                sims, neigh, n_match = _merge_topk_payload(
                    sims, neigh, n_match, s_p, g_p, m_p,
                    min(k_final, sims.shape[1] + s_p.shape[1]),
                )
            widen_slabs = plain_w = spread_w = None
        if min_matches > 0:
            low = (neigh >= 0) & (n_match < min_matches)
            sims = jnp_.where(low, 0.0, sims)
    elif sims.shape[1] > k_final:
        sims, neigh = sims[:, :k_final], neigh[:, :k_final]

    _sync(sims, neigh)
    timer.stage("dbscan")
    # 3. DBSCAN on the sparse eps-graph: core points + connected
    # components as device label propagation, border attachment, and
    # small-component demotion (ops/density.py) — only n int32 labels
    # come back to the host.
    from ..ops.density import dbscan

    labels = dbscan(sims, neigh, eps, n, min_samples)

    if do_rerank or exact_index:
        # The lists hold EXACT peak-matching similarities — medoids come
        # from the same distances the clustering ran on (reference
        # min-row-sum rule; round-3 verdict #4).
        def medoid_scores_fn(seg, n_seg, _s=sims, _g=neigh):
            return _sparse_exact_medoid_scores(_s, _g, seg, n_seg)
    else:
        # rerank="off": clustering itself ran on hashed-vector cosine,
        # so hashed-vector medoids are the consistent choice (PARITY.md
        # divergence note).
        def medoid_scores_fn(seg, n_seg):
            return _medoid_scores(get_vectors_dev(), seg, n_seg)

    return labels, medoid_scores_fn


def _linkage_refine_and_medoids(
    timer, comp, order, mz_sorted, rt_sorted, n, offsets, mz_flat,
    int_flat, pad_to, linkage, eps, min_matches, fragment_tol,
    precursor_tol_mass, precursor_tol_mode, rt_tol, batch_size=2**15,
    hasher=None, devices=None,
):
    """Reference-semantics hierarchical clustering inside eps-components.

    ``comp`` labels each row of the block with its eps-connected
    component (-1 = not in any >=2-member component).  Each component
    plays the role of one exact-engine interval: condensed exact
    peak-matching distances (``ops/pairwise.py``), the native NN-chain
    linkage + fcluster cut at ``eps`` (``native/falcon_native.cc``;
    reference ``falcon/cluster/cluster.py:280-290``), the same
    precursor-m/z / RT refinement, and medoids from the EXACT distance
    matrix (reference min-row-sum rule, ``cluster.py:512-553``).

    Correctness of the decomposition: every flat cluster of a reducible
    linkage (single/complete/average) cut at ``t`` lies inside one
    single-linkage component at ``t`` (all cross-component distances
    exceed ``t``), and its merges at distance <= ``t`` are unaffected by
    rows outside the component, so per-component linkage + cut
    reproduces the full-matrix flat clusters exactly
    (tests/test_ann.py parity vs the exact engine).  The only
    approximation left is component DISCOVERY via the k-NN graph — the
    same recall envelope as the dbscan method.

    Returns (labels, medoids) with the same contract as
    ``_refine_and_medoids``.
    """
    from .. import native
    from ..ops import pairwise

    timer.stage("linkage")
    final = np.full(n, -1, np.int32)

    comp = np.asarray(comp, np.int64)
    order2 = np.argsort(comp, kind="stable")
    sorted_comp = comp[order2].astype(np.int32)
    slices = [
        (s, e) for s, e in cluster_group_slices(sorted_comp)
        if sorted_comp[s] >= 0
    ]
    positions = [order2[s:e] for s, e in slices]
    noise_pos = order2[sorted_comp == -1]

    # Cap per-component linkage at the reference's batch_size: an
    # eps-component is processed like a reference interval, and the
    # reference chunks oversized intervals evenly
    # (falcon/cluster/cluster.py:198-207).  Without this cap one giant
    # chained component (common at loose eps) would materialize an
    # unbounded m*(m-1)/2 condensed matrix on the host.  Same
    # accuracy-loss mode as the reference's own chunking (pairs across
    # chunk boundaries are not compared), logged when it happens.
    capped, n_chunked = [], 0
    for pos in positions:
        if len(pos) <= batch_size:
            capped.append(pos)
        else:
            n_chunks = -(-len(pos) // batch_size)
            bounds = np.linspace(0, len(pos), n_chunks + 1).astype(
                np.int64)
            capped.extend(
                pos[a:b] for a, b in zip(bounds[:-1], bounds[1:]))
            n_chunked += 1
    if n_chunked:
        logger.warning(
            "%d eps-component(s) exceeded batch_size=%d and were "
            "chunked for linkage (reference batch_size semantics: "
            "within-tolerance pairs across chunk boundaries are not "
            "compared)", n_chunked, batch_size,
        )
    positions = capped

    # Pad the block's peaks ONCE and slice per component: a
    # padded_peaks call per component is ~3500 python/numpy round
    # trips per charge on the bench corpus (measured ~0.5 s of the
    # linkage stage).
    member_pos = (np.concatenate(positions) if positions
                  else np.zeros(0, np.int64))
    mz_all, int_all, _ = padded_peaks(
        offsets, mz_flat, int_flat, pad_to, order[member_pos]
    )
    comp_off = np.zeros(len(positions) + 1, np.int64)
    np.cumsum([len(p) for p in positions], out=comp_off[1:])

    def comp_peaks(i):
        lo, hi = comp_off[i], comp_off[i + 1]
        return mz_all[lo:hi], int_all[lo:hi]

    per_comp = {}

    def process(i, pdist):
        """One component == one exact-engine interval (same flow as
        engine._cluster_interval, minus the shared-memmap plumbing)."""
        pos = positions[i]
        size = len(pos)
        # Fast path for the COMMON case (tight clusters): when every
        # pairwise distance is within eps, any linkage's flat cut at
        # eps is one cluster (all merge heights <= the max pairwise
        # distance), and when the precursor m/z (and RT) span is within
        # tolerance the refinement cannot split it either — skip the
        # NN-chain/fcluster/refine machinery (~3500 python+ctypes round
        # trips per bench charge) and go straight to the medoid.
        if pdist.max(initial=0.0) <= eps:
            mzs_c = mz_sorted[pos]
            span = float(mzs_c.max() - mzs_c.min())
            if precursor_tol_mode == "ppm":
                span_ok = (span / max(float(mzs_c.min()), 1e-12) * 1e6
                           <= precursor_tol_mass)
            else:
                span_ok = span <= precursor_tol_mass
            if span_ok and rt_tol is not None:
                rts_c = rt_sorted[pos]
                span_ok = float(rts_c.max() - rts_c.min()) <= rt_tol
            if span_ok:
                lab = np.zeros(size, np.int32)
                med = cluster_medoids(
                    order[pos].astype(np.int64), lab, pdist,
                    np.arange(size),
                )
                per_comp[i] = (pos, lab, 1, med)
                return
        z = native.linkage(pdist, linkage)
        flat = native.fcluster(z, eps, n=size)
        order1 = np.argsort(flat, kind="stable")
        sorted_labels = flat[order1].astype(np.int32)
        mzs_c = mz_sorted[pos[order1]]
        rts_c = rt_sorted[pos[order1]]
        current = 0
        for s_i, e_i in list(cluster_group_slices(sorted_labels)):
            current += postprocess_cluster(
                sorted_labels[s_i:e_i], mzs_c[s_i:e_i], rts_c[s_i:e_i],
                precursor_tol_mass, precursor_tol_mode, rt_tol, 2,
                current,
            )
        order2b = np.argsort(sorted_labels, kind="stable")
        med = cluster_medoids(
            order[pos[order1][order2b]].astype(np.int64),
            sorted_labels[order2b], pdist, order1[order2b],
        )
        per_comp[i] = (pos[order1], sorted_labels, current, med)

    # Components are small (a handful of spectra up to a few thousand):
    # small ones are scored in batched size-class panels (a handful of
    # device dispatches for ALL of them), large ones stream row panels.
    GROUP_MAX = int(_os.environ.get("FALCON_TPU_LINKAGE_GROUP_MAX",
                                    "1024"))
    small = [i for i in range(len(positions))
             if len(positions[i]) <= GROUP_MAX]
    large = [i for i in range(len(positions))
             if len(positions[i]) > GROUP_MAX]
    # Mesh scale-out (round-4 verdict item 3): round-robin the
    # per-component scoring dispatches across `--devices N`.  The
    # NN-chain/fcluster/refine host work stays on the main thread
    # (deterministic assembly below is order-independent: per_comp is
    # keyed by component index).
    dev_list = None
    if devices is not None and devices > 1:
        import jax

        if len(jax.devices()) >= devices:
            dev_list = list(jax.devices())[:devices]
    if small:
        for local_i, pdist in pairwise.grouped_condensed_distances(
            [comp_peaks(i) for i in small], fragment_tol, min_matches,
            devices=dev_list,
        ):
            process(small[local_i], pdist)
    # Large components: for complete/single linkage the flat cut at eps
    # is invariant to clamping every >eps distance to 1.0 (see
    # pairwise.pruned_condensed_distances for the argument), so exact
    # peak-matching work is spent only on pairs whose tolerance-spread
    # upper bound can reach 1 - eps — at loose eps that prunes the
    # dominant O(c^2) cost of chained giant components (round-4 verdict
    # item 2).  Average linkage mixes >eps distances into its merge
    # heights, so it keeps full scoring.
    prune = (
        hasher is not None
        and linkage in ("complete", "single")
        and _os.environ.get("FALCON_TPU_LINKAGE_PRUNE", "1") != "0"
    )

    def large_pdist(i, device=None):
        mz_pad, int_pad = comp_peaks(i)
        if prune:
            return pairwise.pruned_condensed_distances(
                mz_pad, int_pad, hasher, eps, fragment_tol, min_matches,
                device=device,
            )
        return pairwise.condensed_distances(
            mz_pad, int_pad, fragment_tol, min_matches, device=device,
        )

    if large and dev_list:
        # One host thread per device drives its round-robin share of the
        # large components (scoring has host sync points — counts fetch,
        # result readback — that would serialize a single-threaded
        # round-robin); NN-chain + refinement run on the main thread.
        from concurrent.futures import ThreadPoolExecutor, as_completed

        with ThreadPoolExecutor(len(dev_list)) as pool:
            futs = {
                pool.submit(large_pdist, i, dev_list[j % len(dev_list)]):
                i
                for j, i in enumerate(large)
            }
            for fut in as_completed(futs):
                process(futs[fut], fut.result())
    else:
        for i in large:
            process(i, large_pdist(i))

    timer.stage("refine")
    # Assemble in component order so labels are deterministic regardless
    # of the batched scoring order above.
    med_parts = [order[noise_pos].astype(np.int64)]
    current = 0
    for i in range(len(positions)):
        pos_lab, lab, n_cl, med = per_comp[i]
        mask = lab >= 0
        lab = lab.astype(np.int32)
        lab[mask] += current
        final[pos_lab] = lab
        current += n_cl
        med_parts.append(med)
    medoids = (np.concatenate(med_parts) if med_parts
               else np.zeros(0, np.int64))
    return final, medoids


def _refine_and_medoids(
    timer, labels, order, mz_sorted, rt_sorted, n, precursor_tol_mass,
    precursor_tol_mode, rt_tol, min_samples, medoid_scores_fn,
):
    """Shared tail of both pipelines: host refinement, medoid selection,
    noise->singleton promotion, dataset-order mapping."""
    timer.stage("refine")
    # 4. Refinement: precursor m/z / RT splitting per cluster, identical
    # semantics to the exact engine.
    order2 = np.argsort(labels, kind="stable")
    sorted_labels = labels[order2].astype(np.int32)
    mzs_interval = mz_sorted[order2]
    rts_interval = rt_sorted[order2]
    # Move the leading -1 block out of group iteration (it yields one
    # group per leading noise point, which is what we want for medoids,
    # but not for postprocessing).
    current_label = 0
    slices = list(cluster_group_slices(sorted_labels))
    # Vectorized no-split fast path: a cluster whose precursor m/z span
    # (and RT span) is within tolerance cannot be split by the 1-D
    # complete-linkage cut (its root merge distance IS the span), so
    # the expensive per-cluster machinery only runs on the rare
    # out-of-span clusters.  min_samples demotion semantics preserved.
    starts = np.asarray([s for s, _ in slices], np.int64)
    stops = np.asarray([e for _, e in slices], np.int64)
    mz_min_ = np.minimum.reduceat(mzs_interval, starts)
    mz_max_ = np.maximum.reduceat(mzs_interval, starts)
    if precursor_tol_mode == "ppm":
        mz_ok = (mz_max_ - mz_min_) / np.maximum(mz_min_, 1e-12) \
            * 1e6 <= precursor_tol_mass
    else:
        mz_ok = (mz_max_ - mz_min_) <= precursor_tol_mass
    if rt_tol is not None:
        rt_min_ = np.minimum.reduceat(rts_interval, starts)
        rt_max_ = np.maximum.reduceat(rts_interval, starts)
        mz_ok &= (rt_max_ - rt_min_) <= rt_tol
    min_samples_eff = max(min_samples, 2)
    for k_i, (start_i, stop_i) in enumerate(slices):
        if sorted_labels[start_i] == -1:
            continue
        if mz_ok[k_i]:
            if stop_i - start_i < min_samples_eff:
                sorted_labels[start_i:stop_i] = -1
            else:
                sorted_labels[start_i:stop_i] = current_label
                current_label += 1
            continue
        n_clusters = postprocess_cluster(
            sorted_labels[start_i:stop_i],
            mzs_interval[start_i:stop_i],
            rts_interval[start_i:stop_i],
            precursor_tol_mass, precursor_tol_mode, rt_tol,
            min_samples_eff, current_label,
        )
        current_label += n_clusters

    final = np.full(n, -1, np.int32)
    final[order2] = sorted_labels

    timer.stage("medoids")
    # 5. Medoids: min row-sum of within-cluster cosine distances.  Since
    # distance = 1 - inner product, row_sum_i = |C| - v_i . sum_C(v), so
    # the medoid is argmax_i v_i . s_C — ONE device segment-sum + dot,
    # fetching only n float32 scores instead of the full vector matrix.
    order3 = np.argsort(final, kind="stable")
    sorted_final = final[order3]
    n_seg = int(final.max()) + 1 if final.max() >= 0 else 1
    # Noise points go to a dedicated spill segment (n_seg) so they never
    # pollute a real cluster's sum.
    seg = np.where(final >= 0, final, n_seg).astype(np.int32)
    scores = medoid_scores_fn(seg, n_seg + 1)
    # Vectorized per-cluster argmax (first-max-by-row tie-breaking):
    # noise singletons represent themselves and come first, mirroring
    # cluster_group_slices iteration order.
    noise_rows = order3[sorted_final == -1]
    pos_rows = order3[sorted_final >= 0]
    if len(pos_rows):
        lab = final[pos_rows]
        lex = np.lexsort((-pos_rows, scores[pos_rows], lab))
        sorted_lab = lab[lex]
        ends = np.flatnonzero(
            np.diff(sorted_lab, append=sorted_lab[-1] + 1)
        )
        best = pos_rows[lex][ends]
    else:
        best = np.zeros(0, np.int64)
    # Convert positions in the sorted order back to dataset row indices.
    medoids = order[np.concatenate([noise_rows, best]).astype(np.int64)]

    # Noise promotion, logging, and the dataset-order scatter happen in
    # the caller (once across all device blocks).
    return final, medoids
