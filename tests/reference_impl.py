"""Faithful reimplementation of the reference's clustering pipeline.

Used ONLY as a test oracle: this mirrors ``/root/reference/falcon``'s live
algorithm step by step with scipy (Hungarian cosine, hierarchical linkage,
fcluster), independent of the falcon_tpu production code.  Citations refer
to the reference files.
"""

import math

import numpy as np
import scipy.cluster.hierarchy as sch
import scipy.optimize


def cosine_fast(mz1, int1, mz2, int2, fragment_mz_tolerance):
    """Reference ``cosine_fast`` (falcon/cluster/similarity.py:17-80)."""
    cost = np.where(
        np.abs(np.asarray(mz1, np.float32)[:, None]
               - np.asarray(mz2, np.float32)[None, :])
        <= fragment_mz_tolerance,
        np.asarray(int1, np.float32)[:, None]
        * np.asarray(int2, np.float32)[None, :],
        np.float32(0.0),
    )
    row_ind, col_ind = scipy.optimize.linear_sum_assignment(
        cost, maximize=True
    )
    pair_scores = cost[row_ind, col_ind]
    positive = pair_scores > 0
    return (
        float(min(max(pair_scores[positive].sum(), 0.0), 1.0)),
        int(positive.sum()),
    )


def mass_diff(mz1, mz2, mode_is_da):
    return mz1 - mz2 if mode_is_da else (mz1 - mz2) / mz2 * 10**6


def get_precursor_mz_splits(precursor_mzs, tol_mass, tol_mode, batch_size):
    """Reference ``_get_precursor_mz_splits`` (cluster.py:159-209),
    including the quirk that the trailing block is never chunked."""
    splits = [0]
    for i in range(1, len(precursor_mzs)):
        if mass_diff(precursor_mzs[i], precursor_mzs[i - 1],
                     tol_mode == "Da") > tol_mass:
            block_size = i - splits[-1]
            if block_size < batch_size:
                splits.append(i)
            else:
                n_chunks = math.ceil(block_size / batch_size)
                chunk_size = block_size // n_chunks
                for _ in range(block_size % n_chunks):
                    splits.append(splits[-1] + chunk_size + 1)
                for _ in range(n_chunks - (block_size % n_chunks)):
                    splits.append(splits[-1] + chunk_size)
    splits.append(len(precursor_mzs))
    return splits


def linkage_1d(values, tol_mode=None):
    """Reference ``_linkage`` (cluster.py:458-509), verbatim port."""
    linkage = np.zeros((values.shape[0] - 1, 4), np.double)
    clusters = [(values[i], values[i], i, 1) for i in np.argsort(values)]
    for it in range(values.shape[0] - 1):
        min_dist, min_i = np.inf, -1
        for i in range(len(clusters) - 1):
            dist = clusters[i + 1][1] - clusters[i][0]
            if tol_mode == "ppm":
                dist = dist / clusters[i][0] * 10**6
            if dist < min_dist:
                min_dist, min_i = dist, i
        n_points = clusters[min_i][3] + clusters[min_i + 1][3]
        linkage[it, :] = [
            clusters[min_i][2], clusters[min_i + 1][2], min_dist, n_points,
        ]
        clusters[min_i] = (
            clusters[min_i][0], clusters[min_i + 1][1],
            values.shape[0] + it, n_points,
        )
        del clusters[min_i + 1]
    return linkage


def postprocess_cluster(cluster_labels, cluster_mzs, cluster_rts,
                        precursor_tol_mass, precursor_tol_mode, rt_tol,
                        min_samples, start_label):
    """Reference ``_postprocess_cluster`` (cluster.py:362-455), with the
    mz x RT merge done via a true pairing (the divergence falcon_tpu
    documents; the reference's ``mz*2 + rt*3`` can collide)."""
    if cluster_labels.shape[0] < min_samples:
        cluster_labels.fill(-1)
        return 0
    assignments = sch.fcluster(
        linkage_1d(cluster_mzs, precursor_tol_mode),
        precursor_tol_mass, "distance",
    ) - 1
    if rt_tol is not None:
        assignments_rt = sch.fcluster(
            linkage_1d(cluster_rts), rt_tol, "distance"
        ) - 1
        assignments = np.unique(
            assignments.astype(np.int64) * (assignments_rt.max() + 1)
            + assignments_rt,
            return_inverse=True,
        )[1]
    n_clusters = assignments.max() + 1
    if n_clusters == 1:
        cluster_labels.fill(start_label)
    elif n_clusters == cluster_mzs.shape[0]:
        cluster_labels.fill(-1)
        n_clusters = 0
    else:
        labels = {}
        for label in assignments:
            labels[label] = labels.get(label, 0) + 1
        n_clusters = 0
        for label, count in labels.items():
            if count < min_samples:
                labels[label] = -1
            else:
                labels[label] = start_label + n_clusters
                n_clusters += 1
        for i, label in enumerate(assignments):
            cluster_labels[i] = labels[label]
    return n_clusters


def get_cluster_group_idx(clusters):
    """Reference ``_get_cluster_group_idx`` (cluster.py:334-359)."""
    start_i = 0
    while start_i < clusters.shape[0] and clusters[start_i] == -1:
        yield start_i, start_i + 1
        start_i += 1
    stop_i = start_i
    while stop_i < clusters.shape[0]:
        start_i, label = stop_i, clusters[stop_i]
        while stop_i < clusters.shape[0] and clusters[stop_i] == label:
            stop_i += 1
        yield start_i, stop_i


def condensed_index(i, j, n):
    if i > j:
        i, j = j, i
    return int(n * i + j - ((i + 2) * (i + 1)) // 2)


def get_cluster_medoids(idx_interval, labels, pdist, order_map):
    """Reference ``_get_cluster_medoids`` (cluster.py:512-553)."""
    medoids, m = [], len(idx_interval)
    for start_i, stop_i in get_cluster_group_idx(labels):
        if stop_i - start_i > 1:
            row_sum = np.zeros(stop_i - start_i, np.float32)
            for row in range(stop_i - start_i):
                for col in range(row + 1, stop_i - start_i):
                    i, j = order_map[start_i + row], order_map[start_i + col]
                    d = pdist[condensed_index(i, j, m)]
                    row_sum[row] += d
                    row_sum[col] += d
            medoids.append(idx_interval[start_i + np.argmin(row_sum)])
        else:
            medoids.append(idx_interval[start_i])
    return np.asarray(medoids, np.int64)


def generate_clusters(precursor_mzs, rts, peak_mzs, peak_ints, linkage,
                      distance_threshold, min_matches, precursor_tol_mass,
                      precursor_tol_mode, rt_tol, fragment_tol,
                      batch_size):
    """Reference ``generate_clusters`` + ``_cluster_interval``
    (cluster.py:24-331), with dataset rows as medoid indices (the
    falcon_tpu divergence for empty/singleton intervals)."""
    n = len(precursor_mzs)
    order = np.argsort(precursor_mzs, kind="stable")
    mz_sorted = np.asarray(precursor_mzs, np.float64)[order]
    rt_sorted = np.asarray(rts, np.float64)[order]
    splits = get_precursor_mz_splits(
        mz_sorted, precursor_tol_mass, precursor_tol_mode, batch_size
    )
    labels = np.full(n, -1, np.int32)
    medoids = []
    for k in range(len(splits) - 1):
        start, stop = splits[k], splits[k + 1]
        rows = order[start:stop]
        if stop - start <= 1:
            medoids.append(rows.astype(np.int64))
            continue
        m = stop - start
        pdist = np.zeros(m * (m - 1) // 2)
        for a in range(m - 1):
            ia = rows[a]
            for b in range(a + 1, m):
                ib = rows[b]
                sim, n_match = cosine_fast(
                    peak_mzs[ia], peak_ints[ia], peak_mzs[ib],
                    peak_ints[ib], fragment_tol,
                )
                if n_match < min_matches:
                    sim = 0.0
                pdist[condensed_index(a, b, m)] = 1.0 - sim
        flat = sch.fcluster(
            sch.linkage(pdist, linkage), distance_threshold, "distance"
        ) - 1
        order1 = np.argsort(flat, kind="stable")
        idx_interval = rows[order1]
        mzs_interval = mz_sorted[start:stop][order1]
        rts_interval = rt_sorted[start:stop][order1]
        sorted_labels = flat[order1].astype(np.int32)
        current_label = 0
        for s, e in list(get_cluster_group_idx(sorted_labels.copy())):
            n_clusters = postprocess_cluster(
                sorted_labels[s:e], mzs_interval[s:e], rts_interval[s:e],
                precursor_tol_mass, precursor_tol_mode, rt_tol, 2,
                current_label,
            )
            current_label += n_clusters
        labels[idx_interval] = sorted_labels
        if current_label > 0:
            order2 = np.argsort(sorted_labels, kind="stable")
            medoids.append(get_cluster_medoids(
                idx_interval[order2], sorted_labels[order2], pdist,
                order1[order2],
            ))
        else:
            medoids.append(idx_interval.astype(np.int64))
    # Global labels (reference cluster.py:556-590).
    max_label = 0
    current_label = 0
    for k in range(len(splits) - 1):
        rows = order[splits[k]:splits[k + 1]]
        mask = labels[rows] != -1
        if mask.any():
            labels[rows[mask]] += current_label
            max_label = max(max_label, int(labels[rows[mask]].max()))
        current_label = max_label + 1
    # Noise -> singletons (reference cluster.py:144-155).
    noise_mask = labels == -1
    n_clusters = labels.max() + 1
    labels[noise_mask] = np.arange(
        n_clusters, n_clusters + noise_mask.sum()
    )
    return labels, np.hstack(medoids) if medoids else np.zeros(0, np.int64)
