"""IVF attribution phase 3: WHERE does an eps-relevant neighbor get
lost?  For every exact-cosine >= 1-eps oracle pair the IVF path misses,
classify the loss stage:

  - probe_miss: the neighbor's placed list is not among the query's
    n_probe probed lists (reports the rank of that list in the query's
    probe ordering);
  - topk_loss: the neighbor's list WAS probed but the pair lost the
    k_eff top-k competition inside the scan;
  - rerank_loss: the pair survived retrieval but fell out of the exact
    rerank's top 50.

Also re-measures the banded path in its PRODUCTION configuration
(tolerance-spread upper bound + exact top-k) — phase 2 measured the
plain hashed ranking with approx_max_k by mistake.

Usage: python benchmarks/ivf_attrib3.py [n_log2=16]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_target = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    import jax
    import jax.numpy as jnp

    from falcon_tpu.metrics import nn_recall_at_k
    from falcon_tpu.ops import pairwise
    from falcon_tpu.ops.ivf import IVFIndex
    from falcon_tpu.ops.knn import knn_banded
    from falcon_tpu.ops.rerank import rerank_exact
    from falcon_tpu.ops.vectorize import SpectrumHasher
    from falcon_tpu.preprocess import process_spectrum
    from falcon_tpu.simulate import make_clustered_spectra

    print(f"backend={jax.default_backend()} n={n_target}", flush=True)
    n_clusters = n_target * 7 // 100
    spectra, _ = make_clustered_spectra(
        n_clusters=n_clusters, cluster_size=10,
        n_noise=n_target - n_clusters * 10, seed=5,
        precursor_mz_range=(700.0, 700.0 * (1 + 18e-6)),
        precursor_classes=None, charges=(2,),
    )
    rows = [
        p for s in spectra
        if (p := process_spectrum(s, 5, 250.0, 101.0, 1500.0, 1.5,
                                  0.01, 50, None)) is not None
    ]
    offsets = np.zeros(len(rows) + 1, np.int64)
    offsets[1:] = np.cumsum([len(r["mz"]) for r in rows])
    mz_flat = np.concatenate([r["mz"] for r in rows])
    int_flat = np.concatenate([r["intensity"] for r in rows])
    pmz = np.asarray([r["precursor_mz"] for r in rows], np.float64)
    order = np.argsort(pmz, kind="stable")
    mzs = pmz[order]
    n = len(rows)
    n_pad = 512
    while n_pad < n:
        n_pad *= 2

    from falcon_tpu.ops.xfer import upload_padded_peaks

    mz_dev, int_dev = upload_padded_peaks(
        offsets, mz_flat, int_flat, order, 64, n_pad)
    hasher = SpectrumHasher(101.0, 1500.0, 0.05, 400, 0)
    chunks = [
        hasher.vectorize(mz_dev[c0:c0 + min(65536, n_pad - c0)],
                         int_dev[c0:c0 + min(65536, n_pad - c0)])
        for c0 in range(0, n_pad, 65536)
    ]
    vectors = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    plain = jnp.concatenate([
        hasher.vectorize(mz_dev[c0:c0 + min(65536, n_pad - c0)],
                         int_dev[c0:c0 + min(65536, n_pad - c0)],
                         norm=False)
        for c0 in range(0, n_pad, 65536)
    ]) if n_pad > 65536 else hasher.vectorize(mz_dev, int_dev, norm=False)
    spread = jnp.concatenate([
        hasher.vectorize(mz_dev[c0:c0 + min(65536, n_pad - c0)],
                         int_dev[c0:c0 + min(65536, n_pad - c0)],
                         norm=False, spread=True)
        for c0 in range(0, n_pad, 65536)
    ]) if n_pad > 65536 else hasher.vectorize(mz_dev, int_dev,
                                              norm=False, spread=True)

    # Oracle (chunked, forced per chunk).
    rng = np.random.default_rng(0)
    n_sample = 1024
    sample = np.sort(rng.choice(n, size=n_sample, replace=False))
    t0 = time.time()
    k = 50
    q_mz = np.asarray(mz_dev[sample])
    q_int = np.asarray(int_dev[sample])
    col_chunk = 8192
    part_sc, part_id = [], []
    for c0 in range(0, n, col_chunk):
        c1 = min(c0 + col_chunk, n)
        width = c1 - c0
        sc, _ = pairwise.panel_scores_pallas(
            jnp.asarray(q_mz), jnp.asarray(q_int),
            mz_dev[c0:c0 + col_chunk], int_dev[c0:c0 + col_chunk],
            jnp.int32(0), 0.05, upper_only=False, with_matches=False,
        ) if pairwise.use_pallas() else (None, None)
        if sc is None:
            from falcon_tpu.ops.matching import rect_scores_xla

            sc = rect_scores_xla(
                jnp.asarray(q_mz), jnp.asarray(q_int),
                mz_dev[c0:c0 + col_chunk], int_dev[c0:c0 + col_chunk],
                0.05)
        ts, tp = jax.lax.top_k(sc[:, :width], min(k + 16, width))
        part_sc.append(np.asarray(ts))
        part_id.append(np.asarray(tp) + c0)
        del sc, ts, tp
    cat_sc = np.concatenate(part_sc, axis=1)
    cat_id = np.concatenate(part_id, axis=1)
    cat_sc[cat_id == sample[:, None]] = -1.0
    ppm = np.abs(
        (mzs[sample][:, None] - mzs[cat_id]) / mzs[cat_id] * 1e6)
    cat_sc[ppm > 20.0] = -1.0
    order2 = np.argsort(-cat_sc, axis=1, kind="stable")[:, :k]
    top_sc = np.take_along_axis(cat_sc, order2, axis=1)
    top = np.take_along_axis(cat_id, order2, axis=1)
    oracle_pos = np.where(top_sc > 0.0, top, -1)
    oracle_eps = np.where(top_sc >= 0.9, top, -1)
    print(f"oracle in {time.time()-t0:.1f}s; pos {int((oracle_pos>=0).sum())} "
          f"eps {int((oracle_eps>=0).sum())}", flush=True)

    def rerank50(neigh):
        if isinstance(neigh, np.ndarray):
            neigh = jnp.asarray(neigh[:, :128].astype(np.int32))
        else:
            neigh = neigh[:, :128]
        _, idx, _ = rerank_exact(
            mz_dev, int_dev, neigh, 0.05, k, as_device=True,
        )
        return np.asarray(idx[np.asarray(sample)])[:, :k]

    def report(tag, approx_idx, extra=None):
        out = {
            "tag": tag,
            "recall@50_pos": round(
                nn_recall_at_k(approx_idx, oracle_pos, k), 4),
            "recall@50_eps": round(
                nn_recall_at_k(approx_idx, oracle_eps, k), 4),
        }
        if extra:
            out.update(extra)
        print(json.dumps(out), flush=True)

    # PRODUCTION banded path: spread-UB ranking + exact top-k.
    _, cand = knn_banded(plain, mzs, 20.0, "ppm", k=128,
                         as_device=True, exact_topk=True,
                         q_vectors=spread)
    report("banded_prod_ub128_rerank", rerank50(cand))

    # IVF + diagnosis.
    for n_probe in (32, 64):
        index = IVFIndex(vectors, mzs, seed=42)
        sims, neigh = index.search(
            vectors, mzs, np.arange(n, dtype=np.int32), 128,
            n_probe=n_probe, tol_mass=20.0, tol_mode="ppm",
        )
        approx_idx = rerank50(neigh)

        # Classify every missed eps pair.
        placed = np.empty(n, np.int64)
        for lst in range(index.n_lists):
            lo_, hi_ = index.offsets[lst], index.offsets[lst + 1]
            placed[index.order[lo_:hi_]] = lst
        probe_order = np.lexsort(
            (-index._centroid_sims, -index._probe_affinity), axis=1
        ) if hasattr(index, "_probe_affinity") else np.argsort(
            -index._centroid_sims, axis=1, kind="stable")
        probe_rank = np.empty_like(probe_order)
        np.put_along_axis(
            probe_rank, probe_order,
            np.broadcast_to(np.arange(index.n_lists),
                            probe_order.shape).copy(), axis=1)
        stages = {"probe_miss": 0, "topk_loss": 0, "rerank_loss": 0}
        miss_ranks = []
        retr = {qi: set(neigh[s][neigh[s] >= 0].tolist())
                for qi, s in enumerate(sample)}
        got = {qi: set(approx_idx[qi][approx_idx[qi] >= 0].tolist())
               for qi in range(n_sample)}
        for qi, s in enumerate(sample):
            for m in oracle_eps[qi]:
                if m < 0 or int(m) in got[qi]:
                    continue
                m = int(m)
                rank = int(probe_rank[placed[s], placed[m]])
                if rank >= n_probe:
                    stages["probe_miss"] += 1
                    miss_ranks.append(rank)
                elif m not in retr[qi]:
                    stages["topk_loss"] += 1
                else:
                    stages["rerank_loss"] += 1
        extra = {"missed_stages": stages}
        if miss_ranks:
            extra["probe_miss_rank_pct"] = [
                int(np.percentile(miss_ranks, p)) for p in (50, 90, 99)
            ]
        report(f"ivf128_rerank_np{n_probe}", approx_idx, extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
