"""IVF attribution phase 4: does a tolerance-SPREAD coarse space fix
the probe misses phase 3 diagnosed?

Phase 3 measured eps-neighbor recall@50 of 0.72 at n_probe=32 and
attributed ~97% of the misses to PROBE misses caused by fragment-bin
splits in the plain hashed embedding (the true neighbor's list at
median probe rank ~117/256 — near-random).  The spread embedding
(``ops/vectorize.py``: each peak scattered into bins {b-1, b, b+1}) is
immune to bin splits by construction, so training/assigning/probing the
coarse quantizer in it should recover the missed pairs.  This benchmark
re-runs the phase-3 harness with both coarse spaces side by side.

Usage: python benchmarks/ivf_attrib4.py [n_log2=16]
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
    vectors = hasher.vectorize(mz_dev, int_dev)
    spread_n = hasher.vectorize(mz_dev, int_dev, spread=True)
    plain_u = hasher.vectorize(mz_dev, int_dev, norm=False)
    spread_u = hasher.vectorize(mz_dev, int_dev, norm=False,
                                spread=True)

    # Oracle (chunked, forced per chunk) — identical to phase 3.
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
        sc = None
        if pairwise.use_pallas():
            sc, _ = pairwise.panel_scores_pallas(
                jnp.asarray(q_mz), jnp.asarray(q_int),
                mz_dev[c0:c0 + col_chunk], int_dev[c0:c0 + col_chunk],
                jnp.int32(0), 0.05, upper_only=False, with_matches=False,
            )
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
    print(f"oracle in {time.time()-t0:.1f}s; "
          f"pos {int((oracle_pos>=0).sum())} "
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

    configs = (
        ("plain", vectors, None, None),
        ("spread", vectors, spread_n, None),
        ("spread_ubrank", plain_u, spread_n, spread_u),
    )
    for tag, base, coarse, rank in configs:
        for n_probe in (32, 64, 128):
            index = IVFIndex(base, mzs, seed=42,
                             coarse_vectors=coarse, rank_vectors=rank)
            sims, neigh = index.search(
                base, mzs, np.arange(n, dtype=np.int32), 128,
                n_probe=n_probe, tol_mass=20.0, tol_mode="ppm",
            )
            approx_idx = rerank50(neigh)

            # Classify every missed eps pair (phase-3 taxonomy).
            placed = np.empty(n, np.int64)
            for lst in range(index.n_lists):
                lo_, hi_ = index.offsets[lst], index.offsets[lst + 1]
                placed[index.order[lo_:hi_]] = lst
            probe_rank = np.empty(
                (index.n_lists, index.n_lists), np.int64)
            probe_order = np.argsort(
                -index._centroid_sims, axis=1, kind="stable")
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
                    int(np.percentile(miss_ranks, p))
                    for p in (50, 90, 99)
                ]
            report(f"ivf128_rerank_{tag}_np{n_probe}", approx_idx,
                   extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
