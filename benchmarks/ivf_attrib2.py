"""IVF attribution phase 2: the PRODUCTION metric (round-3 verdict #2).

Phase 1 (ivf_attrib.py) showed the loss is probe coverage, not
approx_max_k / bf16 — but its oracle was the hashed-vector ranking,
which counts weak hash-collision neighbors the clustering never uses.
This phase measures what BASELINE.json actually asks: NN recall@50 of
the production IVF path (retrieve n_neighbors_ann -> exact rerank ->
top 50) against the EXACT peak-matching-cosine oracle, on a query
sample, with two floors:

  - positive floor (exact score > 0) — the bench.py definition;
  - eps floor (exact score >= 1 - eps = 0.9) — the neighbors that can
    form clustering edges.

Also measures the banded+rerank path on the same sample (the claim
holder), and a member-aware probe-selection variant.

Usage: python benchmarks/ivf_attrib2.py [n_log2=17]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_target = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 17)
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
    del chunks

    # Exact-cosine oracle on a query sample: column chunks with a
    # device top-k per chunk, merged on host (the full panel OOMs HBM).
    # The wideband corpus is (almost) ONE 20 ppm band; the few
    # out-of-tolerance tail pairs are masked on the host merge, with
    # per-chunk over-retrieval absorbing the masked slots.
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
        if pairwise.use_pallas():
            sc, _ = pairwise.panel_scores_pallas(
                jnp.asarray(q_mz), jnp.asarray(q_int),
                mz_dev[c0:c0 + col_chunk], int_dev[c0:c0 + col_chunk],
                jnp.int32(0), 0.05, upper_only=False,
                with_matches=False,
            )
        else:
            from falcon_tpu.ops.matching import rect_scores_xla

            sc = rect_scores_xla(
                jnp.asarray(q_mz), jnp.asarray(q_int),
                mz_dev[c0:c0 + col_chunk], int_dev[c0:c0 + col_chunk],
                0.05)
        ts, tp = jax.lax.top_k(sc[:, :width], min(k + 16, width))
        # Fetch per chunk (serializes the loop): unbounded async
        # dispatch piles every chunk's panel temporaries into HBM.
        part_sc.append(np.asarray(ts))
        part_id.append(np.asarray(tp) + c0)
        del sc, ts, tp
    cat_sc = np.concatenate(part_sc, axis=1)
    cat_id = np.concatenate(part_id, axis=1)
    cat_sc[cat_id == sample[:, None]] = -1.0  # self-exclusion
    ppm = np.abs(
        (mzs[sample][:, None] - mzs[cat_id]) / mzs[cat_id] * 1e6)
    cat_sc[ppm > 20.0] = -1.0
    order2 = np.argsort(-cat_sc, axis=1, kind="stable")[:, :k]
    top_sc = np.take_along_axis(cat_sc, order2, axis=1)
    top = np.take_along_axis(cat_id, order2, axis=1)
    oracle_pos = np.where(top_sc > 0.0, top, -1)
    oracle_eps = np.where(top_sc >= 0.9, top, -1)
    n_pos = int((oracle_pos >= 0).sum())
    n_eps = int((oracle_eps >= 0).sum())
    print(f"oracle in {time.time()-t0:.1f}s; positive-floor neighbors "
          f"{n_pos}, eps-floor {n_eps}", flush=True)

    def rerank50(neigh):
        if isinstance(neigh, np.ndarray):
            neigh = jnp.asarray(neigh[:, :128].astype(np.int32))
        else:
            neigh = neigh[:, :128]
        _, idx, _ = rerank_exact(
            mz_dev, int_dev, neigh, 0.05, k, as_device=True,
        )
        return np.asarray(idx[sample])[:, :k]

    def report(tag, approx_idx):
        print(json.dumps({
            "tag": tag,
            "recall@50_pos": round(
                nn_recall_at_k(approx_idx, oracle_pos, k), 4),
            "recall@50_eps": round(
                nn_recall_at_k(approx_idx, oracle_eps, k), 4),
        }), flush=True)

    # Banded + rerank (the path whose recall is the standing claim).
    _, cand = knn_banded(vectors, mzs, 20.0, "ppm", k=128,
                         as_device=True)
    report("banded128_rerank", rerank50(cand))

    for n_probe in (32, 64, 128):
        index = IVFIndex(vectors, mzs, seed=42)
        sims, neigh = index.search(
            vectors, mzs, np.arange(n, dtype=np.int32), 128,
            n_probe=n_probe, tol_mass=20.0, tol_mode="ppm",
        )
        report(f"ivf128_rerank_np{n_probe}", rerank50(neigh))
    return 0


if __name__ == "__main__":
    sys.exit(main())
