"""Attribute the IVF path's recall loss (round-3 verdict #2).

Builds a wideband corpus (every precursor inside one 20 ppm window — the
regime the IVF index exists for), hashes it, and measures the IVF
search's recall@k against the exact hashed brute-force ranking
(``ops/knn.knn_banded`` with ``exact_topk=True``), toggling one suspect
at a time:

  - the chunk scan's ``approx_max_k`` (recall_target=0.99) vs exact
    ``lax.top_k``
  - ``n_probe`` (32 / 64 / 128)
  - bfloat16 vs float32 scan precision
  - placement-rank locality (how much recall the rows placed in their
    2nd+-choice lists lose)

Usage: python benchmarks/ivf_attrib.py [n_log2=17] (runs on the live
JAX backend — TPU when available).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 17)
    import jax
    import jax.numpy as jnp

    from falcon_tpu.ops import ivf as ivf_mod
    from falcon_tpu.ops.knn import knn_banded
    from falcon_tpu.ops.vectorize import SpectrumHasher
    from falcon_tpu.preprocess import process_spectrum
    from falcon_tpu.simulate import make_clustered_spectra
    from falcon_tpu.store.store import padded_peaks

    print(f"backend={jax.default_backend()} n={n}", flush=True)
    t0 = time.time()
    n_clusters = n * 7 // 100
    spectra, _ = make_clustered_spectra(
        n_clusters=n_clusters, cluster_size=10,
        n_noise=n - n_clusters * 10, seed=5,
        precursor_mz_range=(700.0, 700.0 * (1 + 18e-6)),
        precursor_classes=None, charges=(2,),
    )
    rows = [
        p for s in spectra
        if (p := process_spectrum(s, 5, 250.0, 101.0, 1500.0, 1.5,
                                  0.01, 50, None)) is not None
    ]
    print(f"gen+preprocess {len(rows)} rows in {time.time()-t0:.1f}s",
          flush=True)

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

    t0 = time.time()
    from falcon_tpu.ops.xfer import upload_padded_peaks

    mz_dev, int_dev = upload_padded_peaks(
        offsets, mz_flat, int_flat, order, 64, n_pad)
    hasher = SpectrumHasher(101.0, 1500.0, 0.05, 400, 0)
    chunks = []
    for c0 in range(0, n_pad, 65536):
        size = min(65536, n_pad - c0)
        chunks.append(hasher.vectorize(
            mz_dev[c0:c0 + size], int_dev[c0:c0 + size]))
    vectors = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    print(f"vectorize in {time.time()-t0:.1f}s", flush=True)

    k = 128
    t0 = time.time()
    oracle_s, oracle_i = knn_banded(
        vectors, mzs, 20.0, "ppm", k=k, as_device=False, exact_topk=True,
    )
    print(f"exact hashed brute-force oracle in {time.time()-t0:.1f}s",
          flush=True)

    from falcon_tpu.metrics import nn_recall_at_k

    def measure(tag, **kw):
        n_probe = kw.pop("n_probe", 32)
        t0 = time.time()
        index = ivf_mod.IVFIndex(vectors, mzs, seed=42,
                                 precise=kw.pop("precise", False))
        build_s = time.time() - t0
        t0 = time.time()
        sims, neigh = index.search(
            vectors, mzs, np.arange(n, dtype=np.int32), k,
            n_probe=n_probe, tol_mass=20.0, tol_mode="ppm",
            precise=kw.pop("scan_precise", False),
        )
        search_s = time.time() - t0
        r128 = nn_recall_at_k(neigh[:, :k], oracle_i[:, :k], k)
        r50 = nn_recall_at_k(neigh[:, :50], oracle_i[:, :50], 50)
        # Recall by placement rank: rows in their 1st-choice list vs
        # rows the balanced placement pushed to rank 2+.
        choices = np.asarray(ivf_mod._assign_topk(
            vectors, jnp.asarray(index.centroids), 1))[:n, 0]
        placed = np.empty(n, np.int64)
        for lst in range(index.n_lists):
            lo, hi = index.offsets[lst], index.offsets[lst + 1]
            placed[index.order[lo:hi]] = lst
        first = placed == choices
        r50_first = nn_recall_at_k(
            neigh[first][:, :50], oracle_i[first][:, :50], 50)
        r50_moved = (nn_recall_at_k(
            neigh[~first][:, :50], oracle_i[~first][:, :50], 50)
            if (~first).sum() else float("nan"))
        print(json.dumps({
            "tag": tag, "n_probe": n_probe,
            "recall@50": round(r50, 4), "recall@128": round(r128, 4),
            "recall@50_first_choice": round(r50_first, 4),
            "recall@50_moved_rows": round(r50_moved, 4),
            "moved_frac": round(float((~first).mean()), 4),
            "build_s": round(build_s, 1), "search_s": round(search_s, 1),
            "n_lists": index.n_lists,
        }), flush=True)

    os.environ["FALCON_TPU_IVF_EXACT_TOPK"] = "0"
    measure("r3_baseline_bf16_approx", n_probe=32)
    measure("approx_np64", n_probe=64)
    os.environ["FALCON_TPU_IVF_EXACT_TOPK"] = "1"
    measure("exact_topk", n_probe=32)
    measure("exact_topk_f32", n_probe=32, scan_precise=True,
            precise=True)
    measure("exact_topk_np64", n_probe=64)
    measure("exact_topk_np128", n_probe=128)
    del os.environ["FALCON_TPU_IVF_EXACT_TOPK"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
