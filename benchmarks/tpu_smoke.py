"""On-TPU kernel parity smoke (VERDICT r1 #8).

Runs on the REAL chip (plain ``python benchmarks/tpu_smoke.py``) and
checks that the Mosaic-compiled Pallas panel kernel, the XLA fallback,
and the host scipy oracle agree on one interval of simulated spectra —
so on-chip compiled correctness is verified per round instead of
assumed from bench success.  Exit code 0 = parity holds.

Takes ~1-4 min on a fresh machine (first Pallas compile); seconds warm.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp

    from falcon_tpu.cluster.oracle import cosine_exact
    from falcon_tpu.ops import pairwise
    from falcon_tpu.preprocess import process_spectrum
    from falcon_tpu.simulate import make_clustered_spectra
    from falcon_tpu.store.store import padded_peaks

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    if backend != "tpu":
        print("SKIP: not running on a TPU backend")
        return 0

    spectra, _ = make_clustered_spectra(
        n_clusters=12, cluster_size=6, n_noise=24, seed=17
    )
    rows = []
    for s in spectra:
        p = process_spectrum(s, 5, 250.0, 101.0, 1500.0, 1.5, 0.01, 50,
                             None)
        if p is not None:
            rows.append(p)
    offsets = np.zeros(len(rows) + 1, np.int64)
    np.cumsum([len(r["mz"]) for r in rows], out=offsets[1:])
    mz_flat = np.concatenate([r["mz"] for r in rows])
    int_flat = np.concatenate([r["intensity"] for r in rows])
    mz, intensity, lengths = padded_peaks(offsets, mz_flat, int_flat, 64)
    n = len(rows)
    n_cols = 512
    mz_cols = np.full((n_cols, 64), pairwise.PAD_MZ, np.float32)
    int_cols = np.zeros((n_cols, 64), np.float32)
    mz_cols[:n], int_cols[:n] = mz, intensity

    t0 = time.time()
    pallas_scores, pallas_matches = pairwise.panel_scores_pallas(
        jnp.asarray(mz), jnp.asarray(intensity),
        jnp.asarray(mz_cols), jnp.asarray(int_cols),
        jnp.int32(0), 0.05, upper_only=False,
    )
    pallas_scores = np.asarray(pallas_scores)[:, :n]
    pallas_matches = np.asarray(pallas_matches)[:, :n]
    print(f"pallas (mosaic) panel: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    xla_scores, xla_matches = pairwise.block_scores_xla(
        jnp.asarray(mz_cols), jnp.asarray(int_cols), 0.05
    )
    xla_scores = np.asarray(xla_scores)[:n, :n]
    xla_matches = np.asarray(xla_matches)[:n, :n]
    print(f"xla fallback: {time.time() - t0:.1f}s", flush=True)

    np.testing.assert_allclose(pallas_scores, xla_scores, atol=1e-4)
    np.testing.assert_array_equal(pallas_matches, xla_matches)

    rng = np.random.default_rng(3)
    for _ in range(40):
        i, j = rng.integers(0, n, 2)
        want, want_m = cosine_exact(
            mz[i][: lengths[i]], intensity[i][: lengths[i]],
            mz[j][: lengths[j]], intensity[j][: lengths[j]], 0.05,
        )
        got = float(pallas_scores[i, j])
        assert abs(got - want) < 5e-3, (i, j, got, want)

    print("PARITY OK: pallas == xla == oracle on", n, "spectra")
    return 0


if __name__ == "__main__":
    sys.exit(main())
