import sys

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8_devices():
    """The driver's multi-chip validation path on the 8-device CPU mesh."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft

    n = jax.device_count()
    assert n >= 8, "conftest should provide 8 virtual CPU devices"
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2_devices():
    import __graft_entry__ as graft

    graft.dryrun_multichip(2)


def test_entry_compiles_and_runs():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    jitted = jax.jit(fn)
    top_scores, top_idx, exact_scores = jitted(*args)
    jax.block_until_ready((top_scores, top_idx, exact_scores))
    n = args[0].shape[0]
    assert exact_scores.shape == (n, n)
    np.testing.assert_allclose(
        np.asarray(exact_scores)[np.arange(n), np.arange(n)], 1.0,
        atol=1e-5,
    )


def test_multichip_matches_single_chip():
    """The sharded step's results are independent of the mesh size."""
    import __graft_entry__ as graft
    from falcon_tpu.ops.hashing import binning_dims, hash_bin_mapping
    from falcon_tpu.parallel.mesh import make_mesh, multichip_cluster_step

    mz, intensity, precursor = graft._example_peaks(n=32, p=64)
    n_bins, min_bound, _ = binning_dims(101.0, 1500.0, 0.05)
    mapping = hash_bin_mapping(n_bins, 400, 0)
    rng = np.random.default_rng(0)
    centroids = rng.normal(size=(8, 512)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    results = {}
    for n_dev in (1, 4):
        mesh = make_mesh(n_dev)
        results[n_dev] = multichip_cluster_step(
            mesh, mz, intensity, precursor, mapping, centroids,
            min_bound, 0.05, n_bins, exact_rows=32 // n_dev,
        )
    c1, s1, i1, e1 = [np.asarray(x) for x in results[1]]
    c4, s4, i4, e4 = [np.asarray(x) for x in results[4]]
    np.testing.assert_allclose(c1, c4, atol=1e-5)
    np.testing.assert_allclose(s1, s4, atol=1e-5)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_allclose(e1, e4, atol=1e-5)
