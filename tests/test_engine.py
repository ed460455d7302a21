import numpy as np
import pytest

import reference_impl
from falcon_tpu.cluster import engine
from falcon_tpu.cluster.intervals import cut_1d, precursor_mz_splits
from falcon_tpu.preprocess import process_spectrum
from falcon_tpu.simulate import make_clustered_spectra
from falcon_tpu.store.store import SpectrumStore


def _partition_equal(a, b):
    """Two label arrays describe the same partition."""
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        return False
    pair_map = {}
    for x, y in zip(a, b):
        if pair_map.setdefault(x, y) != y:
            return False
    pair_map = {}
    for x, y in zip(b, a):
        if pair_map.setdefault(x, y) != y:
            return False
    return True


def test_precursor_mz_splits_vs_reference():
    rng = np.random.default_rng(0)
    mzs = np.sort(rng.uniform(400, 1200, 3000))
    for tol, mode, batch in ((20, "ppm", 100), (0.5, "Da", 64),
                             (20, "ppm", 2**15)):
        ours = precursor_mz_splits(mzs, tol, mode, batch)
        ref = reference_impl.get_precursor_mz_splits(mzs, tol, mode, batch)
        # The reference never chunks the trailing block (documented quirk);
        # compare everything up to its last gap-boundary.
        ref = np.asarray(ref)
        common = min(len(ours), len(ref)) - 1
        np.testing.assert_array_equal(ours[:common], ref[:common])
        assert ours[-1] == ref[-1] == len(mzs)
        # Every interval respects the batch size.
        assert (np.diff(ours) <= batch).all()


def test_cut_1d_matches_reference_linkage_fcluster():
    import scipy.cluster.hierarchy as sch

    rng = np.random.default_rng(1)
    for trial in range(30):
        k = int(rng.integers(2, 60))
        values = np.sort(rng.uniform(500, 500.5, k))
        values = rng.permutation(values)
        for tol, mode in ((0.01, None), (0.05, None), (10, "ppm"),
                          (50, "ppm")):
            ours = cut_1d(values, tol, mode)
            ref = sch.fcluster(
                reference_impl.linkage_1d(values, mode), tol, "distance"
            ) - 1
            assert _partition_equal(ours, ref), (trial, tol, mode)


@pytest.fixture(scope="module")
def dataset_fixture(tmp_path_factory):
    spectra, truth = make_clustered_spectra(
        n_clusters=15, cluster_size=5, n_noise=25, seed=11,
        charges=(2,),
    )
    rows, kept_truth = [], []
    for s, t in zip(spectra, truth):
        out = process_spectrum(s, 5, 250, 101.0, 1500.0, 1.5, 0.01, 50,
                               None)
        if out is not None:
            rows.append(out)
            kept_truth.append(t)
    store = SpectrumStore(str(tmp_path_factory.mktemp("spectra")))
    writer = store.writer(batch_size=37)
    writer.add_many(rows)
    writer.close()
    return store.dataset(2), rows, np.asarray(kept_truth)


@pytest.mark.parametrize("linkage,rt_tol", [
    ("complete", None), ("single", None), ("average", None),
    ("complete", 30.0),
])
def test_generate_clusters_matches_reference(dataset_fixture, linkage,
                                             rt_tol):
    dataset, rows, _ = dataset_fixture
    labels, medoids = engine.generate_clusters(
        dataset, linkage, 0.1, 0, 20.0, "ppm", rt_tol, 0.05, 2**15,
        max_peaks=50, backend="xla",
    )
    ref_labels, ref_medoids = reference_impl.generate_clusters(
        [r["precursor_mz"] for r in rows],
        [r["retention_time"] for r in rows],
        [r["mz"] for r in rows],
        [r["intensity"] for r in rows],
        linkage, 0.1, 0, 20.0, "ppm", rt_tol, 0.05, 2**15,
    )
    assert _partition_equal(labels, ref_labels)
    np.testing.assert_array_equal(np.sort(medoids), np.sort(ref_medoids))


def test_generate_clusters_recovers_ground_truth(dataset_fixture):
    dataset, rows, truth = dataset_fixture
    # A slightly looser threshold than the 0.1 default: the simulator's
    # intensity jitter/dropout puts some true members at cosine distance
    # ~0.2 (verified purity stays perfect).
    labels, _ = engine.generate_clusters(
        dataset, "complete", 0.2, 0, 20.0, "ppm", None, 0.05, 2**15,
        max_peaks=50, backend="xla",
    )
    # Cluster purity vs ground truth: fraction of spectra whose cluster's
    # majority truth label matches their own.
    purity_num = 0
    for lab in np.unique(labels):
        members = truth[labels == lab]
        counts = np.bincount(members)
        purity_num += counts.max()
    purity = purity_num / len(truth)
    assert purity > 0.95
    # Completeness: real clusters are mostly intact.
    from collections import Counter

    completeness_num = 0
    for t in np.unique(truth):
        members = labels[truth == t]
        completeness_num += Counter(members).most_common(1)[0][1]
    assert completeness_num / len(truth) > 0.9


def test_generate_clusters_min_matches(dataset_fixture):
    dataset, rows, _ = dataset_fixture
    # An absurd min_matched_peaks forces every spectrum into a singleton.
    labels, medoids = engine.generate_clusters(
        dataset, "complete", 0.1, 1000, 20.0, "ppm", None, 0.05, 2**15,
        max_peaks=50, backend="xla",
    )
    assert len(np.unique(labels)) == len(labels)
    assert len(medoids) == len(labels)


def test_native_linkage_rejects_non_finite_distances():
    """NaN/inf distances must raise, never corrupt memory.

    The NN-chain walk picks neighbors with ``dist < best``; a NaN (or an
    all-inf row) makes every comparison false, leaving the sentinel
    ``b = -1`` to be used as an index — found as a real segfault by an
    adversarial-input probe.  scipy's ``linkage`` enforces the same
    finiteness contract.
    """
    from falcon_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    n = 6
    base = np.linspace(0.1, 0.9, n * (n - 1) // 2)
    rng = np.random.default_rng(7)
    cases = []
    for bad in (np.nan, np.inf, -np.inf):
        one = base.copy()
        one[int(rng.integers(len(one)))] = bad
        cases.append(one)
        cases.append(np.full_like(base, bad))
    for method in ("single", "complete", "average"):
        for d in cases:
            with pytest.raises(ValueError, match="finite"):
                native.linkage(d, method)
        # Finite inputs still work after the guard.
        z = native.linkage(base.copy(), method)
        assert z.shape == (n - 1, 4)
        assert np.isfinite(z).all()


def test_native_fcluster_rejects_corrupt_linkage():
    """Out-of-range or NaN cluster ids in Z must raise, not index OOB."""
    from falcon_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    n = 5
    good = native.linkage(
        np.linspace(0.1, 0.9, n * (n - 1) // 2), "single")
    for bad_id in (np.nan, -1.0, 1e18, float(2 * n)):
        z = good.copy()
        z[0, 0] = bad_id
        with pytest.raises(ValueError, match="invalid linkage"):
            native.fcluster(z, 0.5)
    # The untouched linkage still cuts fine.
    labels = native.fcluster(good, 0.5)
    assert len(labels) == n


def test_native_connected_components_rejects_bad_endpoints():
    from falcon_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    u = np.array([0, 1, 2], np.int64)
    v = np.array([1, 2, 3], np.int64)
    labels, k = native.connected_components(u, v, 5)
    assert k == 2 and len(labels) == 5
    for bad_u, bad_v in (([0, 7], [1, 2]), ([0, -1], [1, 2]),
                         ([0, 1], [1, 5])):
        with pytest.raises(ValueError, match="endpoint"):
            native.connected_components(
                np.array(bad_u, np.int64), np.array(bad_v, np.int64), 5)
