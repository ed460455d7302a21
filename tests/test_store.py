import numpy as np
import pytest

from falcon_tpu.store.store import (
    SpectrumStore, padded_peaks, NULL_CHARGE,
)


def _rows(n, charge=2, start=0):
    rng = np.random.default_rng(start)
    rows = []
    for i in range(start, start + n):
        k = int(rng.integers(5, 20))
        mz = np.sort(rng.uniform(100, 1500, k)).astype(np.float32)
        intensity = rng.uniform(0, 1, k).astype(np.float32)
        rows.append({
            "identifier": f"spec{i}",
            "filename": "f.mgf",
            "precursor_mz": 400.0 + i,
            "precursor_charge": charge,
            "retention_time": float(i),
            "mz": mz,
            "intensity": intensity,
        })
    return rows


def test_write_read_roundtrip(tmp_path):
    store = SpectrumStore(str(tmp_path / "spectra"))
    writer = store.writer(batch_size=7)
    rows = _rows(20, charge=2) + _rows(5, charge=None, start=100)
    writer.add_many(rows)
    writer.close()

    ds2 = store.dataset(2)
    assert ds2.count_rows() == 20
    meta = ds2.read_metadata()
    assert list(meta["identifier"][:3]) == ["spec0", "spec1", "spec2"]
    np.testing.assert_allclose(
        meta["precursor_mz"], 400.0 + np.arange(20)
    )
    offsets, mz_flat, int_flat = ds2.read_peaks()
    assert len(offsets) == 21
    np.testing.assert_allclose(
        mz_flat[offsets[3]:offsets[4]], rows[3]["mz"]
    )

    dsn = store.dataset(None)
    assert dsn.count_rows() == 5
    assert dsn.read_metadata()["precursor_charge"][0] == NULL_CHARGE


def test_take_random_access(tmp_path):
    store = SpectrumStore(str(tmp_path / "spectra"))
    writer = store.writer(batch_size=6)  # multiple shards
    rows = _rows(17)
    writer.add_many(rows)
    writer.close()
    ds = store.dataset(2)
    out = ds.take([13, 2, 8])
    assert [r["identifier"] for r in out] == ["spec13", "spec2", "spec8"]
    np.testing.assert_allclose(out[1]["mz"], rows[2]["mz"])
    assert out[0]["precursor_charge"] == 2


def test_charges_cache_roundtrip(tmp_path):
    store = SpectrumStore(str(tmp_path / "spectra"))
    assert store.load_charges() is None
    store.save_charges([2, 3, None])
    assert store.load_charges() == [2, 3, None]


def test_padded_peaks():
    offsets = np.array([0, 3, 5, 6], np.int64)
    mz_flat = np.array([100, 200, 300, 150, 250, 400], np.float32)
    int_flat = np.array([1, 2, 3, 4, 5, 6], np.float32)
    mz, intensity, lengths = padded_peaks(offsets, mz_flat, int_flat, 4)
    assert mz.shape == (3, 4)
    np.testing.assert_array_equal(lengths, [3, 2, 1])
    np.testing.assert_allclose(mz[0], [100, 200, 300, -1e6])
    np.testing.assert_allclose(intensity[1], [4, 5, 0, 0])
    # Row subsetting.
    mz, intensity, lengths = padded_peaks(
        offsets, mz_flat, int_flat, 4, row_indices=np.array([2, 0])
    )
    np.testing.assert_allclose(mz[0, :1], [400])
    np.testing.assert_array_equal(lengths, [1, 3])


def test_read_metadata_column_projection(tmp_path):
    from falcon_tpu.store.store import SpectrumStore

    store = SpectrumStore(str(tmp_path / "spectra"))
    w = store.writer()
    w.add({
        "identifier": "s1", "filename": "f.mgf", "precursor_mz": 500.0,
        "precursor_charge": 2, "retention_time": 12.5,
        "mz": np.asarray([110.0, 220.0, 330.0, 440.0, 550.0], np.float32),
        "intensity": np.full(5, 0.447, np.float32),
    })
    w.close()
    ds = store.dataset(2)
    meta = ds.read_metadata(columns=("precursor_mz", "retention_time"))
    assert set(meta) == {"precursor_mz", "retention_time"}
    np.testing.assert_allclose(meta["precursor_mz"], [500.0])
    full = ds.read_metadata()
    assert set(full) == {"identifier", "filename", "precursor_mz",
                         "precursor_charge", "retention_time"}


def test_take_out_of_range_raises_index_error(tmp_path):
    store = SpectrumStore(str(tmp_path / "s"))
    w = store.writer()
    w.add_many([
        dict(identifier=f"s{i}", precursor_mz=500.0 + i,
             precursor_charge=2, retention_time=float(i),
             mz=np.float32([150, 400, 700, 900, 1100]),
             intensity=np.float32([.1, .2, .3, .4, .5]),
             filename="f.mgf")
        for i in range(4)
    ])
    w.close()
    ds = store.dataset(2)
    assert len(ds.take([3])) == 1
    with pytest.raises(IndexError, match="out of range"):
        ds.take([ds.count_rows()])


def test_load_charges_non_list_json_is_unreadable(tmp_path):
    # A cache that is valid JSON but not a list (e.g. a bare scalar
    # from a torn write) is the same situation as undecodable bytes:
    # the commit record cannot be trusted -> None, never a TypeError.
    store = SpectrumStore(str(tmp_path / "spectra"))
    with open(store.charges_path, "w") as f:
        f.write("42")
    assert store.load_charges() is None


def test_validate_garbage_shard_raises_value_error(tmp_path):
    # Arbitrary garbage content must surface as the documented
    # ValueError (the CLI's drop-the-charge net), not leak a TypeError:
    # a 0-d offsets array breaks len(), a string dtype breaks np.diff.
    import os

    store = SpectrumStore(str(tmp_path / "spectra"))
    writer = store.writer(batch_size=100)
    writer.add_many(_rows(5))
    writer.close()
    ds = store.dataset(2)
    ds.validate()  # healthy store passes
    offsets_path = os.path.join(ds.shards[0], "peak_offsets.npy")
    np.save(offsets_path, np.float64(3.0))  # 0-d scalar array
    with pytest.raises(ValueError):
        ds.validate()
    np.save(offsets_path, np.array(["a", "b"]))  # non-numeric dtype
    with pytest.raises(ValueError):
        ds.validate()
