"""Streaming export unit tests (falcon_tpu/export.py)."""

import io
import os

import numpy as np

from falcon_tpu.export import export_cluster_csv
from falcon_tpu.store.store import SpectrumStore


def _write_rows(store_root, rows):
    store = SpectrumStore(store_root)
    w = store.writer(batch_size=4)  # small shards, unprefixed
    w.add_many(rows)
    w.close()
    return store


def _row(ident, fn, charge=2, mz=500.0, rt=10.0):
    return {
        "identifier": ident, "filename": fn, "precursor_mz": mz,
        "precursor_charge": charge, "retention_time": rt,
        "mz": np.asarray([110.0, 220.0, 330.0, 440.0, 550.0], np.float32),
        "intensity": np.full(5, 0.447, np.float32),
    }


def test_export_multi_file_shards_and_order(tmp_path):
    # Unprefixed writer: shards interleave rows of different files, so
    # the export's per-row masking branch must separate them; global
    # order is files natural-sorted, ids natural-sorted within.
    rows = []
    for i in range(6):
        rows.append(_row(f"scan={10 - i}", str(tmp_path / "b2.mgf")))
        rows.append(_row(f"scan={20 + i}", str(tmp_path / "b10.mgf")))
    store = _write_rows(str(tmp_path / "spectra"), rows)
    store.save_charges([2])
    ds = store.dataset(2)
    labels = np.arange(ds.count_rows(), dtype=np.int64)

    out = str(tmp_path / "out.csv")
    n = export_cluster_csv(out, lambda f: f.write("# hdr\n"),
                           [(ds, labels)])
    assert n == 12
    lines = [l for l in open(out) if not l.startswith("#")]
    header, body = lines[0], lines[1:]
    assert header.startswith("filename,spectrum_id")
    fns = [l.split(",")[0] for l in body]
    ids = [l.split(",")[1] for l in body]
    # b2 before b10 (natural), each file's ids natural-sorted.
    assert fns == [str(tmp_path / "b2.mgf")] * 6 + \
        [str(tmp_path / "b10.mgf")] * 6
    assert ids[:6] == [f"scan={v}" for v in (5, 6, 7, 8, 9, 10)]
    assert ids[6:] == [f"scan={v}" for v in range(20, 26)]


def _python_csv_rows(fns, ids, charges, null_charge, mzs, rts, clusters):
    """The csv.writer reference the native formatter must match
    byte-for-byte (the export path's fallback)."""
    import csv

    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    charge_str = np.where(np.asarray(charges) == null_charge, "",
                          np.asarray(charges).astype(str))
    w.writerows(zip(fns, ids, charge_str, mzs, rts, clusters))
    return buf.getvalue().encode("utf-8")


def test_native_csv_rows_parity_adversarial():
    """Native formatter == csv.writer on quoting edge cases, unicode
    (incl. astral plane), null charge, and float specials."""
    from falcon_tpu import native

    fns = np.asarray(["plain.mzML", "with,comma.mgf", 'q"uote.mgf',
                      "new\nline", "cr\rfile", "", "üñíçødé.mzML",
                      "astral_\U0001F600.mgf"])
    ids = np.asarray(["scan=1", "id,2", 'i"3', "x", "y", "z", "idé",
                      "\U0001F600"])
    null = -(2 ** 15)
    charges = np.asarray([2, 3, null, 0, 5, 2, 3, 1], np.int64)
    mzs = np.asarray([123.456, 1e16, 9999999999999998.0, 1e-4, 1e-5,
                      -0.0, 0.1, 1500.0])
    rts = np.asarray([float("nan"), float("inf"), float("-inf"), -1.0,
                      5400.0, 0.0, 2.5, 60.0])
    cls = np.asarray([0, -1, 99999999, 5, 6, 7,
                      -9223372036854775808, 12], np.int64)
    got = native.csv_rows(fns, ids, charges, null, mzs, rts, cls)
    if got is None:  # no native library in this environment
        return
    assert got == _python_csv_rows(fns, ids, charges, null, mzs, rts,
                                   cls)


def test_native_csv_rows_float_repr_fuzz():
    """str(np.float32) / str(float) parity across full-range bit
    patterns — the store keeps f32 columns, so the native formatter
    must reproduce BOTH numpy's value-threshold notation switch and
    CPython's decimal-point rule."""
    from falcon_tpu import native

    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2 ** 32, 30_000, dtype=np.uint32)
    f32 = bits.view(np.float32)
    f32 = f32[np.isfinite(f32)]
    f32 = np.concatenate([
        f32, rng.uniform(101.0, 1500.0, 5000).astype(np.float32),
        np.asarray([0.0, -0.0, 1e-45, -1e-45, 3.4028235e38,
                    1.1754944e-38, 1e-4, 1e16, 9.99999e15, 123.456,
                    -1.0], np.float32),
    ])
    n = len(f32)
    one = np.full(n, "f", dtype="U1")
    zeros = np.zeros(n, np.int64)
    got = native.csv_rows(one, one, zeros, -1, f32,
                          f32.astype(np.float64), zeros)
    if got is None:
        return
    for v, line in zip(f32, got.decode().split("\n")[:-1]):
        fields = line.split(",")
        assert fields[3] == str(v)              # float32 repr
        assert fields[4] == str(float(v))       # widened float64 repr


def test_export_native_vs_fallback_identical(tmp_path, monkeypatch):
    """The whole export file is byte-identical with the native formatter
    active vs forced off (csv.writer fallback)."""
    import falcon_tpu.export as export_mod
    from falcon_tpu import native

    rows = []
    for i in range(9):
        rows.append(_row(f"scan={9 - i}", str(tmp_path / "a,1.mgf"),
                         charge=(None if i % 4 == 0 else 2),
                         mz=100.0 + i * 0.37, rt=float(i) * 1.5))
    store = _write_rows(str(tmp_path / "sp3"), rows)
    store.save_charges([None, 2])
    entries = [(store.dataset(c),
                np.arange(store.dataset(c).count_rows(), dtype=np.int64))
               for c in (None, 2)]

    out_native = str(tmp_path / "native.csv")
    export_cluster_csv(out_native, lambda f: f.write("# hdr\n"), entries)
    monkeypatch.setattr(export_mod.native_lib, "csv_rows",
                        lambda *a, **k: None)
    out_py = str(tmp_path / "fallback.csv")
    export_cluster_csv(out_py, lambda f: f.write("# hdr\n"), entries)
    with open(out_native, "rb") as fa, open(out_py, "rb") as fb:
        assert fa.read() == fb.read()


def test_export_chunked_rows_identical(tmp_path, monkeypatch):
    """A tiny _CSV_CHUNK_ROWS (forcing many native-formatter calls per
    tie-group) must produce a byte-identical file: the chunking that
    bounds transient memory is not allowed to move or split rows."""
    import falcon_tpu.export as export_mod

    rows = [_row(f"scan={i}", str(tmp_path / "a.mgf"), mz=100.0 + i)
            for i in range(23)]
    store = _write_rows(str(tmp_path / "sp4"), rows)
    store.save_charges([2])
    ds = store.dataset(2)
    entries = [(ds, np.arange(ds.count_rows(), dtype=np.int64))]

    out_whole = str(tmp_path / "whole.csv")
    export_cluster_csv(out_whole, lambda f: None, entries)
    monkeypatch.setattr(export_mod, "_CSV_CHUNK_ROWS", 5)
    out_chunked = str(tmp_path / "chunked.csv")
    export_cluster_csv(out_chunked, lambda f: None, entries)
    with open(out_whole, "rb") as fa, open(out_chunked, "rb") as fb:
        assert fa.read() == fb.read()


def test_export_null_charge_empty_field(tmp_path):
    rows = [_row("s1", str(tmp_path / "a.mgf"), charge=None),
            _row("s2", str(tmp_path / "a.mgf"), charge=3)]
    store = _write_rows(str(tmp_path / "sp2"), rows)
    store.save_charges([None, 3])
    entries = []
    for c in (None, 3):
        ds = store.dataset(c)
        entries.append((ds, np.zeros(ds.count_rows(), np.int64)))
    out = str(tmp_path / "out2.csv")
    export_cluster_csv(out, lambda f: None, entries)
    body = [l for l in open(out) if not l.startswith("#")][1:]
    by_id = {l.split(",")[1]: l.split(",")[2] for l in body}
    assert by_id["s1"] == ""      # None charge -> empty field
    assert by_id["s2"] == "3"


def test_export_kernels_threaded_identical(monkeypatch):
    """FALCON_TPU_EXPORT_THREADS > 1 must produce byte/ordering-identical
    results: chunks are stably merged (natsort) and concatenated in row
    order (CSV).  Corpus exceeds the native 2^16-row serial-fallback
    threshold so the threaded code path genuinely runs."""
    from falcon_tpu import native

    if native.get_lib() is None:
        return
    rng = np.random.default_rng(13)
    n = 70_000
    ids = np.asarray(["scan=%d" % i
                      for i in rng.integers(1, 10_000_000, n)])
    fns = np.asarray(["f_%02d.mzML" % (i % 9) for i in range(n)])
    ch = rng.integers(2, 4, n).astype(np.int64)
    ch[::13] = -(2 ** 15)
    mz = rng.uniform(101, 1500, n).astype(np.float32)
    rt = rng.uniform(0, 5400, n).astype(np.float32)
    cl = rng.integers(-1, 10 ** 6, n).astype(np.int64)
    empty = np.zeros(n, dtype="U1")

    monkeypatch.setenv("FALCON_TPU_EXPORT_THREADS", "5")
    buf_t = native.csv_rows(fns, ids, ch, -(2 ** 15), mz, rt, cl)
    order_t = native.natsort_pairs(ids, empty)
    monkeypatch.setenv("FALCON_TPU_EXPORT_THREADS", "1")
    buf_s = native.csv_rows(fns, ids, ch, -(2 ** 15), mz, rt, cl)
    order_s = native.natsort_pairs(ids, empty)
    assert buf_t == buf_s
    assert np.array_equal(order_t, order_s)
