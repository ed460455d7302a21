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
