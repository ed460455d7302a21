"""Parity tests: the native C++ MGF ingest fast path vs the Python path.

``native/falcon_ingest.cc`` must reproduce, bit-for-bit in structure and
to float tolerance in values, the composition of the first-party Python
MGF parser (``ms_io/mgf_io.py``) and preprocessing chain
(``preprocess/spectrum.py``) — which in turn mirror the reference
(``falcon/ms_io/mgf_io.py``, ``falcon/cluster/spectrum.py:73-169``).
"""

import os

import numpy as np
import pytest

from falcon_tpu import ingest, native
from falcon_tpu.ms_io import ms_io
from falcon_tpu.preprocess import spectrum as prep
from falcon_tpu.simulate import make_clustered_spectra, write_mgf
from falcon_tpu.store.store import NULL_CHARGE, SpectrumStore

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)

DEFAULTS = dict(
    min_peaks=5,
    min_mz_range=250.0,
    mz_min=101.0,
    mz_max=1500.0,
    remove_precursor_tolerance=1.5,
    min_intensity=0.01,
    max_peaks_used=50,
    scaling=None,
)


def python_reference(path, kwargs):
    """The Python parse+preprocess path (the oracle)."""
    out, lqc = [], 0
    for spec in ms_io.get_spectra(path):
        processed = prep.process_spectrum(spec, **kwargs)
        if processed is None:
            lqc += 1
        else:
            out.append(processed)
    return out, lqc


def assert_batch_matches(batch, expected, lqc):
    assert batch is not None
    assert batch["n_low_quality"] == lqc
    n = len(expected)
    assert len(batch["precursor_mz"]) == n
    offsets = batch["peak_offsets"]
    for i, ref in enumerate(expected):
        assert batch["identifier"][i] == ref["identifier"]
        assert batch["precursor_mz"][i] == pytest.approx(
            ref["precursor_mz"]
        )
        charge = batch["precursor_charge"][i]
        if ref["precursor_charge"] is None:
            assert charge == -(2**31)
        else:
            assert charge == ref["precursor_charge"]
        assert batch["retention_time"][i] == pytest.approx(
            ref["retention_time"]
        )
        mz = batch["mz"][offsets[i]:offsets[i + 1]]
        inten = batch["intensity"][offsets[i]:offsets[i + 1]]
        np.testing.assert_array_equal(mz, ref["mz"])
        np.testing.assert_allclose(inten, ref["intensity"], rtol=1e-6)


@pytest.mark.parametrize("scaling", [None, "root", "log", "rank"])
def test_native_matches_python_on_synthetic_mgf(tmp_path, scaling):
    spectra, _ = make_clustered_spectra(
        n_clusters=30, cluster_size=4, n_noise=80, seed=11
    )
    path = write_mgf(str(tmp_path / "in.mgf"), spectra)
    kwargs = dict(DEFAULTS, scaling=scaling)
    expected, lqc = python_reference(path, kwargs)
    batch = native.mgf_ingest(path, **kwargs)
    assert len(expected) > 50
    assert_batch_matches(batch, expected, lqc)


def test_native_matches_python_edge_cases(tmp_path):
    path = str(tmp_path / "edge.mgf")
    with open(path, "w") as f:
        f.write(
            # Normal spectrum, charge "2+", trailing-comma charge form.
            "BEGIN IONS\n"
            "TITLE=spec one\n"
            "PEPMASS=500.25 1000.0\n"
            "CHARGE=2+\n"
            "RTINSECONDS=12.5\n"
            + "".join(f"{m}.5 {i + 1}.0\n"
                      for i, m in enumerate(range(150, 950, 80)))
            + "END IONS\n"
            # No charge, no RT.
            "BEGIN IONS\n"
            "TITLE=no charge\n"
            "PEPMASS=410.0\n"
            + "".join(f"{m}.25 {(i % 5) + 1}\n"
                      for i, m in enumerate(range(120, 920, 60)))
            + "END IONS\n"
            # Negative charge "3-"; a 1-token line is skipped without
            # invalidating the spectrum.
            "BEGIN IONS\n"
            "TITLE=neg charge\n"
            "CHARGE=3-\n"
            "PEPMASS=610.0\n"
            "210.0\n"
            + "".join(f"{m}.125 {i + 2}\n"
                      for i, m in enumerate(range(140, 1000, 70)))
            + "END IONS\n"
            # Unparseable 2-token peak line -> whole spectrum skipped
            # (pyteomics-raise semantics, reference mgf_io.py:27-30).
            "BEGIN IONS\n"
            "TITLE=bad peak line\n"
            "PEPMASS=620.0\n"
            "200.0 notanumber\n"
            + "".join(f"{m}.125 {i + 2}\n"
                      for i, m in enumerate(range(140, 1000, 70)))
            + "END IONS\n"
            # Missing TITLE -> skipped silently.
            "BEGIN IONS\n"
            "PEPMASS=777.0\n"
            "300.0 1.0\n"
            "END IONS\n"
            # Missing PEPMASS -> skipped silently.
            "BEGIN IONS\n"
            "TITLE=nopepmass\n"
            "300.0 1.0\n"
            "END IONS\n"
            # Unparseable PEPMASS -> skipped silently.
            "BEGIN IONS\n"
            "TITLE=badpepmass\n"
            "PEPMASS=xyz\n"
            "300.0 1.0\n"
            "END IONS\n"
            # Too few peaks -> rejected as low quality.
            "BEGIN IONS\n"
            "TITLE=tiny\n"
            "PEPMASS=400.0\n"
            "CHARGE=2\n"
            "150.0 1.0\n"
            "900.0 1.0\n"
            "END IONS\n"
            # Duplicate key: later value wins (dict semantics).
            "BEGIN IONS\n"
            "TITLE=first title\n"
            "TITLE=second title\n"
            "PEPMASS=505.0\n"
            "CHARGE=2\n"
            + "".join(f"{m}.75 {10 - (i % 7)}\n"
                      for i, m in enumerate(range(130, 930, 65)))
            + "END IONS\n"
        )
    expected, lqc = python_reference(path, DEFAULTS)
    batch = native.mgf_ingest(path, **DEFAULTS)
    # Sanity on the fixture itself: the oracle must keep the real spectra
    # and reject only 'tiny'.
    names = [r["identifier"] for r in expected]
    assert names == ["spec one", "no charge", "neg charge", "second title"]
    assert expected[1]["precursor_charge"] is None
    assert expected[2]["precursor_charge"] == -3
    assert lqc == 1
    assert_batch_matches(batch, expected, lqc)


def test_native_intensity_tie_breaking(tmp_path):
    # max_peaks_used cuts through a run of tied intensities; both paths
    # must keep the same peaks (stable-sort position tie-breaking).
    path = str(tmp_path / "ties.mgf")
    with open(path, "w") as f:
        f.write("BEGIN IONS\nTITLE=t\nPEPMASS=600.0\nCHARGE=2\n")
        for i, m in enumerate(range(110, 1400, 10)):
            f.write(f"{m}.0 {1.0 if i % 3 else 5.0}\n")
        f.write("END IONS\n")
    kwargs = dict(DEFAULTS, max_peaks_used=20)
    expected, lqc = python_reference(path, kwargs)
    batch = native.mgf_ingest(path, **kwargs)
    assert_batch_matches(batch, expected, lqc)


@pytest.mark.parametrize("n_peaks,cap", [(20, 20), (19, 20), (21, 20)])
def test_native_intensity_filter_at_cap_boundary(tmp_path, n_peaks, cap):
    # Straddle the sort-free fast branch (n <= max_peaks_used) and the
    # stable-sort branch (n > max_peaks_used), with intensities sitting
    # EXACTLY on the min_intensity * base threshold (strictly-greater
    # keeps; ties at the threshold drop) — both paths must agree with
    # the Python reference.
    path = str(tmp_path / f"cap_{n_peaks}.mgf")
    with open(path, "w") as f:
        f.write("BEGIN IONS\nTITLE=t\nPEPMASS=600.0\nCHARGE=2\n")
        for i in range(n_peaks):
            m = 110.0 + 12.0 * i
            # base 5.0; several exactly at threshold 0.2*5.0 = 1.0
            inten = 5.0 if i == 0 else (1.0 if i % 3 == 0 else 2.5)
            f.write(f"{m} {inten}\n")
        f.write("END IONS\n")
    kwargs = dict(DEFAULTS, max_peaks_used=cap, min_intensity=0.2)
    expected, lqc = python_reference(path, kwargs)
    batch = native.mgf_ingest(path, **kwargs)
    assert_batch_matches(batch, expected, lqc)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_mgf_random_formatting_matches_python(tmp_path, seed):
    """Randomized legal-but-weird MGF formatting (CRLF, comments,
    scientific notation, charge styles, tabs, extra tokens, blank
    lines, missing params) parses identically on both paths — the MGF
    counterpart of the mzML/mzXML randomized-formatting parity tests."""
    rng = np.random.default_rng(1000 + seed)

    def eol():
        return "\r\n" if rng.random() < 0.4 else "\n"

    def num(v):
        style = rng.integers(0, 4)
        if style == 0:
            return f"{v:.4f}"
        if style == 1:
            return f"{v:.6e}"
        if style == 2:
            return f"+{v:.3f}"
        return repr(float(v))

    lines = []
    if rng.random() < 0.7:  # file-header params + comments
        lines.append("# generated file" + eol())
        lines.append("CHARGE=2+" + eol())
        lines.append("COM=header comment" + eol())
    for s in range(12):
        if rng.random() < 0.3:
            lines.append(rng.choice(["#", ";", "!", "/"]) + " noise"
                         + eol())
        if rng.random() < 0.3:
            lines.append(eol())  # blank line
        lines.append("BEGIN IONS" + eol())
        if rng.random() < 0.9:
            lines.append(f"TITLE=spec {s} with spaces" + eol())
        pep = 400.0 + 50.0 * s
        second = " 1234.5" if rng.random() < 0.3 else ""
        lines.append(f"PEPMASS={num(pep)}{second}" + eol())
        style = rng.integers(0, 5)
        if style == 0:
            lines.append("CHARGE=2+" + eol())
        elif style == 1:
            lines.append("CHARGE=3-" + eol())
        elif style == 2:
            lines.append("CHARGE=2" + eol())
        elif style == 3:
            lines.append("CHARGE=2+," + eol())
        # style 4: no CHARGE line (header default may apply)
        if rng.random() < 0.5:
            lines.append(f"RTINSECONDS={num(rng.random() * 100)}" + eol())
        n_peaks = int(rng.integers(6, 30))
        mzs = np.sort(rng.uniform(110.0, 1450.0, n_peaks))
        for m in mzs:
            sep = rng.choice([" ", "\t", "   "])
            extra = " 1" if rng.random() < 0.2 else ""
            lines.append(f"{num(m)}{sep}{num(rng.random())}{extra}"
                         + eol())
        lines.append("END IONS" + eol())
    path = str(tmp_path / "random.mgf")
    with open(path, "w", newline="") as f:
        f.write("".join(lines))

    expected, lqc = python_reference(path, DEFAULTS)
    assert expected, "generator should produce some surviving spectra"
    batch = native.mgf_ingest(path, **DEFAULTS)
    assert_batch_matches(batch, expected, lqc)


def test_read_and_process_file_prefers_native(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=10, cluster_size=3, n_noise=20, seed=3
    )
    path = write_mgf(str(tmp_path / "in.mgf"), spectra)
    result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert isinstance(result, dict)  # columnar batch
    assert (result["filename"] == os.path.abspath(path)).all()
    ref, ref_lqc = ingest.read_and_process_file(
        path, DEFAULTS, allow_native=False
    )
    assert isinstance(ref, list)
    assert lqc == ref_lqc
    assert len(result["precursor_mz"]) == len(ref)


def test_store_round_trip_batch_vs_rows(tmp_path):
    """add_batch and add produce identical datasets."""
    spectra, _ = make_clustered_spectra(
        n_clusters=15, cluster_size=3, n_noise=30, seed=5
    )
    path = write_mgf(str(tmp_path / "in.mgf"), spectra)
    batch, _ = ingest.read_and_process_file(path, DEFAULTS)
    rows, _ = ingest.read_and_process_file(path, DEFAULTS,
                                           allow_native=False)
    for r in rows:
        r["filename"] = os.path.abspath(path)

    store_a = SpectrumStore(str(tmp_path / "a"))
    writer = store_a.writer(batch_size=40)  # force multiple shards
    writer.add_batch(batch)
    writer.close()
    store_b = SpectrumStore(str(tmp_path / "b"))
    writer = store_b.writer(batch_size=40)
    for r in rows:
        writer.add(r)
    writer.close()

    charges = sorted(
        {None if c == NULL_CHARGE else int(c)
         for c in batch["precursor_charge"]
         if c != -(2**31)}
    )
    assert charges  # fixture must produce charged spectra
    for charge in charges:
        ds_a, ds_b = store_a.dataset(charge), store_b.dataset(charge)
        meta_a, meta_b = ds_a.read_metadata(), ds_b.read_metadata()
        # add_batch partitions per charge in batch order; add preserves
        # input order per charge — same multiset, same order.
        np.testing.assert_array_equal(
            meta_a["identifier"], meta_b["identifier"]
        )
        np.testing.assert_array_equal(
            meta_a["precursor_mz"], meta_b["precursor_mz"]
        )
        off_a, mz_a, int_a = ds_a.read_peaks()
        off_b, mz_b, int_b = ds_b.read_peaks()
        np.testing.assert_array_equal(off_a, off_b)
        np.testing.assert_array_equal(mz_a, mz_b)
        np.testing.assert_allclose(int_a, int_b, rtol=1e-6)


def _write_mzml(path, spectra, zlib_mz=True, f64_mz=True,
                rt_unit="second", truncate=False):
    """Minimal mzML writer for parity tests (same element structure the
    native scanner and the Python reader both consume)."""
    import base64
    import zlib as zlib_mod

    def b64(arr, dtype, compress):
        raw = np.asarray(arr, dtype).tobytes()
        if compress:
            raw = zlib_mod.compress(raw)
        return base64.b64encode(raw).decode()

    chunks = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">',
        '<run id="r"><spectrumList count="%d">' % len(spectra),
    ]
    for i, s in enumerate(spectra):
        mz64 = b64(s.mz, np.float64 if f64_mz else np.float32, zlib_mz)
        in64 = b64(s.intensity, np.float32, zlib_mz)
        comp = ('<cvParam accession="MS:1000574" name="zlib compression"/>'
                if zlib_mz else
                '<cvParam accession="MS:1000576" name="no compression"/>')
        charge = (
            f'<cvParam accession="MS:1000041" name="charge state" '
            f'value="{s.precursor_charge}"/>'
            if s.precursor_charge is not None else ""
        )
        rt = (s.retention_time / 60.0 if rt_unit == "minute"
              else s.retention_time)
        mz_prec = "MS:1000523" if f64_mz else "MS:1000521"
        chunks.append(f'''<spectrum index="{i}" id="scan={i}" defaultArrayLength="{len(s.mz)}">
<cvParam accession="MS:1000511" name="ms level" value="2"/>
<scanList count="1"><scan><cvParam accession="MS:1000016" name="scan start time" value="{rt}" unitName="{rt_unit}"/></scan></scanList>
<precursorList count="1"><precursor><selectedIonList count="1"><selectedIon>
<cvParam accession="MS:1000744" name="selected ion m/z" value="{s.precursor_mz!r}"/>
{charge}
</selectedIon></selectedIonList></precursor></precursorList>
<binaryDataArrayList count="2"><binaryDataArray><cvParam accession="{mz_prec}" name="float"/>{comp}<cvParam accession="MS:1000514" name="m/z array"/><binary>{mz64}</binary></binaryDataArray>
<binaryDataArray><cvParam accession="MS:1000521" name="32-bit float"/>{comp}<cvParam accession="MS:1000515" name="intensity array"/><binary>{in64}</binary></binaryDataArray></binaryDataArrayList>
</spectrum>''')
    chunks.append("</spectrumList></run></mzML>")
    doc = "\n".join(chunks)
    if truncate:
        doc = doc[: doc.rfind("<spectrum ") + 200]
    with open(path, "w") as f:
        f.write(doc)
    return path


@pytest.mark.parametrize("zlib_mz,f64_mz,rt_unit", [
    (True, True, "second"),
    (False, False, "minute"),
])
def test_native_mzml_matches_python(tmp_path, zlib_mz, f64_mz, rt_unit):
    spectra, _ = make_clustered_spectra(
        n_clusters=20, cluster_size=4, n_noise=40, seed=9
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra,
                       zlib_mz=zlib_mz, f64_mz=f64_mz, rt_unit=rt_unit)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)
    assert not batch["truncated"]


def test_native_mzml_whitespace_after_tag_name(tmp_path):
    # A valid mzML may break the line right after the tag name
    # ("<spectrum\n  index=..."); the streaming scanner must still find
    # the block (advisor round-2 medium finding).
    spectra, _ = make_clustered_spectra(
        n_clusters=6, cluster_size=3, n_noise=10, seed=11
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra)
    doc = open(path).read()
    doc = doc.replace("<spectrum index=", "<spectrum\n  index=")
    open(path, "w").write(doc)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)
    assert not batch["truncated"]


def test_ingest_falls_back_when_native_sees_no_spectra(tmp_path, caplog,
                                                       monkeypatch):
    # If the native scanner parses a non-empty file to zero spectra read
    # (not truncated), ingest must warn and use the Python reader rather
    # than silently dropping the file.
    spectra, _ = make_clustered_spectra(
        n_clusters=4, cluster_size=3, n_noise=5, seed=12
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra)

    import falcon_tpu.native as native_mod

    def empty_ingest(filename, **kwargs):
        return {"precursor_mz": np.zeros(0), "n_read": 0,
                "n_low_quality": 0, "truncated": False}

    monkeypatch.setattr(native_mod, "mzml_ingest", empty_ingest)
    with caplog.at_level("WARNING", logger="falcon_tpu"):
        result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert any("falling back to the Python reader" in r.message
               for r in caplog.records)
    ref, ref_lqc = ingest.read_and_process_file(
        path, DEFAULTS, allow_native=False
    )
    assert isinstance(result, list) and len(result) == len(ref)
    assert lqc == ref_lqc


def test_native_mzml_skips_ms1_and_incomplete(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=4, cluster_size=3, n_noise=5, seed=2
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra)
    doc = open(path).read()
    # Make one spectrum MS1 and strip another's precursor block.
    doc = doc.replace('name="ms level" value="2"',
                      'name="ms level" value="1"', 1)
    i = doc.find("<precursorList", doc.find("<precursorList") + 1)
    j = doc.find("</precursorList>", i) + len("</precursorList>")
    doc = doc[:i] + doc[j:]
    open(path, "w").write(doc)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)


def test_native_mzml_truncated_flag(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=4, cluster_size=3, n_noise=0, seed=4
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra, truncate=True)
    batch = native.mzml_ingest(path, **DEFAULTS)
    assert batch is not None
    assert batch["truncated"]
    # Complete blocks were still parsed.
    expected, lqc = python_reference(path, DEFAULTS)
    assert len(batch["precursor_mz"]) == len(expected)


def test_native_mzml_sorts_unsorted_peaks(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=3, cluster_size=3, n_noise=0, seed=6
    )
    # Shuffle peak order; both paths must sort by m/z before processing.
    rng = np.random.default_rng(0)
    for s in spectra:
        order = rng.permutation(len(s.mz))
        s.mz, s.intensity = s.mz[order], s.intensity[order]
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)


def test_read_and_process_file_prefers_native_mzml(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=10, cluster_size=3, n_noise=20, seed=3
    )
    path = _write_mzml(str(tmp_path / "in.mzml"), spectra)
    result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert isinstance(result, dict)
    ref, ref_lqc = ingest.read_and_process_file(
        path, DEFAULTS, allow_native=False
    )
    assert lqc == ref_lqc
    assert len(result["precursor_mz"]) == len(ref)


def _write_mzxml(path, scans, rt_fmt="PT{rt}S", nested_ms1=False):
    """Minimal mzXML writer for parity tests (network byte order, f32,
    optional zlib, optionally MS2 scans NESTED inside MS1 scans as real
    instruments emit)."""
    chunks = [
        '<?xml version="1.0" encoding="ISO-8859-1"?>',
        '<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/'
        'mzXML_3.2">',
        "<msRun>",
    ]

    def scan_xml(scan):
        pairs = np.empty(2 * len(scan["mz"]), np.float32)
        pairs[0::2] = scan["mz"]
        pairs[1::2] = scan["intensity"]
        import base64
        import zlib as zlib_mod

        raw = pairs.astype(">f4").tobytes()
        comp = "none"
        if scan.get("zlib"):
            raw = zlib_mod.compress(raw)
            comp = "zlib"
        payload = base64.b64encode(raw).decode()
        charge_attr = (
            f' precursorCharge="{scan["charge"]}"'
            if scan.get("charge") is not None else ""
        )
        rt = rt_fmt.format(rt=scan["rt"])
        return (
            f'<scan num="{scan["num"]}" msLevel="{scan["ms_level"]}" '
            f'retentionTime="{rt}" peaksCount="{len(scan["mz"])}">\n'
            f'<precursorMz{charge_attr}>{scan["precursor_mz"]}'
            '</precursorMz>\n'
            f'<peaks precision="32" byteOrder="network" '
            f'contentType="m/z-int" compressionType="{comp}">'
            f'{payload}</peaks>'
        )

    if nested_ms1:
        for i, scan in enumerate(scans):
            ms1 = dict(num=1000 + i, ms_level=1, rt=scan["rt"] - 1,
                       precursor_mz=0.0, mz=[50.0], intensity=[1.0])
            chunks.append(scan_xml(ms1).replace("</peaks>", "</peaks>\n")
                          + scan_xml(scan) + "\n</scan>\n</scan>")
    else:
        for scan in scans:
            chunks.append(scan_xml(scan) + "\n</scan>")
    chunks.append("</msRun></mzXML>")
    with open(path, "w") as f:
        f.write("\n".join(chunks))
    return path


def _spectra_to_scans(spectra, zlib=False):
    return [
        dict(num=i + 1, ms_level=2, rt=s.retention_time,
             precursor_mz=s.precursor_mz, charge=s.precursor_charge,
             mz=s.mz, intensity=s.intensity, zlib=zlib)
        for i, s in enumerate(spectra)
    ]


@pytest.mark.parametrize("zlib,rt_fmt,nested", [
    (False, "PT{rt}S", False),
    (True, "PT2M{rt}S", True),
])
def test_native_mzxml_matches_python(tmp_path, zlib, rt_fmt, nested):
    spectra, _ = make_clustered_spectra(
        n_clusters=15, cluster_size=4, n_noise=30, seed=13
    )
    path = _write_mzxml(str(tmp_path / "in.mzxml"),
                        _spectra_to_scans(spectra, zlib=zlib),
                        rt_fmt=rt_fmt, nested_ms1=nested)
    batch = native.mzxml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)
    assert not batch["truncated"]


def test_read_and_process_file_prefers_native_mzxml(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=8, cluster_size=3, n_noise=10, seed=3
    )
    path = _write_mzxml(str(tmp_path / "in.mzxml"),
                        _spectra_to_scans(spectra))
    result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert isinstance(result, dict)
    ref, ref_lqc = ingest.read_and_process_file(
        path, DEFAULTS, allow_native=False
    )
    assert lqc == ref_lqc
    assert len(result["precursor_mz"]) == len(ref)


def test_prepare_spectra_process_pool_matches_serial(tmp_path):
    """The spawn-pool ingest path (multi-core hosts) produces the same
    store contents as the serial path (this CI box has 1 CPU, so the
    pool path needs explicit max_workers)."""
    from falcon_tpu.ingest import prepare_spectra

    paths = []
    for i in range(3):
        spectra, _ = make_clustered_spectra(
            n_clusters=5, cluster_size=3, n_noise=8, seed=60 + i
        )
        paths.append(write_mgf(str(tmp_path / f"in{i}.mgf"), spectra))

    store_a = SpectrumStore(str(tmp_path / "serial"))
    charges_a = prepare_spectra(store_a, paths, DEFAULTS, max_workers=1)
    store_b = SpectrumStore(str(tmp_path / "pool"))
    charges_b = prepare_spectra(store_b, paths, DEFAULTS, max_workers=2)
    assert charges_a == charges_b
    for charge in charges_a:
        da, db = store_a.dataset(charge), store_b.dataset(charge)
        assert da.count_rows() == db.count_rows()
        ma, mb = da.read_metadata(), db.read_metadata()
        # Row order can differ across workers; compare as sets.
        assert sorted(ma["identifier"].tolist()) == \
            sorted(mb["identifier"].tolist())
        np.testing.assert_allclose(
            sorted(ma["precursor_mz"]), sorted(mb["precursor_mz"])
        )


def test_mgf_range_parse_concatenates_to_whole_file(tmp_path):
    """Byte-range parses (ownership by BEGIN IONS line offset) must
    concatenate to the whole-file parse for ANY split points, including
    boundaries landing inside a BEGIN IONS line."""
    spectra, _ = make_clustered_spectra(
        n_clusters=30, cluster_size=4, n_noise=60, seed=77
    )
    path = write_mgf(str(tmp_path / "range.mgf"), spectra)
    size = os.path.getsize(path)
    full = native.mgf_ingest(path, **DEFAULTS)
    assert full is not None and len(full["precursor_mz"]) > 0

    def concat(parts):
        return {
            "precursor_mz": np.concatenate(
                [p["precursor_mz"] for p in parts]),
            "identifier": np.concatenate([p["identifier"] for p in parts]),
            "mz": np.concatenate([p["mz"] for p in parts]),
            "n_read": sum(p["n_read"] for p in parts),
            "n_low_quality": sum(p["n_low_quality"] for p in parts),
        }

    with open(path, "rb") as f:
        data = f.read()
    mid_begin = data.index(b"BEGIN IONS", size // 2)
    boundary_sets = [
        [0, size // 3, 2 * size // 3, size],        # arbitrary thirds
        [0, mid_begin, size],                       # exactly at BEGIN
        [0, mid_begin + 4, size],                   # inside BEGIN IONS
        [0, size // 7, size // 3, size // 2, size]  # uneven
    ]
    for bounds in boundary_sets:
        parts = [
            native.mgf_ingest(path, start=bounds[i], end=bounds[i + 1],
                              **DEFAULTS)
            for i in range(len(bounds) - 1)
        ]
        assert all(p is not None for p in parts)
        cat = concat(parts)
        np.testing.assert_array_equal(
            cat["precursor_mz"], full["precursor_mz"])
        np.testing.assert_array_equal(cat["identifier"],
                                      full["identifier"])
        np.testing.assert_array_equal(cat["mz"], full["mz"])
        assert cat["n_read"] == full["n_read"]
        assert cat["n_low_quality"] == full["n_low_quality"]
    # A range past EOF yields a well-formed empty batch, not a failure.
    tail = native.mgf_ingest(path, start=size + 10, end=None, **DEFAULTS)
    assert tail is not None and len(tail["precursor_mz"]) == 0


def test_ingest_range_budget_store_parity(tmp_path, monkeypatch):
    """``ingest_file_to_store`` with a multi-range budget writes the
    SAME rows in the SAME order as the serial single-range path (the
    multi-core single-big-file layout; this CI box has 1 CPU so the
    budget is forced)."""
    spectra, _ = make_clustered_spectra(
        n_clusters=20, cluster_size=4, n_noise=40, seed=88
    )
    path = write_mgf(str(tmp_path / "big.mgf"), spectra)
    monkeypatch.setattr(ingest, "_RANGE_MIN_BYTES", 1)
    monkeypatch.setattr(ingest, "_RANGE_TARGET_BYTES", 1)

    store_a = SpectrumStore(str(tmp_path / "serial"))
    res_a = ingest.ingest_file_to_store(path, 0, store_a.root, DEFAULTS,
                                        range_budget=1)
    store_b = SpectrumStore(str(tmp_path / "ranged"))
    res_b = ingest.ingest_file_to_store(path, 0, store_b.root, DEFAULTS,
                                        range_budget=4)
    assert res_a == res_b
    for key in res_a[0]:
        charge = None if key == "None" else int(key)
        da, db = store_a.dataset(charge), store_b.dataset(charge)
        ma, mb = da.read_metadata(), db.read_metadata()
        # Exact ORDER parity: ranged shards concatenate in file order.
        assert ma["identifier"].tolist() == mb["identifier"].tolist()
        np.testing.assert_array_equal(ma["precursor_mz"],
                                      mb["precursor_mz"])
        oa, za, ia = da.read_peaks()
        ob, zb, ib = db.read_peaks()
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(za, zb)
        np.testing.assert_array_equal(ia, ib)


def _assert_range_concat_matches(path, ingest_fn, tag: bytes):
    """Shared assertion: per-range parses concatenate to the whole-file
    parse for arbitrary split points, including boundaries landing at
    and inside an open tag."""
    size = os.path.getsize(path)
    full = ingest_fn(path, **DEFAULTS)
    assert full is not None and len(full["precursor_mz"]) > 0

    with open(path, "rb") as f:
        data = f.read()
    mid_tag = data.index(tag, size // 2)
    boundary_sets = [
        [0, size // 3, 2 * size // 3, size],         # arbitrary thirds
        [0, mid_tag, size],                          # exactly at a tag
        [0, mid_tag + 3, size],                      # inside a tag
        [0, size // 7, size // 3, size // 2, size],  # uneven
    ]
    for bounds in boundary_sets:
        parts = [
            ingest_fn(path, start=bounds[i], end=bounds[i + 1],
                      **DEFAULTS)
            for i in range(len(bounds) - 1)
        ]
        assert all(p is not None for p in parts)
        np.testing.assert_array_equal(
            np.concatenate([p["precursor_mz"] for p in parts]),
            full["precursor_mz"])
        np.testing.assert_array_equal(
            np.concatenate([p["identifier"] for p in parts]),
            full["identifier"])
        np.testing.assert_array_equal(
            np.concatenate([p["mz"] for p in parts]), full["mz"])
        assert sum(p["n_read"] for p in parts) == full["n_read"]
        assert sum(p["n_low_quality"] for p in parts) == \
            full["n_low_quality"]
        assert not any(p.get("truncated") for p in parts)
    # A range past EOF yields a well-formed empty batch, not a failure.
    tail = ingest_fn(path, start=size + 10, end=None, **DEFAULTS)
    assert tail is not None and len(tail["precursor_mz"]) == 0


def test_mzml_range_parse_concatenates_to_whole_file(tmp_path):
    """mzML byte-range parses (ownership by <spectrum open-tag offset)
    must concatenate to the whole-file parse for ANY split points."""
    spectra, _ = make_clustered_spectra(
        n_clusters=25, cluster_size=4, n_noise=50, seed=91
    )
    path = _write_mzml(str(tmp_path / "range.mzml"), spectra)
    _assert_range_concat_matches(path, native.mzml_ingest, b"<spectrum ")


def test_mzxml_range_parse_concatenates_to_whole_file(tmp_path):
    """mzXML with MS2 scans NESTED inside MS1 blocks: a range may start
    inside an outer MS1 block and must still own exactly the nested
    scans whose open tags fall inside it."""
    spectra, _ = make_clustered_spectra(
        n_clusters=25, cluster_size=4, n_noise=50, seed=92
    )
    path = _write_mzxml(str(tmp_path / "range.mzxml"),
                        _spectra_to_scans(spectra), nested_ms1=True)
    _assert_range_concat_matches(path, native.mzxml_ingest, b"<scan ")


def test_mzml_range_truncation_owned_by_last_range(tmp_path):
    """Only the range owning the EOF-truncated spectrum reports
    truncated; earlier ranges parse their complete blocks cleanly."""
    spectra, _ = make_clustered_spectra(
        n_clusters=10, cluster_size=3, n_noise=10, seed=93
    )
    path = _write_mzml(str(tmp_path / "trunc.mzml"), spectra,
                       truncate=True)
    size = os.path.getsize(path)
    full = native.mzml_ingest(path, **DEFAULTS)
    assert full["truncated"]
    first = native.mzml_ingest(path, start=0, end=size // 2, **DEFAULTS)
    last = native.mzml_ingest(path, start=size // 2, end=None, **DEFAULTS)
    assert not first["truncated"] and last["truncated"]
    np.testing.assert_array_equal(
        np.concatenate([first["precursor_mz"], last["precursor_mz"]]),
        full["precursor_mz"])


@pytest.mark.parametrize("fmt", ["mzml", "mzxml"])
def test_ingest_range_budget_store_parity_xml(tmp_path, monkeypatch, fmt):
    """``ingest_file_to_store`` with a multi-range budget writes the
    SAME rows in the SAME order as the serial path for the XML formats
    too (budget forced: this CI box has 1 CPU)."""
    spectra, _ = make_clustered_spectra(
        n_clusters=15, cluster_size=4, n_noise=30, seed=94
    )
    if fmt == "mzml":
        path = _write_mzml(str(tmp_path / "big.mzml"), spectra)
    else:
        path = _write_mzxml(str(tmp_path / "big.mzxml"),
                            _spectra_to_scans(spectra), nested_ms1=True)
    monkeypatch.setattr(ingest, "_RANGE_MIN_BYTES", 1)
    monkeypatch.setattr(ingest, "_RANGE_TARGET_BYTES", 1)

    store_a = SpectrumStore(str(tmp_path / "serial"))
    res_a = ingest.ingest_file_to_store(path, 0, store_a.root, DEFAULTS,
                                        range_budget=1)
    store_b = SpectrumStore(str(tmp_path / "ranged"))
    res_b = ingest.ingest_file_to_store(path, 0, store_b.root, DEFAULTS,
                                        range_budget=4)
    assert res_a == res_b
    for key in res_a[0]:
        charge = None if key == "None" else int(key)
        da, db = store_a.dataset(charge), store_b.dataset(charge)
        ma, mb = da.read_metadata(), db.read_metadata()
        assert ma["identifier"].tolist() == mb["identifier"].tolist()
        np.testing.assert_array_equal(ma["precursor_mz"],
                                      mb["precursor_mz"])


def test_ms1_only_file_does_not_trigger_python_fallback(tmp_path, caplog):
    """A valid mzXML containing only MS1 scans legitimately yields zero
    spectra: the scanner reports the blocks it saw (n_blocks), so no
    misleading warning fires and the file is not re-parsed by the slow
    Python reader."""
    scans = [dict(num=i, ms_level=1, rt=10.0 * i, precursor_mz=0.0,
                  mz=[100.0, 200.0], intensity=[1.0, 2.0])
             for i in range(5)]
    path = _write_mzxml(str(tmp_path / "ms1.mzxml"), scans)
    batch = native.mzxml_ingest(path, **DEFAULTS)
    assert batch["n_read"] == 0 and batch["n_blocks"] == 5
    with caplog.at_level("WARNING", logger="falcon_tpu"):
        result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert not any("falling back" in r.message for r in caplog.records)
    assert isinstance(result, dict)  # native result kept, not re-parsed
    assert len(result["precursor_mz"]) == 0 and lqc == 0


# ---- randomized XML-formatting robustness -----------------------------

def _mutate_xml_formatting(doc: str, rng: np.random.Generator) -> str:
    """Seeded, semantics-preserving XML formatting mutations.

    Every transformation below yields XML that the spec-conformant
    lxml/ElementTree readers parse identically: random whitespace after
    element tag names, random spacing around attribute ``=``, single- vs
    double-quoted attribute values, interspersed comments, and CRLF line
    endings.  The native streaming scanners (``native/falcon_mzml.cc``)
    must tolerate all of them — the round-2 advisor found exactly this
    class of bug (a newline after ``<spectrum`` silently dropping every
    spectrum in the file).
    """
    import re

    head, sep, body = doc.partition("?>")  # keep the XML declaration

    # 1. Random whitespace between a tag name and its first attribute.
    ws_choices = [" ", "\n  ", "\t", "\r\n    ", "  "]

    def tag_ws(m):
        return m.group(1) + str(rng.choice(ws_choices))

    body = re.sub(
        r"(<(?:spectrum|scan|cvParam|peaks|precursorMz|binaryDataArray"
        r"|precursor|selectedIon|spectrumList))\s",
        tag_ws, body,
    )

    # 2. Random attribute spacing / quote style (XML Eq ::= S? '=' S?).
    def attr_fmt(m):
        name, value = m.group(1), m.group(2)
        style = rng.integers(0, 4)
        if style == 0:
            return f'{name}="{value}"'
        if style == 1:
            return f'{name} = "{value}"'
        if style == 2 and "'" not in value:
            return f"{name}='{value}'"
        return f'{name}\n  =  "{value}"'

    body = re.sub(r'([\w:]+)="([^"<>]*)"', attr_fmt, body)

    # 3. Benign comments between spectrum/scan blocks.
    def comment(m):
        if rng.random() < 0.5:
            return m.group(0) + "<!-- instrument annotation -->"
        return m.group(0)

    body = re.sub(r"</spectrum>|</scan>", comment, body)

    # 4. Whole-document CRLF line endings.
    if rng.random() < 0.5:
        body = body.replace("\r\n", "\n").replace("\n", "\r\n")
    return head + sep + body


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_mzml_random_formatting_matches_python(tmp_path, seed):
    spectra, _ = make_clustered_spectra(
        n_clusters=8, cluster_size=3, n_noise=12, seed=100 + seed
    )
    path = _write_mzml(str(tmp_path / "fmt.mzml"), spectra,
                       zlib_mz=bool(seed % 2), f64_mz=bool(seed % 2))
    rng = np.random.default_rng(seed)
    doc = _mutate_xml_formatting(open(path).read(), rng)
    open(path, "w", newline="").write(doc)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert len(expected) > 0
    assert_batch_matches(batch, expected, lqc)
    assert not batch["truncated"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_mzxml_random_formatting_matches_python(tmp_path, seed):
    spectra, _ = make_clustered_spectra(
        n_clusters=8, cluster_size=3, n_noise=12, seed=200 + seed
    )
    path = _write_mzxml(str(tmp_path / "fmt.mzxml"),
                        _spectra_to_scans(spectra))
    rng = np.random.default_rng(seed)
    doc = _mutate_xml_formatting(open(path).read(), rng)
    open(path, "w", newline="").write(doc)
    batch = native.mzxml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert len(expected) > 0
    assert_batch_matches(batch, expected, lqc)
    assert not batch["truncated"]


# ---- MGF file-header params + comment lines ---------------------------

def _strip_local_charges_add_header(path, header):
    """Remove CHARGE= from every other block and prepend a file header."""
    blocks = open(path).read().split("BEGIN IONS")
    rest = []
    for i, block in enumerate(blocks[1:]):
        if i % 2 == 0:
            block = "\n".join(
                ln for ln in block.splitlines()
                if not ln.upper().startswith("CHARGE=")
            ) + "\n"
        rest.append(block)
    open(path, "w").write(header + "BEGIN IONS" +
                          "BEGIN IONS".join(rest))


def test_native_mgf_header_and_comments_match_python(tmp_path):
    """File-header params (inherited, local wins) and # ; ! / comment
    lines: the native scanner must agree with the Python reader, and
    blocks without a local CHARGE must inherit the header's."""
    spectra, _ = make_clustered_spectra(
        n_clusters=10, cluster_size=3, n_noise=15, seed=31
    )
    path = write_mgf(str(tmp_path / "hdr.mgf"), spectra)
    _strip_local_charges_add_header(
        path,
        "# exporter comment\nCOM=run 1\nCHARGE=5+\n; note\n\n",
    )
    # Sprinkle comment lines inside blocks too.
    doc = open(path).read().replace("END IONS", "! trailing\nEND IONS")
    open(path, "w").write(doc)
    batch = native.mgf_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert len(expected) > 0
    assert_batch_matches(batch, expected, lqc)
    # Header charge inherited where the local CHARGE was stripped.
    assert (np.asarray(batch["precursor_charge"]) == 5).any()


def test_native_mgf_header_reaches_every_byte_range(tmp_path):
    """Byte-range workers start mid-file and must still apply the file
    header (each range re-reads the file head)."""
    spectra, _ = make_clustered_spectra(
        n_clusters=30, cluster_size=4, n_noise=40, seed=32
    )
    path = write_mgf(str(tmp_path / "hdr_range.mgf"), spectra)
    _strip_local_charges_add_header(path, "CHARGE=4+\nCOM=x\n\n")
    _assert_range_concat_matches(path, native.mgf_ingest, b"BEGIN IONS")
    full = native.mgf_ingest(path, **DEFAULTS)
    charges = np.asarray(full["precursor_charge"])
    assert (charges == 4).any() and len(np.unique(charges)) > 1


def test_native_numpress_spectra_skipped_like_python(tmp_path):
    """Spectra whose binary arrays use MS-Numpress are skipped by BOTH
    the native scanner and the Python reader (decoding the payload as
    raw floats would be silent garbage)."""
    spectra, _ = make_clustered_spectra(
        n_clusters=6, cluster_size=3, n_noise=8, seed=41
    )
    path = _write_mzml(str(tmp_path / "np.mzml"), spectra,
                       zlib_mz=False)
    doc = open(path).read()
    n_total = doc.count("<spectrum ")
    # Flip the FIRST spectrum's two compression cvParams to numpress.
    doc = doc.replace('accession="MS:1000576" name="no compression"',
                      'accession="MS:1002312" name="numpress"', 2)
    open(path, "w").write(doc)
    batch = native.mzml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)
    assert batch["n_read"] < n_total  # the numpress spectrum was dropped


def test_native_mzxml_unknown_compression_skipped_like_python(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=6, cluster_size=3, n_noise=8, seed=42
    )
    path = _write_mzxml(str(tmp_path / "np.mzxml"),
                        _spectra_to_scans(spectra))
    doc = open(path).read()
    n_total = doc.count("<scan ")
    doc = doc.replace('compressionType="none"',
                      'compressionType="numpress-linear"', 1)
    open(path, "w").write(doc)
    batch = native.mzxml_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert_batch_matches(batch, expected, lqc)
    assert batch["n_read"] < n_total


def test_native_mgf_empty_param_values_match_python(tmp_path):
    """Empty 'PEPMASS=' / 'CHARGE=' values: both parsers skip exactly
    those spectra (the Python reader must not abort the file)."""
    path = str(tmp_path / "empty_vals.mgf")
    peaks = "\n".join(f"{101.0 + 17 * i} {1.0 + i % 3}"
                      for i in range(8)) + "\n400.0 2.0\n"
    open(path, "w").write(
        "BEGIN IONS\nTITLE=bad_pepmass\nPEPMASS=\n" + peaks +
        "END IONS\n"
        "BEGIN IONS\nTITLE=bad_charge\nPEPMASS=400.0\nCHARGE=\n" +
        peaks + "END IONS\n"
        "BEGIN IONS\nTITLE=good\nPEPMASS=500.0\nCHARGE=2+\n" + peaks +
        "END IONS\n"
    )
    batch = native.mgf_ingest(path, **DEFAULTS)
    expected, lqc = python_reference(path, DEFAULTS)
    assert [s["identifier"] for s in expected] == ["good"]
    assert_batch_matches(batch, expected, lqc)


def test_fully_numpress_file_warns_not_silent(tmp_path, caplog):
    """A file where EVERY spectrum uses numpress must produce a warning
    on the native ingest path, not a silent empty result."""
    spectra, _ = make_clustered_spectra(
        n_clusters=4, cluster_size=3, n_noise=5, seed=43
    )
    path = _write_mzml(str(tmp_path / "allnp.mzml"), spectra,
                       zlib_mz=False)
    doc = open(path).read().replace(
        'accession="MS:1000576" name="no compression"',
        'accession="MS:1002312" name="numpress"')
    open(path, "w").write(doc)
    batch = native.mzml_ingest(path, **DEFAULTS)
    assert batch["n_read"] == 0
    assert batch["n_unsupported"] > 0
    with caplog.at_level("WARNING", logger="falcon_tpu"):
        result, lqc = ingest.read_and_process_file(path, DEFAULTS)
    assert isinstance(result, dict)
    assert len(result["precursor_mz"]) == 0
    assert any("unsupported binary compression" in r.message
               for r in caplog.records)


def test_gzipped_file_uses_native_path_and_records_gz_name(tmp_path):
    """A .mgf.gz input decompresses once, parses through the native fast
    path, and the store metadata records the ORIGINAL .gz path."""
    import gzip
    import shutil

    spectra, _ = make_clustered_spectra(
        n_clusters=8, cluster_size=3, n_noise=10, seed=5
    )
    plain = write_mgf(str(tmp_path / "in.mgf"), spectra)
    gz_path = str(tmp_path / "in.mgf.gz")
    with open(plain, "rb") as f_in, gzip.open(gz_path, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)

    result, lqc = ingest.read_and_process_file(gz_path, DEFAULTS)
    assert isinstance(result, dict)  # native columnar batch
    assert (result["filename"] == os.path.abspath(gz_path)).all()
    ref, ref_lqc = ingest.read_and_process_file(plain, DEFAULTS)
    assert lqc == ref_lqc
    np.testing.assert_array_equal(result["precursor_mz"],
                                  ref["precursor_mz"])
    np.testing.assert_array_equal(result["mz"], ref["mz"])
    # No temp droppings left behind.
    stray = [f for f in os.listdir(tmp_path)
             if f not in ("in.mgf", "in.mgf.gz")]
    assert not stray


def test_gzipped_range_parse_matches_whole_file(tmp_path, monkeypatch):
    """A large gzipped MGF still goes through the byte-range parallel
    path (on the decompressed temp) and records the .gz filename."""
    import gzip
    import shutil

    from falcon_tpu.store.store import SpectrumStore

    spectra, _ = make_clustered_spectra(
        n_clusters=30, cluster_size=4, n_noise=30, seed=9
    )
    plain = write_mgf(str(tmp_path / "big.mgf"), spectra)
    gz_path = str(tmp_path / "big.mgf.gz")
    with open(plain, "rb") as f_in, gzip.open(gz_path, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    monkeypatch.setattr(ingest, "_RANGE_MIN_BYTES", 1)
    monkeypatch.setattr(ingest, "_RANGE_TARGET_BYTES", 4096)

    root_a = str(tmp_path / "store_a")
    charges_a, kept_a, _ = ingest.ingest_file_to_store(
        gz_path, 0, root_a, DEFAULTS, range_budget=4
    )
    root_b = str(tmp_path / "store_b")
    charges_b, kept_b, _ = ingest.ingest_file_to_store(
        plain, 0, root_b, DEFAULTS, range_budget=1
    )
    assert charges_a == charges_b and kept_a == kept_b and kept_a > 0
    for charge in charges_a:
        key = None if charge == "None" else int(charge)
        ds_a = SpectrumStore(root_a).dataset(key)
        ds_b = SpectrumStore(root_b).dataset(key)
        meta_a, meta_b = ds_a.read_metadata(), ds_b.read_metadata()
        np.testing.assert_array_equal(meta_a["precursor_mz"],
                                      meta_b["precursor_mz"])
        assert (meta_a["filename"] == os.path.abspath(gz_path)).all()


def _random_msp(rng, n_entries=14) -> str:
    """Randomized legal-but-weird MSP content covering the dialect:
    semicolon-packed pairs, quoted annotations, Comment key=values,
    Parent=/MW fallbacks, charge styles, stray headers inside peak
    lists (whole-entry skip), entries with and without blank-line
    separators."""
    lines = []
    for s in range(n_entries):
        if rng.random() < 0.3:
            lines.append("# library comment")
        lines.append(f"Name: entry {s} spaced name")
        pep = 400.0 + 37.0 * s
        style = rng.integers(0, 5)
        if style == 0:
            lines.append(f"PrecursorMZ: {pep:.4f}")
        elif style == 1:
            lines.append(f"PRECURSORMZ: {pep:.4f} extra")
        elif style == 2:
            lines.append(f"Comment: Spec=great Parent={pep:.4f} X=1")
        elif style == 3:
            lines.append(f"MW: {pep:.4f}")
        # style 4: no precursor at all -> entry skipped
        cstyle = rng.integers(0, 4)
        if cstyle == 0:
            lines.append("Charge: 2+")
        elif cstyle == 1:
            lines.append("Charge: 3")
        elif cstyle == 2:
            lines.append(f'Comment: Charge=2 Note="has spaces"')
        if rng.random() < 0.5:
            lines.append(f"Comment: RTINSECONDS={rng.random() * 90:.3f}")
        elif rng.random() < 0.3:
            lines.append(f"RetentionTime: {rng.random() * 90:.3f}")
        lines.append(f"Num Peaks: irrelevant")
        n_peaks = int(rng.integers(6, 20))
        mzs = np.sort(rng.uniform(110.0, 1450.0, n_peaks))
        i = 0
        while i < n_peaks:
            if rng.random() < 0.3 and i + 1 < n_peaks:
                lines.append(
                    f"{mzs[i]:.4f} {rng.random():.4f}; "
                    f"{mzs[i + 1]:.4f} {rng.random():.4f}"
                )
                i += 2
            else:
                extra = ' "y1 ann"' if rng.random() < 0.3 else ""
                lines.append(f"{mzs[i]:.4f}\t{rng.random():.4f}{extra}")
                i += 1
        if rng.random() < 0.1:
            # Stray header inside the peak list -> entry malformed.
            lines.append("Collision: HCD")
        if rng.random() < 0.7:
            lines.append("")  # blank separator (else next Name ends it)
    return "\n".join(lines) + "\n"


MSP_DEFAULTS = dict(DEFAULTS, min_peaks=3, min_mz_range=100.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_msp_random_matches_python(tmp_path, seed):
    rng = np.random.default_rng(3000 + seed)
    path = str(tmp_path / "lib.msp")
    with open(path, "w") as f:
        f.write(_random_msp(rng))
    expected, lqc = python_reference(path, MSP_DEFAULTS)
    assert expected, "generator should produce surviving entries"
    batch = native.msp_ingest(path, **MSP_DEFAULTS)
    assert_batch_matches(batch, expected, lqc)


def test_msp_range_parse_concatenates_to_whole_file(tmp_path):
    rng = np.random.default_rng(77)
    path = str(tmp_path / "big.msp")
    with open(path, "w") as f:
        f.write(_random_msp(rng, n_entries=40))
    whole = native.msp_ingest(path, **MSP_DEFAULTS)
    size = os.path.getsize(path)
    for n_ranges in (2, 3, 7):
        bounds = [size * i // n_ranges for i in range(n_ranges + 1)]
        parts = [
            native.msp_ingest(path, start=bounds[i], end=bounds[i + 1],
                              **MSP_DEFAULTS)
            for i in range(n_ranges)
        ]
        ids = np.concatenate([p["identifier"] for p in parts])
        np.testing.assert_array_equal(ids, whole["identifier"])
        np.testing.assert_array_equal(
            np.concatenate([p["precursor_mz"] for p in parts]),
            whole["precursor_mz"],
        )
        np.testing.assert_array_equal(
            np.concatenate([p["mz"] for p in parts]), whole["mz"]
        )


def test_gzipped_msp_uses_native_path(tmp_path):
    import gzip

    rng = np.random.default_rng(5)
    plain = str(tmp_path / "lib.msp")
    with open(plain, "w") as f:
        f.write(_random_msp(rng))
    gz_path = str(tmp_path / "lib.msp.gz")
    with open(plain, "rb") as f_in, gzip.open(gz_path, "wb") as f_out:
        f_out.write(f_in.read())
    result, _ = ingest.read_and_process_file(gz_path, MSP_DEFAULTS)
    assert isinstance(result, dict)  # native columnar batch
    assert (result["filename"] == os.path.abspath(gz_path)).all()


def test_scanner_window_boundary_on_multi_megabyte_file(tmp_path):
    """Lines that straddle the scanner's internal read-window boundary
    (LineWindow's 4 MB fread chunks, native/falcon_ingest.cc) must parse
    identically to the Python reader.  Every other test uses files far
    below one chunk, so window compaction/refill never runs there."""
    rng = np.random.default_rng(17)
    path = str(tmp_path / "big.mgf")
    n_spec, n_peaks = 2200, 60
    with open(path, "w") as f:
        for s in range(n_spec):
            f.write(f"BEGIN IONS\nTITLE=spec{s}\n"
                    f"PEPMASS={400 + (s % 500) * 0.37:.4f}\n"
                    "CHARGE=2+\nRTINSECONDS=%.2f\n" % (s * 0.5))
            mzs = np.sort(rng.uniform(101.0, 1490.0, n_peaks))
            # Long peak lines (full float repr + padding) so the file
            # comfortably exceeds one 4 MB chunk.
            for m in mzs:
                f.write(f"{float(m)!r} {rng.uniform(0.01, 1.0):.17f}   \n")
            f.write("END IONS\n")
    assert os.path.getsize(path) > (4 << 20) + (1 << 20)
    batch = native.mgf_ingest(path, **DEFAULTS)
    ref, lqc = python_reference(path, DEFAULTS)
    assert len(batch["identifier"]) == len(ref)
    np.testing.assert_array_equal(
        batch["identifier"], np.asarray([r["identifier"] for r in ref]))
    np.testing.assert_allclose(
        batch["precursor_mz"],
        np.asarray([r["precursor_mz"] for r in ref]))
    np.testing.assert_array_equal(
        batch["mz"], np.concatenate([r["mz"] for r in ref]))


def test_native_matches_python_non_finite_values(tmp_path):
    """NaN/inf precursor m/z, RT, and peak values: both paths drop the
    poisoned spectra/peaks identically (SURVEY.md §3.5 divergence —
    non-finite data never enters the pipeline)."""
    peaks = "".join(f"{m}.5 {i + 1}.0\n"
                    for i, m in enumerate(range(150, 950, 80)))
    path = str(tmp_path / "nonfinite.mgf")
    with open(path, "w") as f:
        f.write(
            "BEGIN IONS\nTITLE=good\nPEPMASS=500.25\nCHARGE=2+\n"
            f"RTINSECONDS=12.5\n{peaks}END IONS\n"
            "BEGIN IONS\nTITLE=nan precursor\nPEPMASS=nan\nCHARGE=2+\n"
            f"{peaks}END IONS\n"
            "BEGIN IONS\nTITLE=inf precursor\nPEPMASS=inf\nCHARGE=2+\n"
            f"{peaks}END IONS\n"
            "BEGIN IONS\nTITLE=nan rt\nPEPMASS=510.0\nCHARGE=2+\n"
            f"RTINSECONDS=nan\n{peaks}END IONS\n"
            "BEGIN IONS\nTITLE=nan peaks\nPEPMASS=520.0\nCHARGE=2+\n"
            "RTINSECONDS=5.0\n"
            "150.5 nan\n160.5 inf\nnan 3.0\n"
            f"{peaks}END IONS\n"
        )
    kwargs = dict(DEFAULTS, min_peaks=5)
    expected, lqc = python_reference(path, kwargs)
    batch = native.mgf_ingest(path, **kwargs)
    assert_batch_matches(batch, expected, lqc)
    kept = list(batch["identifier"])
    assert "good" in kept and "nan peaks" in kept
    assert "nan precursor" not in kept
    assert "inf precursor" not in kept
    assert "nan rt" not in kept
    assert batch["n_low_quality"] == 3
    assert np.isfinite(batch["mz"]).all()
    assert np.isfinite(batch["intensity"]).all()
