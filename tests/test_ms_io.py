import base64
import struct
import zlib

import numpy as np
import pytest

from falcon_tpu.ms_io import ms_io, mgf_io, mzml_io, mzxml_io
from falcon_tpu.ms_io.containers import Spectrum


MGF_TEXT = """BEGIN IONS
TITLE=spectrum_1
PEPMASS=500.25 1000.0
CHARGE=2+
RTINSECONDS=120.5
100.1 10.0
200.2 20.0
300.3 5.0
END IONS

BEGIN IONS
TITLE=spectrum_2
PEPMASS=600.5
150.0 1.0
250.0 2.0
END IONS

BEGIN IONS
PEPMASS=700.0
100.0 1.0
END IONS
"""


def test_mgf_parse(tmp_path):
    path = tmp_path / "test.mgf"
    path.write_text(MGF_TEXT)
    spectra = list(mgf_io.get_spectra(str(path)))
    # Third block has no TITLE -> skipped silently (reference mgf_io.py:27-30).
    assert len(spectra) == 2
    s1, s2 = spectra
    assert s1.identifier == "spectrum_1"
    assert s1.precursor_mz == 500.25
    assert s1.precursor_charge == 2
    assert s1.retention_time == 120.5
    np.testing.assert_allclose(s1.mz, [100.1, 200.2, 300.3], rtol=1e-6)
    np.testing.assert_allclose(s1.intensity, [10.0, 20.0, 5.0])
    # Missing CHARGE -> None; missing RTINSECONDS -> -1.
    assert s2.precursor_charge is None
    assert s2.retention_time == -1


def test_mgf_roundtrip(tmp_path):
    spec = Spectrum(
        "roundtrip", 432.1, 3, np.array([100.0, 200.0]),
        np.array([1.0, 2.0]), 55.5,
    )
    spec_nocharge = Spectrum(
        "nocharge", 500.0, None, np.array([150.0, 250.0]),
        np.array([3.0, 4.0]), -1,
    )
    path = tmp_path / "out.mgf"
    # None charge must not raise (divergence from reference mgf_io.py:104,
    # documented in SURVEY.md §3.5).
    mgf_io.write_spectra(str(path), [spec, spec_nocharge])
    back = list(mgf_io.get_spectra(str(path)))
    assert len(back) == 2
    assert back[0].identifier == "roundtrip"
    assert back[0].precursor_charge == 3
    assert back[0].retention_time == 55.5
    np.testing.assert_allclose(back[0].mz, spec.mz)
    assert back[1].precursor_charge is None


def _b64(array: np.ndarray, compress=False) -> str:
    raw = array.tobytes()
    if compress:
        raw = zlib.compress(raw)
    return base64.b64encode(raw).decode()


def _make_mzml(spectra) -> str:
    """Create a minimal mzML document."""
    chunks = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">',
        f'<run id="r"><spectrumList count="{len(spectra)}">',
    ]
    for i, spec in enumerate(spectra):
        mz64 = _b64(np.asarray(spec["mz"], np.float64),
                    spec.get("zlib", False))
        int32_ = _b64(np.asarray(spec["intensity"], np.float32),
                      spec.get("zlib", False))
        comp = (
            '<cvParam accession="MS:1000574" name="zlib compression"/>'
            if spec.get("zlib")
            else '<cvParam accession="MS:1000576" name="no compression"/>'
        )
        charge = (
            f'<cvParam accession="MS:1000041" name="charge state" '
            f'value="{spec["charge"]}"/>'
            if spec.get("charge") is not None
            else ""
        )
        chunks.append(f"""
<spectrum index="{i}" id="{spec["id"]}" defaultArrayLength="{len(spec["mz"])}">
  <cvParam accession="MS:1000511" name="ms level" value="{spec["ms_level"]}"/>
  <scanList count="1"><scan>
    <cvParam accession="MS:1000016" name="scan start time" value="{spec["rt"]}" unitName="{spec.get("rt_unit", "second")}"/>
  </scan></scanList>
  <precursorList count="1"><precursor><selectedIonList count="1"><selectedIon>
    <cvParam accession="MS:1000744" name="selected ion m/z" value="{spec["precursor_mz"]}"/>
    {charge}
  </selectedIon></selectedIonList></precursor></precursorList>
  <binaryDataArrayList count="2">
    <binaryDataArray>
      <cvParam accession="MS:1000523" name="64-bit float"/>
      {comp}
      <cvParam accession="MS:1000514" name="m/z array"/>
      <binary>{mz64}</binary>
    </binaryDataArray>
    <binaryDataArray>
      <cvParam accession="MS:1000521" name="32-bit float"/>
      {comp}
      <cvParam accession="MS:1000515" name="intensity array"/>
      <binary>{int32_}</binary>
    </binaryDataArray>
  </binaryDataArrayList>
</spectrum>""")
    chunks.append("</spectrumList></run></mzML>")
    return "\n".join(chunks)


def test_mzml_parse(tmp_path):
    doc = _make_mzml([
        dict(id="scan=1", ms_level=1, rt=10.0, precursor_mz=400.0,
             charge=2, mz=[100.0, 200.0], intensity=[1.0, 2.0]),
        dict(id="scan=2", ms_level=2, rt=20.0, precursor_mz=450.5,
             charge=2, mz=[110.0, 210.0, 310.0],
             intensity=[1.5, 2.5, 3.5], zlib=True),
        dict(id="scan=3", ms_level=2, rt=30.0, precursor_mz=500.0,
             charge=None, mz=[120.0], intensity=[4.0]),
    ])
    path = tmp_path / "test.mzml"
    path.write_text(doc)
    spectra = list(mzml_io.get_spectra(str(path)))
    # MS1 scans are skipped (reference mzml_io.py:33).
    assert [s.identifier for s in spectra] == ["scan=2", "scan=3"]
    s = spectra[0]
    assert s.precursor_mz == 450.5
    assert s.precursor_charge == 2
    assert s.retention_time == 20.0
    np.testing.assert_allclose(s.mz, [110.0, 210.0, 310.0])
    np.testing.assert_allclose(s.intensity, [1.5, 2.5, 3.5])
    assert spectra[1].precursor_charge is None


def _make_mzxml(scans) -> str:
    chunks = [
        '<?xml version="1.0" encoding="ISO-8859-1"?>',
        '<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2">',
        "<msRun>",
    ]
    for scan in scans:
        pairs = np.empty(2 * len(scan["mz"]), np.float32)
        pairs[0::2] = scan["mz"]
        pairs[1::2] = scan["intensity"]
        payload = base64.b64encode(
            pairs.astype(">f4").tobytes()
        ).decode()
        charge_attr = (
            f' precursorCharge="{scan["charge"]}"'
            if scan.get("charge") is not None
            else ""
        )
        chunks.append(f"""
<scan num="{scan["num"]}" msLevel="{scan["ms_level"]}" retentionTime="PT{scan["rt"]}S" peaksCount="{len(scan["mz"])}">
  <precursorMz{charge_attr}>{scan["precursor_mz"]}</precursorMz>
  <peaks precision="32" byteOrder="network" contentType="m/z-int" compressionType="none">{payload}</peaks>
</scan>""")
    chunks.append("</msRun></mzXML>")
    return "\n".join(chunks)


def test_mzxml_parse(tmp_path):
    doc = _make_mzxml([
        dict(num=1, ms_level=1, rt=5.0, precursor_mz=0.0,
             mz=[50.0], intensity=[1.0]),
        dict(num=2, ms_level=2, rt=65.5, precursor_mz=432.1, charge=3,
             mz=[100.0, 200.0], intensity=[10.0, 20.0]),
        dict(num=3, ms_level=2, rt=70.0, precursor_mz=500.0,
             mz=[150.0, 250.0], intensity=[1.0, 2.0]),
    ])
    path = tmp_path / "test.mzxml"
    path.write_text(doc)
    spectra = list(mzxml_io.get_spectra(str(path)))
    assert [s.identifier for s in spectra] == ["2", "3"]
    s = spectra[0]
    assert s.precursor_mz == 432.1
    assert s.precursor_charge == 3
    assert s.retention_time == 65.5
    np.testing.assert_allclose(s.mz, [100.0, 200.0])
    np.testing.assert_allclose(s.intensity, [10.0, 20.0])
    assert spectra[1].precursor_charge is None


def test_retention_time_always_seconds(tmp_path):
    """All readers report RT in seconds (SURVEY.md §3.5 divergence):
    mzML minute-unit cvParams are converted; mzXML xs:durations with
    minute components are resolved; MGF RTINSECONDS is native."""
    doc = _make_mzml([
        dict(id="scan=1", ms_level=2, rt=2.5, rt_unit="minute",
             precursor_mz=450.0, charge=2,
             mz=[110.0, 210.0], intensity=[1.0, 2.0]),
    ])
    path = tmp_path / "rt.mzml"
    path.write_text(doc)
    (spec,) = mzml_io.get_spectra(str(path))
    assert spec.retention_time == 150.0

    doc = _make_mzxml([
        dict(num=1, ms_level=2, rt=0.0, precursor_mz=500.0,
             mz=[150.0, 250.0], intensity=[1.0, 2.0]),
    ]).replace('retentionTime="PT0.0S"', 'retentionTime="PT2M30S"')
    path = tmp_path / "rt.mzxml"
    path.write_text(doc)
    (spec,) = mzxml_io.get_spectra(str(path))
    assert spec.retention_time == 150.0


def test_corrupt_xml_warns_and_stops(tmp_path, caplog):
    """XML-level errors warn and stop iteration instead of raising
    (reference mzml_io.py:33-38) — exercised via the import-time
    _XML_ERRORS tuple so the stdlib-etree fallback stays correct."""
    good = _make_mzml([
        dict(id="scan=1", ms_level=2, rt=1.0, precursor_mz=450.0,
             charge=2, mz=[110.0, 210.0], intensity=[1.0, 2.0]),
    ])
    # Truncate mid-document: the parser yields what it saw, then warns.
    path = tmp_path / "broken.mzml"
    path.write_text(good[: good.index("</spectrum>") + 11] + "\n<oops")
    with caplog.at_level("WARNING", logger="falcon_tpu"):
        spectra = list(mzml_io.get_spectra(str(path)))
    assert [s.identifier for s in spectra] == ["scan=1"]
    assert any("Failed to read file" in r.message for r in caplog.records)

    path = tmp_path / "broken.mzxml"
    path.write_text("<mzXML><msRun><scan num=")
    with caplog.at_level("WARNING", logger="falcon_tpu"):
        assert list(mzxml_io.get_spectra(str(path))) == []
    assert sum("Failed to read file" in r.message
               for r in caplog.records) >= 2


def test_dispatch_unknown_extension(tmp_path):
    path = tmp_path / "spectra.raw"
    path.write_text("")
    with pytest.raises(ValueError, match="Unknown spectrum file type"):
        list(ms_io.get_spectra(str(path)))
    with pytest.raises(ValueError, match="Non-existing peak file"):
        list(ms_io.get_spectra(str(tmp_path / "missing.mgf")))
    with pytest.raises(ValueError, match="Unsupported peak file format"):
        ms_io.write_spectra(str(tmp_path / "out.mzml"), [])


def test_corrupt_zlib_spectrum_skipped_not_fatal(tmp_path):
    """A corrupt compressed peak payload in ONE spectrum must not abort
    the rest of the file: zlib.error is part of the per-spectrum skip
    (reference skips malformed spectra, mzml_io.py:33-36)."""
    doc = _make_mzml([
        dict(id="scan=1", ms_level=2, rt=1.0, precursor_mz=450.0,
             charge=2, mz=[110.0, 210.0], intensity=[1.0, 2.0],
             zlib=True),
        dict(id="scan=2", ms_level=2, rt=2.0, precursor_mz=460.0,
             charge=2, mz=[120.0, 220.0], intensity=[3.0, 4.0]),
    ])
    # Replace scan=1's compressed m/z payload with valid base64 of
    # bytes that are NOT a zlib stream.
    good = _b64(np.asarray([110.0, 210.0], np.float64), compress=True)
    bad = base64.b64encode(b"definitely not zlib data").decode()
    path = tmp_path / "badzlib.mzml"
    path.write_text(doc.replace(good, bad, 1))
    spectra = list(mzml_io.get_spectra(str(path)))
    assert [s.identifier for s in spectra] == ["scan=2"]

    xdoc = _make_mzxml([
        dict(num=1, ms_level=2, rt=1.0, precursor_mz=450.0,
             mz=[100.0, 200.0], intensity=[1.0, 2.0]),
        dict(num=2, ms_level=2, rt=2.0, precursor_mz=460.0,
             mz=[150.0, 250.0], intensity=[3.0, 4.0]),
    ]).replace('compressionType="none"', 'compressionType="zlib"', 1)
    path = tmp_path / "badzlib.mzxml"
    path.write_text(xdoc)
    spectra = list(mzxml_io.get_spectra(str(path)))
    assert [s.identifier for s in spectra] == ["2"]


def test_empty_precursor_mz_scan_skipped(tmp_path):
    """<precursorMz/> with no text (float(None) -> TypeError) skips the
    scan instead of aborting the file."""
    doc = _make_mzxml([
        dict(num=1, ms_level=2, rt=1.0, precursor_mz=450.0,
             mz=[100.0, 200.0], intensity=[1.0, 2.0]),
        dict(num=2, ms_level=2, rt=2.0, precursor_mz=460.0,
             mz=[150.0, 250.0], intensity=[3.0, 4.0]),
    ]).replace(">450.0</precursorMz>", "></precursorMz>", 1)
    path = tmp_path / "emptyprec.mzxml"
    path.write_text(doc)
    spectra = list(mzxml_io.get_spectra(str(path)))
    assert [s.identifier for s in spectra] == ["2"]


def test_mgf_comments_and_header_params(tmp_path):
    """Comment lines (# ; ! /) are ignored and file-header parameters
    before the first BEGIN IONS merge into every spectrum with local
    keys winning — pyteomics ``MGFBase._comments`` / ``use_header=True``
    defaults the reference inherits (``falcon/ms_io/mgf_io.py:25``)."""
    path = tmp_path / "hdr.mgf"
    path.write_text(
        "# generated by an exporter\n"
        "COM=my run\n"
        "CHARGE=2+\n"
        "RTINSECONDS=7.5\n"
        "\n"
        "BEGIN IONS\n"
        "TITLE=inherits_header\n"
        "PEPMASS=500.25\n"
        "; block comment\n"
        "100.1 10.0\n"
        "200.2 20.0\n"
        "END IONS\n"
        "! between blocks\n"
        "BEGIN IONS\n"
        "TITLE=local_override\n"
        "PEPMASS=600.5\n"
        "CHARGE=3+\n"
        "RTINSECONDS=42.0\n"
        "/ another comment style\n"
        "150.0 1.0\n"
        "250.0 2.0\n"
        "END IONS\n"
    )
    s1, s2 = list(mgf_io.get_spectra(str(path)))
    assert s1.identifier == "inherits_header"
    assert s1.precursor_charge == 2      # from the file header
    assert s1.retention_time == 7.5      # from the file header
    np.testing.assert_allclose(s1.mz, [100.1, 200.2], rtol=1e-6)
    assert s2.precursor_charge == 3      # local CHARGE wins
    assert s2.retention_time == 42.0     # local RTINSECONDS wins


def test_unsupported_numpress_mzml_scan_skipped(tmp_path, caplog):
    """A spectrum whose binary arrays use MS-Numpress (unsupported) is
    skipped with a once-per-file warning — decoding the payload as raw
    IEEE floats would be silent garbage."""
    doc = _make_mzml([
        dict(id="scan=0", ms_level=2, mz=[150.0, 300.0],
             intensity=[1.0, 2.0], precursor_mz=500.0, charge=2,
             rt=10.0),
        dict(id="scan=1", ms_level=2, mz=[160.0, 310.0],
             intensity=[1.0, 2.0], precursor_mz=510.0, charge=2,
             rt=11.0),
    ])
    # Flip the first spectrum's compression cvParams to numpress-linear.
    doc = doc.replace('accession="MS:1000576" name="no compression"',
                      'accession="MS:1002312" name="numpress linear"', 2)
    path = str(tmp_path / "np.mzml")
    open(path, "w").write(doc)
    import logging as _logging
    with caplog.at_level(_logging.WARNING, logger="falcon_tpu"):
        out = list(mzml_io.get_spectra(path))
    assert [s.identifier for s in out] == ["scan=1"]
    numpress_warnings = [r for r in caplog.records
                         if "Numpress" in r.message]
    assert len(numpress_warnings) == 1


def test_unsupported_mzxml_compression_scan_skipped(tmp_path):
    """An mzXML scan with an unknown compressionType is skipped rather
    than decoded as raw floats."""
    doc = _make_mzxml([
        dict(num=1, ms_level=2, rt=10.0, precursor_mz=500.0, charge=2,
             mz=[150.0, 300.0], intensity=[1.0, 2.0]),
        dict(num=2, ms_level=2, rt=11.0, precursor_mz=510.0, charge=2,
             mz=[160.0, 310.0], intensity=[1.0, 2.0]),
    ])
    doc = doc.replace('compressionType="none"',
                      'compressionType="numpress-linear"', 1)
    path = str(tmp_path / "np.mzxml")
    open(path, "w").write(doc)
    out = list(mzxml_io.get_spectra(path))
    assert len(out) == 1  # the untouched second scan survives


def test_mgf_empty_param_value_skips_spectrum_not_file(tmp_path):
    """'PEPMASS=' / 'CHARGE=' with an empty value must skip that
    spectrum (like the native scanner), not abort iteration of the
    whole file with an IndexError."""
    path = tmp_path / "empty_vals.mgf"
    path.write_text(
        "BEGIN IONS\n"
        "TITLE=bad_pepmass\n"
        "PEPMASS=\n"
        "100.0 1.0\n"
        "END IONS\n"
        "BEGIN IONS\n"
        "TITLE=bad_charge\n"
        "PEPMASS=400.0\n"
        "CHARGE=\n"
        "150.0 1.0\n"
        "END IONS\n"
        "BEGIN IONS\n"
        "TITLE=good\n"
        "PEPMASS=500.0\n"
        "CHARGE=2+\n"
        "200.0 1.0\n"
        "END IONS\n"
    )
    out = list(mgf_io.get_spectra(str(path)))
    assert [s.identifier for s in out] == ["good"]


def test_mzxml_unsupported_compression_warns_once(tmp_path, caplog):
    doc = _make_mzxml([
        dict(num=1, ms_level=2, rt=10.0, precursor_mz=500.0, charge=2,
             mz=[150.0, 300.0], intensity=[1.0, 2.0]),
        dict(num=2, ms_level=2, rt=11.0, precursor_mz=510.0, charge=2,
             mz=[160.0, 310.0], intensity=[1.0, 2.0]),
    ])
    doc = doc.replace('compressionType="none"',
                      'compressionType="numpress-linear"')
    path = str(tmp_path / "warn.mzxml")
    open(path, "w").write(doc)
    import logging as _logging
    with caplog.at_level(_logging.WARNING, logger="falcon_tpu"):
        out = list(mzxml_io.get_spectra(path))
    assert out == []
    warnings = [r for r in caplog.records
                if "unsupported peak compression" in r.message]
    assert len(warnings) == 1


def _gzip_file(src: str, dst: str) -> str:
    import gzip
    import shutil

    with open(src, "rb") as f_in, gzip.open(dst, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    return dst


def test_gzipped_mgf_parses_identically(tmp_path):
    plain = tmp_path / "in.mgf"
    plain.write_text(MGF_TEXT)
    gz = _gzip_file(str(plain), str(tmp_path / "in.mgf.gz"))
    a = list(ms_io.get_spectra(str(plain)))
    b = list(ms_io.get_spectra(gz))
    assert len(a) == len(b) == 2
    for sa, sb in zip(a, b):
        assert sa.identifier == sb.identifier
        np.testing.assert_array_equal(sa.mz, sb.mz)
        np.testing.assert_array_equal(sa.intensity, sb.intensity)


def test_gzipped_unknown_inner_extension_raises(tmp_path):
    (tmp_path / "x.txt").write_text("hi")
    gz = _gzip_file(str(tmp_path / "x.txt"), str(tmp_path / "x.txt.gz"))
    with pytest.raises(ValueError, match="Unknown spectrum file type"):
        list(ms_io.get_spectra(gz))


def test_truncated_gzip_warns_and_parses_prefix(tmp_path, caplog):
    import logging

    plain = tmp_path / "in.mgf"
    plain.write_text(MGF_TEXT * 50)
    gz = _gzip_file(str(plain), str(tmp_path / "in.mgf.gz"))
    data = (tmp_path / "in.mgf.gz").read_bytes()
    (tmp_path / "trunc.mgf.gz").write_bytes(data[: len(data) // 2])
    with caplog.at_level(logging.WARNING, logger="falcon_tpu"):
        specs = list(ms_io.get_spectra(str(tmp_path / "trunc.mgf.gz")))
    assert "gzip" in caplog.text
    assert len(specs) < 100  # prefix only — and no exception


MSP_TEXT = """# library header comment
Name: compound one
PrecursorMZ: 500.25
Charge: 2+
Comment: RTINSECONDS=12.5 Collision=HCD
Num Peaks: 4
100.1 10.0; 200.2 20.0
300.3 5.0 "b2 ion"
400.4 1.5

Name: via parent
Comment: Parent=610.5 Charge=3
Num peaks: 2
150.0 1.0
250.0 2.0

Name: missing precursor
Num Peaks: 1
100.0 1.0

Name: malformed peak
PrecursorMZ: 700.0
Num Peaks: 2
100.0 xyz
200.0 1.0

Name: mw fallback
MW: 820.75
Charge: 1-
Num Peaks: 2
120.0 3.0
220.0 4.0
"""


def test_msp_parse(tmp_path):
    path = tmp_path / "lib.msp"
    path.write_text(MSP_TEXT)
    specs = list(ms_io.get_spectra(str(path)))
    assert [s.identifier for s in specs] == [
        "compound one", "via parent", "mw fallback",
    ]
    s1, s2, s3 = specs
    assert s1.precursor_mz == pytest.approx(500.25)
    assert s1.precursor_charge == 2
    assert s1.retention_time == pytest.approx(12.5)
    np.testing.assert_allclose(s1.mz, [100.1, 200.2, 300.3, 400.4],
                               rtol=1e-6)
    np.testing.assert_allclose(s1.intensity, [10.0, 20.0, 5.0, 1.5])
    assert s2.precursor_mz == pytest.approx(610.5)
    assert s2.precursor_charge == 3
    assert s2.retention_time == -1.0
    assert s3.precursor_mz == pytest.approx(820.75)
    assert s3.precursor_charge == -1


def test_msp_without_blank_separators(tmp_path):
    path = tmp_path / "dense.msp"
    path.write_text(
        "Name: a\nPrecursorMZ: 500.0\nNum Peaks: 1\n100.0 1.0\n"
        "Name: b\nPrecursorMZ: 600.0\nNum Peaks: 1\n110.0 2.0\n"
    )
    specs = list(ms_io.get_spectra(str(path)))
    assert [s.identifier for s in specs] == ["a", "b"]
    assert specs[1].precursor_mz == pytest.approx(600.0)


def test_msp_gzipped(tmp_path):
    plain = tmp_path / "lib.msp"
    plain.write_text(MSP_TEXT)
    gz = _gzip_file(str(plain), str(tmp_path / "lib.msp.gz"))
    a = [s.identifier for s in ms_io.get_spectra(str(plain))]
    b = [s.identifier for s in ms_io.get_spectra(gz)]
    assert a == b
