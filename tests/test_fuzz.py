"""Byte-level mutation fuzz of the peak-file parsers (Python + native).

Contract under arbitrary corruption of a valid input: parsers must not
crash the process or leak unhandled exceptions — they yield some subset
of structurally-sane spectra (possibly none), warn, or skip, per the
failure-handling semantics (SURVEY.md §5c; reference anchors
``falcon/ms_io/mgf_io.py`` / ``mzml_io.py`` / ``mzxml_io.py``, which
inherit pyteomics' skip/raise behavior).  This is the de-facto
production contract: one corrupt file must never take down a
multi-million-spectrum ingest.

The native parsers (``native/falcon_ingest.cc``, ``native/falcon_mzml.cc``)
run in-process via ctypes, so a memory-safety bug would kill the pytest
process itself — surviving this fuzz is the memory-safety regression
test for the C++ scanners.
"""

import numpy as np
import pytest

from test_native_ingest import _spectra_to_scans, _write_mzml, _write_mzxml

from falcon_tpu import native
from falcon_tpu.ms_io import ms_io
from falcon_tpu.simulate import make_clustered_spectra, write_mgf

N_TRIALS = 30

_NATIVE_INGEST = {
    "mgf": native.mgf_ingest,
    "mzML": native.mzml_ingest,
    "mzXML": native.mzxml_ingest,
    "msp": native.msp_ingest,
}


def _write_msp(path, spectra) -> None:
    with open(path, "w") as f:
        for s in spectra:
            f.write(f"Name: {s.identifier}\n"
                    f"PrecursorMZ: {s.precursor_mz}\n")
            if s.precursor_charge is not None:
                f.write(f"Charge: {s.precursor_charge}\n")
            f.write(f"Num Peaks: {len(s.mz)}\n")
            for m, i in zip(s.mz, s.intensity):
                f.write(f"{m} {i}\n")
            f.write("\n")


def _base_file(tmp_path, fmt: str) -> bytes:
    spectra, _ = make_clustered_spectra(
        n_clusters=6, cluster_size=4, n_noise=10, seed=11
    )
    path = str(tmp_path / f"base.{fmt}")
    if fmt == "mgf":
        write_mgf(path, spectra)
    elif fmt == "mzML":
        _write_mzml(path, spectra)
    elif fmt == "msp":
        _write_msp(path, spectra)
    else:
        _write_mzxml(path, _spectra_to_scans(spectra))
    with open(path, "rb") as f:
        return f.read()


def _mutate(base: bytes, rng: np.random.Generator) -> bytes:
    data = bytearray(base)
    op = int(rng.integers(0, 5))
    if op == 0:  # truncate at a random offset
        return bytes(data[: int(rng.integers(0, len(data)))])
    if op == 1:  # delete a random chunk
        start = int(rng.integers(0, len(data)))
        del data[start: start + int(rng.integers(1, 400))]
    elif op == 2:  # overwrite random bytes with random values
        for _ in range(int(rng.integers(1, 40))):
            data[int(rng.integers(0, len(data)))] = int(
                rng.integers(0, 256)
            )
    elif op == 3:  # insert random garbage (incl. non-UTF8 bytes)
        pos = int(rng.integers(0, len(data)))
        junk = rng.integers(0, 256, int(rng.integers(1, 200)))
        data[pos:pos] = bytes(junk.astype(np.uint8))
    else:  # duplicate a random chunk elsewhere (repeated/nested tags)
        start = int(rng.integers(0, len(data)))
        chunk = bytes(data[start: start + int(rng.integers(1, 400))])
        pos = int(rng.integers(0, len(data)))
        data[pos:pos] = chunk
    return bytes(data)


def _assert_sane(spec) -> None:
    assert len(spec.mz) == len(spec.intensity)
    assert isinstance(spec.identifier, str)


def _assert_batch_sane(batch) -> None:
    n = len(batch["identifier"])
    assert len(batch["precursor_mz"]) == n
    assert len(batch["precursor_charge"]) == n
    assert len(batch["retention_time"]) == n
    offsets = batch["peak_offsets"]
    assert len(offsets) == n + 1
    assert offsets[0] == 0 and (np.diff(offsets) >= 0).all()
    assert len(batch["mz"]) == offsets[-1]
    assert len(batch["intensity"]) == offsets[-1]


@pytest.mark.parametrize("fmt", ["mgf", "mzML", "mzXML", "msp"])
def test_parsers_survive_random_mutations(tmp_path, fmt, caplog):
    base = _base_file(tmp_path, fmt)
    rng = np.random.default_rng(abs(hash(fmt)) % 2**32)
    path = str(tmp_path / f"mut.{fmt}")
    for trial in range(N_TRIALS):
        with open(path, "wb") as f:
            f.write(_mutate(base, rng))
        # Python parser: any outcome except an unhandled exception.
        for spec in ms_io.get_spectra(path):
            _assert_sane(spec)
        # Native parser: a columnar batch, or None (library refused) —
        # and, implicitly, no crash of this very process.
        ingest_fn = _NATIVE_INGEST.get(fmt)
        batch = ingest_fn(path, 1, 0.0) if ingest_fn else None
        if batch is not None:
            _assert_batch_sane(batch)


@pytest.mark.parametrize("fmt", ["mgf", "mzML", "mzXML", "msp"])
def test_parsers_survive_binary_garbage_file(tmp_path, fmt):
    """A file that was never text at all (e.g. a gzip or Thermo RAW file
    renamed to a supported extension) parses to zero spectra without an
    exception on both paths."""
    rng = np.random.default_rng(99)
    path = str(tmp_path / f"garbage.{fmt}")
    with open(path, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 65536, dtype=np.uint8)))
    assert list(ms_io.get_spectra(path)) == []
    ingest_fn = _NATIVE_INGEST.get(fmt)
    batch = ingest_fn(path, 1, 0.0) if ingest_fn else None
    if batch is not None:
        assert len(batch["identifier"]) == 0


@pytest.mark.parametrize("fmt", ["mgf", "mzML", "mzXML", "msp"])
def test_gz_wrapped_mutations_survive_full_ingest_path(tmp_path, fmt):
    """Corrupt .gz containers (mutated payloads AND flipped bytes in the
    gz stream itself) must flow through ingest.read_and_process_file
    without an unhandled exception — a mid-stream zlib error previously
    escaped decompress_to_temp and aborted the run."""
    import gzip

    from falcon_tpu import ingest

    kw = dict(min_peaks=5, min_mz_range=250.0, mz_min=101.0,
              mz_max=1500.0, remove_precursor_tolerance=1.5,
              min_intensity=0.01, max_peaks_used=50, scaling=None)
    base = _base_file(tmp_path, fmt)
    rng = np.random.default_rng(abs(hash("gz" + fmt)) % 2**32)
    path = str(tmp_path / f"mut.{fmt}.gz")
    for trial in range(10):
        with gzip.open(path, "wb") as f:
            f.write(_mutate(base, rng))
        if trial % 3 == 0:  # corrupt the gz container itself
            raw = bytearray(open(path, "rb").read())
            if len(raw) > 10:
                raw[int(rng.integers(0, len(raw)))] ^= 0xFF
            open(path, "wb").write(bytes(raw))
        result, lqc = ingest.read_and_process_file(path, kw)
        assert result is None or isinstance(result, (dict, list))
