"""Extension-based peak-file I/O dispatch.

Behavioral parity with reference ``falcon/ms_io/ms_io.py``: readers for
.mgf/.mzml/.mzxml (error on missing file or unknown extension,
``ms_io.py:28-38``), writer for MGF only (``ms_io.py:58-66``) — implemented
here as a table-driven dispatch.
"""

import os
from typing import Iterable, Iterator

from .containers import Spectrum
from . import mgf_io, mzml_io, mzxml_io

_READERS = {
    ".mgf": mgf_io,
    ".mzml": mzml_io,
    ".mzxml": mzxml_io,
}

_WRITERS = {
    ".mgf": mgf_io,
}


def get_spectra(filename: str) -> Iterator[Spectrum]:
    """Get the MS/MS spectra from the given file (MGF, mzML, or mzXML)."""
    if not os.path.isfile(filename):
        raise ValueError(f"Non-existing peak file: {filename!r} not found")

    _, ext = os.path.splitext(filename.lower())
    reader = _READERS.get(ext)
    if reader is None:
        raise ValueError(
            f"Unknown spectrum file type: no reader registered for "
            f'extension "{ext}"'
        )
    yield from reader.get_spectra(filename)


def write_spectra(filename: str, spectra: Iterable[Spectrum]) -> None:
    """Write the given spectra to a peak file (MGF only)."""
    ext = os.path.splitext(filename.lower())[1]
    writer = _WRITERS.get(ext)
    if writer is None:
        raise ValueError(
            f'Unsupported peak file format "{ext}" — spectra can only be '
            f"exported as MGF"
        )
    writer.write_spectra(filename, spectra)
