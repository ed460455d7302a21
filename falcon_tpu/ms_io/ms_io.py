"""Extension-based peak-file I/O dispatch.

Mirrors reference ``falcon/ms_io/ms_io.py``: readers for .mgf/.mzml/.mzxml
(raise on missing file or unknown extension, ``ms_io.py:28-38``), writer for
MGF only (``ms_io.py:58-66``).
"""

import os
from typing import Iterable, Iterator

from .containers import Spectrum
from . import mgf_io, mzml_io, mzxml_io


def get_spectra(filename: str) -> Iterator[Spectrum]:
    """Get the MS/MS spectra from the given file (MGF, mzML, or mzXML)."""
    if not os.path.isfile(filename):
        raise ValueError(f"Non-existing peak file {filename}")

    _, ext = os.path.splitext(filename.lower())
    if ext == ".mgf":
        spectrum_io = mgf_io
    elif ext == ".mzml":
        spectrum_io = mzml_io
    elif ext == ".mzxml":
        spectrum_io = mzxml_io
    else:
        raise ValueError(f'Unknown spectrum file type with extension "{ext}"')

    yield from spectrum_io.get_spectra(filename)


def write_spectra(filename: str, spectra: Iterable[Spectrum]) -> None:
    """Write the given spectra to a peak file (MGF only)."""
    ext = os.path.splitext(filename.lower())[1]
    if ext == ".mgf":
        mgf_io.write_spectra(filename, spectra)
    else:
        raise ValueError(
            "Unsupported peak file format (supported formats: MGF)"
        )
