"""Public Python API.

The reference is CLI-only (console script ``falcon``, reference
``setup.cfg:44-46`` / ``falcon/falcon.py:33-244``); library callers have
to shell out and re-parse the CSV.  falcon-tpu exposes the same pipeline
as a first-class function instead::

    import falcon_tpu

    result = falcon_tpu.cluster_files(
        ["peaks/*.mgf"], backend="ann", eps=0.10)
    result.cluster            # np.int64 label per spectrum
    result.spectrum_id        # identifiers aligned with the labels
    result.n_clusters         # number of distinct clusters

Options take the CLI option names as Python keyword arguments with the
same defaults and semantics (``precursor_tol=(20, "ppm")``,
``linkage="complete"``, ``export_representatives=True``, ...), so the
CLI documentation applies verbatim.  When ``output`` is given the
CSV/MGF artifacts are written exactly as the CLI writes them (atomic
rename, manifest header) in addition to the in-memory result; without
it nothing touches the output paths and the overwrite gate does not
apply.  Invalid inputs raise (``ValueError`` for bad files/options,
``FileExistsError`` for an existing output without ``overwrite=True``)
instead of returning exit codes.

Thread-safety: the configuration is a process-wide singleton (mirroring
the reference), so concurrent :func:`cluster` calls in one process are
not supported — call it from one thread at a time.
"""

import os
import tempfile
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

import numpy as np

from .ms_io.containers import Spectrum
from .store.store import NULL_CHARGE

__all__ = ["cluster", "ClusterResult", "NULL_CHARGE"]


@dataclass
class ClusterResult:
    """Cluster assignments, one entry per kept (quality-passing) spectrum.

    Rows are in charge-major store order (all spectra of one precursor
    charge, then the next); use :meth:`to_rows` or numpy fancy indexing
    to reorder.  ``precursor_charge`` uses the ``NULL_CHARGE`` sentinel
    (int16 min) for spectra without a charge, matching the columnar
    store; the CSV export renders those as an empty field.
    """

    filename: np.ndarray
    spectrum_id: np.ndarray
    precursor_charge: np.ndarray
    precursor_mz: np.ndarray
    retention_time: np.ndarray
    cluster: np.ndarray
    representatives: List[Spectrum] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.cluster)

    @property
    def n_clusters(self) -> int:
        return len(np.unique(self.cluster))

    def to_rows(self) -> List[dict]:
        """Rows as plain dicts (missing charge becomes ``None``)."""
        charges = [
            None if c == NULL_CHARGE else int(c)
            for c in self.precursor_charge
        ]
        return [
            {
                "filename": str(f),
                "spectrum_id": str(s),
                "precursor_charge": c,
                "precursor_mz": float(m),
                "retention_time": float(r),
                "cluster": int(k),
            }
            for f, s, c, m, r, k in zip(
                self.filename, self.spectrum_id, charges,
                self.precursor_mz, self.retention_time, self.cluster,
            )
        ]


# Options that are presence-only CLI flags (store_true).
_FLAG_OPTIONS = frozenset({"overwrite", "export_representatives"})
# Options taking multiple CLI values (passed as a tuple/list).
_MULTI_OPTIONS = frozenset({"precursor_tol"})


def _option_names() -> frozenset:
    """The configurable option surface, derived from the CLI parser so
    the API can never drift from it."""
    from .config import config

    skip = {"input_filenames", "output_filename", "help", "config"}
    return frozenset(
        a.dest for a in config._parser._actions if a.dest not in skip
    )


def cluster(
    inputs: Union[str, Sequence[str]],
    output: Optional[str] = None,
    **options,
) -> ClusterResult:
    """Run the full clustering pipeline and return in-memory results.

    Parameters
    ----------
    inputs:
        One glob pattern / path or a sequence of them (any supported
        peak-file format: MGF, MSP, mzML, mzXML, optionally gzipped).
    output:
        Optional output prefix.  When given, ``{output}.csv`` (and
        ``{output}.mgf`` with ``export_representatives=True``) are
        written exactly as the CLI writes them; when omitted, no output
        files are produced.
    **options:
        Any CLI option by name (``backend="ann"``, ``eps=0.1``,
        ``precursor_tol=(20, "ppm")``, ``rt_tol=30``, ``work_dir=...``,
        ``overwrite=True``, ...).  ``None`` values mean "use the
        default".  Unknown names raise ``ValueError``.
    """
    from . import cli

    if isinstance(inputs, (str, os.PathLike)):
        inputs = [inputs]
    inputs = [os.fspath(p) for p in inputs]
    if not inputs:
        raise ValueError("No input files or patterns given")

    known = _option_names()
    args: List[str] = list(inputs)
    placeholder_dir = None
    if output is not None:
        args.append(os.fspath(output))
    else:
        # The output positional is required by the shared parser; the
        # placeholder is never written to (write_outputs stays False).
        placeholder_dir = tempfile.mkdtemp(prefix="falcon_tpu_api_")
        args.append(os.path.join(placeholder_dir, "out"))
    for name, value in options.items():
        if name not in known:
            raise ValueError(
                f"Unknown option {name!r} (valid options: "
                f"{', '.join(sorted(known))})"
            )
        if value is None:
            continue
        if name in _FLAG_OPTIONS:
            if value:
                args.append(f"--{name}")
        elif name in _MULTI_OPTIONS:
            args.append(f"--{name}")
            args.extend(str(v) for v in value)
        else:
            args.extend([f"--{name}", str(value)])

    # argparse reports errors on stderr and exits; pre-parse the options
    # here under a scoped stderr redirect so programmatic callers get
    # the actual reason in the exception instead of a pointer to a
    # stream they may not surface.  cli.main re-parses the same args
    # into the process-wide config singleton (cheap and idempotent),
    # with the pipeline's live logging untouched.
    import contextlib
    import io

    from .config import config as _config

    err = io.StringIO()
    try:
        with contextlib.redirect_stderr(err):
            _config.parse(args)
    except SystemExit as exc:
        detail = err.getvalue().strip()
        raise ValueError(
            detail or f"Invalid options (parser exited {exc.code})"
        ) from None

    collect: dict = {"write_outputs": output is not None}
    try:
        try:
            rc = cli.main(args, _collect=collect)
        except SystemExit as exc:  # belt-and-braces: never exit the host
            raise ValueError(
                f"Invalid options (parser exited {exc.code})"
            ) from None
        if rc != 0:
            raise RuntimeError(f"Clustering pipeline exited {rc}")
    finally:
        if placeholder_dir is not None:
            import shutil

            shutil.rmtree(placeholder_dir, ignore_errors=True)

    a = collect["assignments"]
    return ClusterResult(
        filename=a["filename"],
        spectrum_id=a["identifier"],
        precursor_charge=a["precursor_charge"],
        precursor_mz=a["precursor_mz"],
        retention_time=a["retention_time"],
        cluster=a["cluster"],
        representatives=collect.get("representatives", []),
    )
