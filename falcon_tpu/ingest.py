"""Peak-file ingest: parallel parsing + preprocessing into the store.

Mirrors the reference's ingest/partition subsystem
(``falcon/falcon.py:247-480``): peak files are parsed and preprocessed by
a pool of worker processes (one task per file, pool size
min(#files, #cpus), reference ``falcon.py:267``), and the processed
spectra are appended in 10k batches to per-charge datasets.

This module deliberately imports no JAX so ingest worker processes never
touch the TPU plugin (the chip is exclusive to the parent process).
"""

import glob
import logging
import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor, as_completed
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .ms_io import ms_io
from .preprocess import spectrum as prep
from .store.store import SpectrumStore

logger = logging.getLogger("falcon_tpu")

FileResult = Tuple[Union[List[dict], Dict[str, np.ndarray]], int]


def read_and_process_file(
    filename: str, process_kwargs: Dict, allow_native: bool = True
) -> FileResult:
    """Parse one peak file and preprocess its spectra.

    Returns (result, low-quality count) where result is either a columnar
    batch dict (the native C++ fast path — parse + the full preprocessing
    chain for all three formats: MGF in ``native/falcon_ingest.cc``,
    mzML/mzXML in ``native/falcon_mzml.cc``) or a list of processed
    spectrum dicts (the pure-Python fallback when the native library is
    unavailable or returns nothing for a non-empty file).  Mirrors
    reference ``_read_spectra`` (``falcon/falcon.py:362-392``), including
    storing the absolute filename on each spectrum.
    """
    filename = os.path.abspath(filename)
    lower = filename.lower()
    native_fmt = next((fmt for fmt in (".mgf", ".mzml", ".mzxml")
                       if lower.endswith(fmt)), None)
    if allow_native and native_fmt:
        from . import native

        ingest_fn = {".mgf": native.mgf_ingest,
                     ".mzml": native.mzml_ingest,
                     ".mzxml": native.mzxml_ingest}[native_fmt]
        batch = ingest_fn(filename, **process_kwargs)
        if (
            batch is not None
            and batch.get("n_read", 1) == 0
            and not batch.get("truncated")
            and os.path.getsize(filename) > 0
        ):
            # The native scanner found no spectrum elements in a non-empty
            # file (e.g. unusual whitespace/namespacing in the XML): fall
            # back to the Python reader instead of silently dropping the
            # file's spectra.
            logger.warning(
                "Native parser found no spectra in non-empty file %s; "
                "falling back to the Python reader", filename,
            )
            batch = None
        if batch is not None:
            if batch.get("truncated"):
                logger.warning(
                    "Failed to read file %s: truncated document "
                    "(parsed %d complete spectra)",
                    filename, batch["n_read"],
                )
            n = len(batch["precursor_mz"])
            batch["filename"] = np.repeat(np.array([filename]), n)
            return batch, batch["n_low_quality"]
    low_quality_counter = 0
    spectra = []
    for spec in ms_io.get_spectra(filename):
        spec.filename = filename
        processed = prep.process_spectrum(spec, **process_kwargs)
        if processed is None:
            low_quality_counter += 1
        else:
            spectra.append(processed)
    return spectra, low_quality_counter


def ingest_file_to_store(
    filename: str,
    file_index: int,
    store_root: str,
    process_kwargs: Dict,
) -> Tuple[List[str], int, int]:
    """Worker entry: parse + preprocess one file and write shards
    directly into the store (no spectra cross the process boundary —
    shard names are namespaced by the input file index, so concurrent
    writers never collide and runs stay deterministic).

    Returns (charge keys written, spectra kept, low-quality count).
    """
    store = SpectrumStore(store_root)
    writer = store.writer(batch_size=10_000,
                          shard_prefix=f"{file_index:04d}_")
    result, lqc = read_and_process_file(filename, process_kwargs)
    charges: set = set()
    if isinstance(result, dict):
        n_kept = len(result["precursor_mz"])
        charges.update(writer.add_batch(result))
    else:
        n_kept = len(result)
        from .store.store import charge_key

        for spec in result:
            charges.add(charge_key(spec["precursor_charge"]))
            writer.add(spec)
    writer.close()
    return sorted(charges), n_kept, lqc


def prepare_spectra(
    store: SpectrumStore,
    input_patterns: List[str],
    process_kwargs: Dict,
    max_workers: Optional[int] = None,
) -> List[Optional[int]]:
    """Read all input files into per-charge datasets; returns the charges.

    Mirrors reference ``_prepare_spectra`` (``falcon/falcon.py:247-328``):
    glob expansion, process-parallel parsing, 10k-batch appends, per-charge
    partitioning (a ``None`` charge gets its own bucket), and the
    read/skip counters.  Workers write shards directly (one shard
    namespace per input file) instead of shipping spectra back through
    the process boundary.
    """
    input_filenames = [
        fn for pattern in input_patterns for fn in sorted(glob.glob(pattern))
    ]
    logger.info("Read spectra from %d peak file(s)", len(input_filenames))
    if not input_filenames:
        raise ValueError("No input peak files found")
    if max_workers is None:
        max_workers = min(len(input_filenames), multiprocessing.cpu_count())

    charges = set()
    low_quality_counter, n_spectra = 0, 0

    def consume(result):
        nonlocal low_quality_counter, n_spectra
        charge_keys, n_kept, lqc = result
        low_quality_counter += lqc
        n_spectra += n_kept
        for key in charge_keys:
            charges.add(None if key == "None" else int(key))

    if max_workers <= 1 or len(input_filenames) == 1:
        for idx, filename in enumerate(input_filenames):
            consume(ingest_file_to_store(
                filename, idx, store.root, process_kwargs
            ))
    else:
        # spawn (not fork): the parent may hold a live TPU client.
        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(
            max_workers=max_workers, mp_context=ctx
        ) as pool:
            futures = [
                pool.submit(ingest_file_to_store, fn, idx, store.root,
                            process_kwargs)
                for idx, fn in enumerate(input_filenames)
            ]
            for future in as_completed(futures):
                consume(future.result())

    logger.info(
        "Read %d spectra from %d peak files", n_spectra,
        len(input_filenames),
    )
    logger.info("Skipped %d low-quality spectra", low_quality_counter)
    charge_list = sorted(
        charges, key=lambda c: (c is None, c if c is not None else 0)
    )
    store.save_charges(charge_list)
    return charge_list
