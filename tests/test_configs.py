"""End-to-end tests for the BASELINE.json benchmark configurations.

Config #1 (single MGF, ann defaults) is covered by test_cli.py and
bench.py; config #4 (aggressive eps + consensus representatives) by
test_consensus.py; config #5's multi-chip sharding by test_multichip.py
and __graft_entry__.dryrun_multichip.  This file covers:

- config #2: multi-file mzML input through the IVF index
  (``--ann_index ivf --n_probe 32 --n_neighbors 64``),
- config #3: the metabolomics preset (``min_peaks=3``, reduced
  ``min_mz_range``, sqrt scaling, ``min_matched_peaks=6``).
"""

import csv

import numpy as np
import pytest

from falcon_tpu import cli, metrics
from falcon_tpu.simulate import make_clustered_spectra, write_mgf, \
    write_mzml


def _read_labels(csv_path):
    with open(csv_path) as f:
        rows = [r for r in csv.reader(f) if not r[0].startswith("#")]
    idents = [r[1] for r in rows[1:]]
    labels = np.asarray([int(r[5]) for r in rows[1:]])
    truth_names = [i.split("_scan")[0].split("_member")[0] for i in idents]
    ids = {t: n for n, t in enumerate(sorted(set(truth_names)))}
    return labels, np.asarray([ids[t] for t in truth_names])


def test_config2_multifile_mzml_ivf(tmp_path):
    spectra, _ = make_clustered_spectra(
        n_clusters=30, cluster_size=6, n_noise=40, seed=13
    )
    # Split across three mzML files (multi-file ingest, one worker per
    # file like the reference).
    paths = []
    for i in range(3):
        paths.append(write_mzml(
            str(tmp_path / f"part{i}.mzml"), spectra[i::3],
            zlib_compress=(i % 2 == 0),
        ))
    out = str(tmp_path / "out")
    rc = cli.main([
        *paths, out, "--work_dir", str(tmp_path / "work"),
        "--backend", "ann", "--ann_index", "ivf",
        "--n_probe", "32", "--n_neighbors", "64",
        "--fragment_tol", "0.05", "--overwrite",
    ])
    assert rc == 0
    labels, truth = _read_labels(out + ".csv")
    assert len(labels) == len(spectra)
    assert metrics.cluster_purity(labels, truth) > 0.95
    assert metrics.clustered_fraction(labels) > 0.5
    # Spectra from all three files made it in.
    with open(out + ".csv") as f:
        rows = [r for r in csv.reader(f) if not r[0].startswith("#")][1:]
    assert len({r[0] for r in rows}) == 3


def test_config3_metabolomics_preset(tmp_path):
    # Metabolomics-like spectra: few fragments, narrow m/z span.
    spectra, _ = make_clustered_spectra(
        n_clusters=20, cluster_size=5, n_noise=30,
        n_peaks=(6, 15), mz_range=(101.0, 500.0),
        precursor_mz_range=(150.0, 480.0), charges=(1,),
        seed=17,
    )
    inp = write_mgf(str(tmp_path / "in.mgf"), spectra)
    out = str(tmp_path / "out")
    rc = cli.main([
        inp, out, "--work_dir", str(tmp_path / "work"),
        "--min_peaks", "3", "--min_mz_range", "50",
        "--scaling", "root", "--min_matched_peaks", "6",
        "--max_mz", "500", "--overwrite",
    ])
    assert rc == 0
    labels, truth = _read_labels(out + ".csv")
    assert metrics.cluster_purity(labels, truth) > 0.95
    assert metrics.clustered_fraction(labels) > 0.4
    # The manifest header records the preset.
    with open(out + ".csv") as f:
        header = [line for line in f if line.startswith("#")]
    assert any("min_peaks = 3" in line for line in header)
    assert any("scaling = root" in line for line in header)
    assert any("min_matched_peaks = 6" in line for line in header)


def test_config3_metabolomics_preset_ann(tmp_path):
    """The same preset through the ann backend (hashing variant
    exercised with root scaling and min_matched_peaks via the exact
    rerank)."""
    spectra, _ = make_clustered_spectra(
        n_clusters=20, cluster_size=5, n_noise=30,
        n_peaks=(6, 15), mz_range=(101.0, 500.0),
        precursor_mz_range=(150.0, 480.0), charges=(1,),
        seed=19,
    )
    inp = write_mgf(str(tmp_path / "in.mgf"), spectra)
    out = str(tmp_path / "out")
    rc = cli.main([
        inp, out, "--work_dir", str(tmp_path / "work"),
        "--backend", "ann", "--min_peaks", "3", "--min_mz_range", "50",
        "--scaling", "root", "--min_matched_peaks", "6",
        "--max_mz", "500", "--overwrite",
    ])
    assert rc == 0
    labels, truth = _read_labels(out + ".csv")
    assert metrics.cluster_purity(labels, truth) > 0.95
