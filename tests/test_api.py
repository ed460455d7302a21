"""Public Python API (falcon_tpu.api.cluster).

The reference has no library API (CLI only, ``falcon/falcon.py:33-244``);
these tests pin the falcon-tpu API's contract: in-memory results matching
the CLI's CSV on the same input, optional file outputs with the CLI's
overwrite gate, and exceptions (not exit codes) for user errors.
"""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest

import falcon_tpu
from falcon_tpu import api, cli
from falcon_tpu.simulate import make_clustered_spectra, write_mgf


@pytest.fixture()
def mgf_input(tmp_path):
    spectra, truth = make_clustered_spectra(
        n_clusters=10, cluster_size=5, n_noise=15, seed=33, charges=(2, 3),
    )
    path = write_mgf(str(tmp_path / "run.mgf"), spectra)
    return tmp_path, path, spectra


def _read_csv(path):
    return pd.read_csv(path, comment="#")


def test_api_matches_cli_labels(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    result = falcon_tpu.cluster_files(
        path, work_dir=str(tmp_path / "work_api"),
    )
    assert len(result) > 0
    assert result.n_clusters == len(np.unique(result.cluster))

    out = str(tmp_path / "out_cli")
    rc = cli.main([path, out, "--work_dir", str(tmp_path / "work_cli")])
    assert rc == 0
    df = _read_csv(out + ".csv")

    # Same rows (join by spectrum_id) and same cluster PARTITION: the
    # API returns charge-major store order, the CSV natural-sorts, and
    # label numbering may differ — co-clustering must not.
    api_label = dict(zip(map(str, result.spectrum_id), result.cluster))
    csv_label = dict(zip(map(str, df["spectrum_id"]), df["cluster"]))
    assert set(api_label) == set(csv_label)
    pairs = {}
    for sid, lab in api_label.items():
        pairs.setdefault(lab, set()).add(sid)
    groups_api = {frozenset(v) for v in pairs.values()}
    pairs = {}
    for sid, lab in csv_label.items():
        pairs.setdefault(lab, set()).add(sid)
    groups_csv = {frozenset(v) for v in pairs.values()}
    assert groups_api == groups_csv

    # Metadata columns align with the labels row-for-row.
    row = 0
    assert api_label[str(result.spectrum_id[row])] == result.cluster[row]
    assert np.isfinite(result.precursor_mz).all()


def test_api_writes_outputs_when_requested(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    out = str(tmp_path / "api_out")
    result = falcon_tpu.cluster_files(
        path, out, work_dir=str(tmp_path / "work"),
        export_representatives=True, backend="ann", eps=0.1,
    )
    assert os.path.isfile(out + ".csv")
    assert os.path.isfile(out + ".mgf")
    df = _read_csv(out + ".csv")
    assert len(df) == len(result)
    # Representatives returned in memory too, as Spectrum objects.
    assert len(result.representatives) > 0
    rep = result.representatives[0]
    assert len(rep.mz) == len(rep.intensity)


def test_api_no_output_leaves_no_files(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    before = set(os.listdir(tmp_path))
    falcon_tpu.cluster_files(path, work_dir=str(tmp_path / "work"))
    after = set(os.listdir(tmp_path)) - {"work"}
    assert before == after


def test_api_overwrite_gate_raises(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    out = str(tmp_path / "exists")
    with open(out + ".csv", "w") as f:
        f.write("existing\n")
    with pytest.raises(FileExistsError):
        falcon_tpu.cluster_files(path, out, work_dir=str(tmp_path / "work"))
    # overwrite=True replaces it, like the CLI flag.
    result = falcon_tpu.cluster_files(
        path, out, work_dir=str(tmp_path / "work"), overwrite=True,
    )
    assert len(_read_csv(out + ".csv")) == len(result)


def test_api_unknown_option_raises(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    with pytest.raises(ValueError, match="Unknown option"):
        falcon_tpu.cluster_files(path, nonsense_option=1)


def test_api_invalid_value_raises_valueerror(mgf_input, tmp_path):
    tmp_path, path, _ = mgf_input
    with pytest.raises(ValueError):
        falcon_tpu.cluster_files(path, linkage="bogus",
                           work_dir=str(tmp_path / "work"))


def test_api_invalid_value_error_names_the_option(mgf_input, tmp_path):
    # The exception carries argparse's actual report (option name and
    # reason), not a pointer to stderr — programmatic callers and
    # exception logs must be able to recover WHICH option was invalid.
    tmp_path, path, _ = mgf_input
    with pytest.raises(ValueError, match="eps"):
        falcon_tpu.cluster_files(path, eps=0,
                           work_dir=str(tmp_path / "work"))


def test_api_missing_input_raises(tmp_path):
    with pytest.raises(ValueError):
        falcon_tpu.cluster_files(str(tmp_path / "nope.mgf"))
    with pytest.raises(ValueError):
        falcon_tpu.cluster_files([])


def test_api_option_forms(mgf_input, tmp_path):
    """Tuple options, None-means-default, numeric coercion."""
    tmp_path, path, _ = mgf_input
    result = falcon_tpu.cluster_files(
        path, work_dir=str(tmp_path / "work"),
        precursor_tol=(0.5, "Da"), rt_tol=None, linkage="single",
        distance_threshold=0.2,
    )
    assert len(result) > 0


def test_api_to_rows_none_charge(tmp_path):
    """NULL_CHARGE rows surface as None in to_rows()."""
    spectra, _ = make_clustered_spectra(
        n_clusters=3, cluster_size=4, n_noise=2, seed=5, charges=(2,),
    )
    # Strip the charge from every spectrum: falcon buckets them under the
    # None charge (reference falcon.py:432-434 writer keying).
    stripped = [dataclasses.replace(s, precursor_charge=None) for s in spectra]
    path = write_mgf(str(tmp_path / "nocharge.mgf"), stripped)
    result = falcon_tpu.cluster_files(path, work_dir=str(tmp_path / "work"))
    rows = result.to_rows()
    assert len(rows) == len(result)
    assert all(r["precursor_charge"] is None for r in rows)
    assert (result.precursor_charge == api.NULL_CHARGE).all()
