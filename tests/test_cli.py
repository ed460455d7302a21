import os

import numpy as np
import pandas as pd
import pytest

from falcon_tpu import cli
from falcon_tpu.simulate import make_clustered_spectra, write_mgf


@pytest.fixture()
def mgf_inputs(tmp_path):
    spectra, truth = make_clustered_spectra(
        n_clusters=10, cluster_size=5, n_noise=15, seed=21, charges=(2, 3),
    )
    half = len(spectra) // 2
    f1 = write_mgf(str(tmp_path / "run1.mgf"), spectra[:half])
    f2 = write_mgf(str(tmp_path / "run2.mgf"), spectra[half:])
    return tmp_path, [f1, f2], spectra, truth


def _read_csv(path):
    return pd.read_csv(path, comment="#")


def test_cli_end_to_end(mgf_inputs):
    tmp_path, files, spectra, truth = mgf_inputs
    out = str(tmp_path / "out")
    work = str(tmp_path / "work")
    rc = cli.main(
        files + [out, "--work_dir", work, "--export_representatives"]
    )
    assert rc == 0
    csv_path = out + ".csv"
    assert os.path.isfile(csv_path)
    # Header manifest present (reference falcon.py:483-524).
    with open(csv_path) as f:
        header = [line for line in f if line.startswith("#")]
    assert any("precursor_tol = 20.00 ppm" in line for line in header)
    assert any("linkage = complete" in line for line in header)

    df = _read_csv(csv_path)
    assert list(df.columns) == [
        "filename", "spectrum_id", "precursor_charge", "precursor_mz",
        "retention_time", "cluster",
    ]
    # Every kept spectrum labeled; labels globally unique across charges.
    assert df["cluster"].notna().all()
    by_charge = df.groupby("precursor_charge")["cluster"]
    ranges = {c: (g.min(), g.max()) for c, g in by_charge}
    charges = sorted(ranges)
    for c1, c2 in zip(charges, charges[1:]):
        assert ranges[c1][1] < ranges[c2][0]
    # Natural sort by (filename, spectrum_id).
    assert (df["filename"].values[:-1] <= df["filename"].values[1:]).all()

    # Representatives MGF exists with >= 1 spectrum per cluster... exactly
    # one medoid per final cluster plus noise singletons = n_clusters.
    from falcon_tpu.ms_io import mgf_io

    reps = list(mgf_io.get_spectra(out + ".mgf"))
    assert len(reps) == df["cluster"].nunique()

    # Clusters recover the ground truth with high purity.
    truth_by_id = {s.identifier: t for s, t in zip(spectra, truth)}
    df["truth"] = [truth_by_id[i] for i in df["spectrum_id"]]
    purity_num = sum(
        g["truth"].value_counts().iloc[0]
        for _, g in df.groupby("cluster")
    )
    assert purity_num / len(df) > 0.95


def test_cli_overwrite_gate_and_resume(mgf_inputs):
    tmp_path, files, _, _ = mgf_inputs
    out = str(tmp_path / "out2")
    work = str(tmp_path / "work2")
    assert cli.main(files + [out, "--work_dir", work]) == 0
    # Second run without --overwrite aborts with exit code 1 (reference
    # falcon.py:89-122).
    assert cli.main(files + [out, "--work_dir", work]) == 1
    # With --overwrite it re-runs fine.
    assert cli.main(files + [out, "--work_dir", work, "--overwrite"]) == 0

    # Resume: removing outputs but keeping work_dir skips ingest (charge
    # cache present, reference falcon.py:143-149).
    os.remove(out + ".csv")
    import falcon_tpu.ingest as ingest

    called = []
    original = ingest.prepare_spectra

    def spy(*args, **kwargs):
        called.append(1)
        return original(*args, **kwargs)

    ingest.prepare_spectra = spy
    try:
        assert cli.main(files + [out, "--work_dir", work]) == 0
    finally:
        ingest.prepare_spectra = original
    assert not called  # ingest skipped on resume


def test_cli_corrupted_store_drops_charge_and_continues(mgf_inputs,
                                                        caplog):
    """Resuming a work_dir whose persisted store was damaged (truncated
    / garbage / deleted shard columns) drops the affected charge with an
    error and completes, mirroring the reference dropping an unopenable
    Lance dataset (falcon/falcon.py:315-322) — it must never crash."""
    import glob as glob_mod
    import logging

    import numpy as np

    tmp_path, files, _, _ = mgf_inputs
    out = str(tmp_path / "out_corrupt")
    work = str(tmp_path / "work_corrupt")
    assert cli.main(files + [out, "--work_dir", work]) == 0
    victims = sorted(glob_mod.glob(
        os.path.join(work, "spectra", "**", "*.npy"), recursive=True))
    rng = np.random.default_rng(5)
    for mode in ("truncate", "garbage", "delete"):
        v = victims[int(rng.integers(0, len(victims)))]
        if mode == "truncate":
            with open(v, "r+b") as f:
                f.truncate(max(1, os.path.getsize(v) // 3))
        elif mode == "garbage":
            with open(v, "wb") as f:
                f.write(b"\x00garbage not an npy file")
        else:
            os.remove(v)
        os.remove(out + ".csv")
        caplog.clear()
        with caplog.at_level(logging.ERROR, logger="falcon_tpu"):
            rc = cli.main(files + [out, "--work_dir", work])
        # Either the damaged charge was dropped (other charges still
        # exported, rc 0) or every charge was damaged (rc 1) — never an
        # unhandled exception.
        assert rc in (0, 1)
        assert any("Failed to open dataset" in r.message
                   for r in caplog.records)


def test_cli_corrupted_charge_cache_reingests(mgf_inputs, caplog):
    """A corrupt/truncated charge cache is treated as an incomplete
    ingest commit record: the partial store is discarded and re-ingested
    with warnings, producing a complete output — never a crash."""
    import glob as glob_mod
    import logging

    tmp_path, files, spectra, _ = mgf_inputs
    out = str(tmp_path / "out_cache")
    work = str(tmp_path / "work_cache")
    assert cli.main(files + [out, "--work_dir", work]) == 0
    n_rows = sum(1 for line in open(out + ".csv")
                 if not line.startswith("#")) - 1
    for payload in (b"\x80\x04garbage", b"", b'["unclosed'):
        cache = glob_mod.glob(os.path.join(work, "**", "charges*"),
                              recursive=True)[0]
        with open(cache, "wb") as f:
            f.write(payload)
        os.remove(out + ".csv")
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="falcon_tpu"):
            assert cli.main(files + [out, "--work_dir", work]) == 0
        assert any("Unreadable charge cache" in r.message
                   for r in caplog.records)
        rows = sum(1 for line in open(out + ".csv")
                   if not line.startswith("#")) - 1
        assert rows == n_rows


def test_cli_interrupted_ingest_restarts_cleanly(mgf_inputs, caplog):
    """A work_dir whose ingest crashed midway (shards on disk, no charge
    cache — the cache is only written when ingest completes) must be
    discarded and re-ingested, not stacked with duplicate shards."""
    import logging

    from falcon_tpu import ingest
    from falcon_tpu.store.store import SpectrumStore

    tmp_path, files, spectra, _ = mgf_inputs
    out = str(tmp_path / "out_interrupted")
    work = str(tmp_path / "work_interrupted")
    # Simulate the crash: one input file fully ingested, then the
    # process died before the remaining files and the charge cache.
    store = SpectrumStore(os.path.join(work, "spectra"))
    ingest.ingest_file_to_store(
        files[0], 0, store.root,
        dict(min_peaks=5, min_mz_range=250.0, mz_min=101.0, mz_max=1500.0,
             remove_precursor_tolerance=1.5, min_intensity=0.01,
             max_peaks_used=50, scaling=None),
    )
    assert store.load_charges() is None
    with caplog.at_level(logging.WARNING, logger="falcon_tpu"):
        assert cli.main(files + [out, "--work_dir", work]) == 0
    assert "partially-written" in caplog.text
    df = _read_csv(out + ".csv")
    # Every input spectrum appears exactly once (no duplicated shards).
    assert len(df) == len(spectra)
    assert not df.duplicated(["filename", "spectrum_id"]).any()


def test_cli_atomic_export_publication(mgf_inputs):
    """Outputs are written to .partial paths and renamed on success: a
    stale .partial from a crashed export is discarded, the final files
    are complete, and no .partial files survive a successful run."""
    tmp_path, files, spectra, _ = mgf_inputs
    out = str(tmp_path / "out_atomic")
    with open(out + ".csv.partial", "w") as f:
        f.write("garbage from a crashed export\n")
    rc = cli.main(files + [out, "--work_dir",
                           str(tmp_path / "work_atomic"),
                           "--export_representatives"])
    assert rc == 0
    assert not os.path.exists(out + ".csv.partial")
    assert not os.path.exists(out + ".mgf.partial")
    with open(out + ".csv") as f:
        content = f.read()
    assert "garbage" not in content
    assert len(_read_csv(out + ".csv")) == len(spectra)
    assert os.path.isfile(out + ".mgf")


def test_cli_missing_input_clean_error(tmp_path, caplog):
    """User-input errors (no matching files, non-existing file, unknown
    extension) exit 1 with a logged error, not a traceback."""
    import logging

    out = str(tmp_path / "out_missing")
    with caplog.at_level(logging.ERROR, logger="falcon_tpu"):
        rc = cli.main([str(tmp_path / "nope_*.mgf"), out])
    assert rc == 1
    assert "No input peak files found" in caplog.text

    with open(tmp_path / "data.xyz", "w") as f:
        f.write("not a peak file\n")
    with caplog.at_level(logging.ERROR, logger="falcon_tpu"):
        rc = cli.main([str(tmp_path / "data.xyz"), out])
    assert rc == 1
    assert "Unknown spectrum file type" in caplog.text


def test_cli_gzipped_inputs(mgf_inputs):
    """Mixed plain + gzipped inputs cluster identically to all-plain
    inputs, with the .gz path recorded in the CSV filename column."""
    import gzip
    import shutil

    tmp_path, files, spectra, _ = mgf_inputs
    gz_path = str(tmp_path / "run2.mgf.gz")
    with open(files[1], "rb") as f_in, gzip.open(gz_path, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    out_plain = str(tmp_path / "out_plain")
    out_gz = str(tmp_path / "out_gz")
    assert cli.main(files + [out_plain]) == 0
    assert cli.main([files[0], gz_path, out_gz]) == 0
    df_plain = _read_csv(out_plain + ".csv")
    df_gz = _read_csv(out_gz + ".csv")
    assert len(df_gz) == len(df_plain) == len(spectra)
    assert set(df_gz["filename"]) == {
        os.path.abspath(files[0]), os.path.abspath(gz_path),
    }
    # Same clustering structure on the same underlying spectra.
    key = ["spectrum_id"]
    merged = df_plain.merge(df_gz, on=key, suffixes=("_p", "_g"))
    import pandas as pd

    pairs_p = merged.groupby("cluster_p")["spectrum_id"].apply(frozenset)
    pairs_g = merged.groupby("cluster_g")["spectrum_id"].apply(frozenset)
    assert set(pairs_p) == set(pairs_g)


def test_cli_msp_input(mgf_inputs):
    """An MSP spectral library (the format the reference's docstring
    promises but never implements) clusters end-to-end like the same
    spectra in MGF form."""
    from test_fuzz import _write_msp

    tmp_path, files, spectra, _ = mgf_inputs
    msp_path = str(tmp_path / "lib.msp")
    _write_msp(msp_path, spectra)
    out = str(tmp_path / "out_msp")
    assert cli.main([msp_path, out]) == 0
    df = _read_csv(out + ".csv")
    assert len(df) == len(spectra)
    ref_out = str(tmp_path / "out_ref_mgf")
    assert cli.main(files + [ref_out]) == 0
    df_ref = _read_csv(ref_out + ".csv")
    merged = df.merge(df_ref, on="spectrum_id", suffixes=("_m", "_r"))
    pairs_m = merged.groupby("cluster_m")["spectrum_id"].apply(frozenset)
    pairs_r = merged.groupby("cluster_r")["spectrum_id"].apply(frozenset)
    assert set(pairs_m) == set(pairs_r)


def test_cli_deterministic(mgf_inputs):
    tmp_path, files, _, _ = mgf_inputs
    out_a = str(tmp_path / "det_a")
    out_b = str(tmp_path / "det_b")
    assert cli.main(files + [out_a]) == 0
    assert cli.main(files + [out_b]) == 0
    df_a = _read_csv(out_a + ".csv")
    df_b = _read_csv(out_b + ".csv")
    pd.testing.assert_frame_equal(df_a, df_b)


def test_cli_ann_backend(mgf_inputs):
    tmp_path, files, spectra, truth = mgf_inputs
    out = str(tmp_path / "out_ann")
    rc = cli.main(files + [out, "--backend", "ann", "--eps", "0.3",
                           "--export_representatives"])
    assert rc == 0
    df = _read_csv(out + ".csv")
    assert len(df) == len(spectra)
    with open(out + ".csv") as f:
        header = [line for line in f if line.startswith("#")]
    assert any("backend = ann" in line for line in header)
    assert any("eps = 0.3" in line for line in header)
    truth_by_id = {s.identifier: t for s, t in zip(spectra, truth)}
    df["truth"] = [truth_by_id[i] for i in df["spectrum_id"]]
    purity_num = sum(
        g["truth"].value_counts().iloc[0]
        for _, g in df.groupby("cluster")
    )
    assert purity_num / len(df) > 0.95


def test_cli_export_interleaves_natsort_tied_filenames(tmp_path):
    # 'a1.mgf' and 'a01.mgf' have identical natural-sort keys; the
    # reference's row-wise (filename, spectrum_id) tuple sort interleaves
    # their rows by spectrum id rather than grouping per file (advisor
    # round-2 finding).
    spectra, _ = make_clustered_spectra(
        n_clusters=4, cluster_size=4, n_noise=8, seed=33,
    )
    half = len(spectra) // 2
    # Give the two files disjoint, alternating spectrum ids so the
    # interleaving is observable.
    for i, s in enumerate(spectra[:half]):
        s.identifier = f"idx={2 * i}"
    for i, s in enumerate(spectra[half:]):
        s.identifier = f"idx={2 * i + 1}"
    f1 = write_mgf(str(tmp_path / "a1.mgf"), spectra[:half])
    f2 = write_mgf(str(tmp_path / "a01.mgf"), spectra[half:])
    out = str(tmp_path / "out_tied")
    assert cli.main([f1, f2, out]) == 0
    df = _read_csv(out + ".csv")
    ids = [int(s.split("=")[1]) for s in df["spectrum_id"]]
    assert ids == sorted(ids)  # interleaved by id, not grouped per file
    assert df["filename"].nunique() == 2


def test_cli_ann_index_exact(mgf_inputs):
    # --ann_index exact: hash-free banded exact-cosine oracle path.
    # Labels must agree with the default (prefilter + exact rerank) ann
    # run, which is label-identical to exhaustive exact scoring.
    tmp_path, files, spectra, truth = mgf_inputs
    out_exact = str(tmp_path / "out_idx_exact")
    out_default = str(tmp_path / "out_idx_default")
    assert cli.main(files + [out_exact, "--backend", "ann",
                             "--ann_index", "exact", "--eps", "0.3"]) == 0
    assert cli.main(files + [out_default, "--backend", "ann",
                             "--eps", "0.3"]) == 0
    df_e = _read_csv(out_exact + ".csv")
    df_d = _read_csv(out_default + ".csv")
    assert len(df_e) == len(spectra)
    with open(out_exact + ".csv") as f:
        header = [line for line in f if line.startswith("#")]
    assert any("ann_index = exact" in line for line in header)
    # Same partition: pairwise co-membership agreement.
    merged = df_e.merge(df_d, on="spectrum_id", suffixes=("_e", "_d"))
    for _, g in merged.groupby("cluster_e"):
        assert g["cluster_d"].nunique() == 1
    for _, g in merged.groupby("cluster_d"):
        assert g["cluster_e"].nunique() == 1
