import os

import pytest

from falcon_tpu.config import Config


def test_defaults_match_reference():
    """Defaults must match reference falcon/config.py:52-183."""
    cfg = Config()
    cfg.parse(["in.mgf", "out"])
    assert cfg.input_filenames == ["in.mgf"]
    assert cfg.output_filename == "out"
    assert cfg.work_dir is None
    assert cfg.overwrite is False
    assert cfg.export_representatives is False
    assert cfg.precursor_tol == [20.0, "ppm"]
    assert cfg.rt_tol is None
    assert cfg.fragment_tol == 0.05
    assert cfg.linkage == "complete"
    assert cfg.distance_threshold == 0.1
    assert cfg.min_matched_peaks == 0
    assert cfg.batch_size == 2**15
    assert cfg.min_peaks == 5
    assert cfg.min_mz_range == 250.0
    assert cfg.min_mz == 101.0
    assert cfg.max_mz == 1500.0
    assert cfg.remove_precursor_tol == 1.5
    assert cfg.min_intensity == 0.01
    assert cfg.max_peaks_used == 50
    assert cfg.scaling == "off"
    # Published-algorithm knobs restored (reference README.md:101-117).
    assert cfg.backend == "exact"
    assert cfg.eps == 0.1
    assert cfg.low_dim == 400


def test_cli_overrides():
    cfg = Config()
    cfg.parse(
        "a.mgf b.mzML out --precursor_tol 0.5 Da --linkage single "
        "--overwrite --max_peaks_used 25"
    )
    assert cfg.input_filenames == ["a.mgf", "b.mzML"]
    assert cfg.precursor_tol == [0.5, "Da"]
    assert cfg.linkage == "single"
    assert cfg.overwrite is True
    assert cfg.max_peaks_used == 25


def test_config_file_precedence(tmp_path):
    ini = tmp_path / "my.ini"
    ini.write_text(
        "fragment_tol = 0.02\n"
        "linkage = average\n"
        "overwrite = true\n"
        "precursor_tol = 10 ppm\n"
    )
    cfg = Config()
    cfg.parse(["-c", str(ini), "in.mgf", "out", "--linkage", "single"])
    # File value applies...
    assert cfg.fragment_tol == 0.02
    assert cfg.overwrite is True
    assert cfg.precursor_tol == [10.0, "ppm"]
    # ...but the CLI wins over the file.
    assert cfg.linkage == "single"


def test_uninitialized_raises():
    cfg = Config()
    with pytest.raises(RuntimeError):
        _ = cfg.fragment_tol


def test_unknown_option_raises_attribute_error():
    """Unknown options surface as AttributeError (hasattr/getattr
    semantics), not a leaked KeyError."""
    import pytest

    from falcon_tpu.config import Config

    config = Config()
    config.parse(["in.mgf", "out"])
    assert not hasattr(config, "definitely_not_an_option")
    with pytest.raises(AttributeError):
        config.definitely_not_an_option


@pytest.mark.parametrize("content,fragment", [
    ("eps = not_a_number\n", "invalid value 'not_a_number'"),
    ("unknown_option = 5\n", "unknown option(s)"),
    ("precursor_tol = 20\n", "needs 2 values"),
    ("backend = bogus\n", "is not one of"),
])
def test_config_file_errors_are_clean(tmp_path, capsys, content, fragment):
    """Config-file values bypass argparse validation (set_defaults), so
    the file layer validates itself: bad values exit via parser.error
    (SystemExit 2 + message), never a leaked traceback."""
    ini = tmp_path / "bad.ini"
    ini.write_text(content)
    cfg = Config()
    with pytest.raises(SystemExit) as exc:
        cfg.parse(["-c", str(ini), "in.mgf", "out"])
    assert exc.value.code == 2
    assert fragment in capsys.readouterr().err


def test_config_file_binary_garbage_is_clean(tmp_path, capsys):
    ini = tmp_path / "binary.ini"
    ini.write_bytes(bytes([0, 255, 254, 150]) * 10)
    cfg = Config()
    with pytest.raises(SystemExit) as exc:
        cfg.parse(["-c", str(ini), "in.mgf", "out"])
    assert exc.value.code == 2
    assert "could not read config file" in capsys.readouterr().err


def test_cli_non_numeric_precursor_tol_is_clean(capsys):
    cfg = Config()
    with pytest.raises(SystemExit) as exc:
        cfg.parse(["--precursor_tol", "abc", "ppm", "in.mgf", "out"])
    assert exc.value.code == 2
    assert "invalid numeric value" in capsys.readouterr().err


@pytest.mark.parametrize("argv, fragment", [
    (["--fragment_tol", "0"], "--fragment_tol"),
    (["--fragment_tol", "-1"], "--fragment_tol"),
    (["--fragment_tol", "nan"], "--fragment_tol"),
    (["--eps", "0"], "--eps"),
    (["--eps", "-0.5"], "--eps"),
    (["--eps", "nan"], "--eps"),
    (["--low_dim", "0"], "--low_dim"),
    (["--max_peaks_used", "0"], "--max_peaks_used"),
    (["--min_peaks", "-3"], "--min_peaks"),
    (["--n_neighbors", "0"], "--n_neighbors"),
    (["--n_probe", "-1"], "--n_probe"),
    (["--devices", "0"], "--devices"),
    (["--rt_tol", "-5"], "--rt_tol"),
    (["--rt_tol", "inf"], "--rt_tol"),
    (["--min_intensity", "-0.1"], "--min_intensity"),
    (["--min_matched_peaks", "-1"], "--min_matched_peaks"),
    (["--max_mz", "nan"], "--max_mz"),
    (["--precursor_tol", "-5", "ppm"], "--precursor_tol"),
    (["--precursor_tol", "nan", "Da"], "--precursor_tol"),
])
def test_nonsensical_numeric_values_rejected_cleanly(
        capsys, argv, fragment):
    """Zero/negative/NaN values the pipeline cannot mean exit with a
    clean parser error naming the option (SystemExit 2), never a
    traceback or a silently-degenerate run (e.g. fragment_tol=0 used to
    die on a modulo-by-zero deep in bin sizing)."""
    cfg = Config()
    with pytest.raises(SystemExit) as exc:
        cfg.parse(argv + ["in.mgf", "out"])
    assert exc.value.code == 2
    assert fragment in capsys.readouterr().err


def test_boundary_values_still_accepted():
    cfg = Config()
    cfg.parse(["--precursor_tol", "0", "Da", "--rt_tol", "0",
               "--min_intensity", "0", "--min_peaks", "1",
               "in.mgf", "out"])
    assert cfg.precursor_tol == [0.0, "Da"]
    assert cfg.rt_tol == 0.0
