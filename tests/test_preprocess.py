import numpy as np
import pytest

from falcon_tpu.ms_io.containers import Spectrum
from falcon_tpu.preprocess import spectrum as prep


def _spec(mz, intensity, precursor_mz=500.0, charge=2):
    return Spectrum(
        "s", precursor_mz, charge,
        np.asarray(mz, np.float32), np.asarray(intensity, np.float32), 10.0,
    )


def test_get_dim_matches_reference_semantics():
    # Reference spectrum.py:172-199 with defaults (101, 1500, 0.05).
    n_bins, start, end = prep.get_dim(101.0, 1500.0, 0.05)
    assert start <= 101.0 < start + 0.05 + 1e-6
    assert end - 0.05 - 1e-6 < 1500.0 <= end
    assert n_bins == int(np.ceil((end - start) / 0.05))


def test_mz_range_restriction_and_validity():
    spec = _spec([50, 150, 300, 400, 600, 1600], [1, 2, 3, 4, 5, 6])
    out = prep.process_spectrum(
        spec, min_peaks=4, min_mz_range=250, mz_min=101, mz_max=1500,
    )
    # Peaks 50 and 1600 are dropped; 4 remain covering 450 m/z.
    np.testing.assert_allclose(out["mz"], [150, 300, 400, 600])
    # Rejection when too few peaks survive.
    assert (
        prep.process_spectrum(
            spec, min_peaks=5, min_mz_range=250, mz_min=101, mz_max=1500
        )
        is None
    )
    # Rejection when the m/z span is too small.
    spec2 = _spec([200, 210, 220, 230, 240], np.ones(5))
    assert (
        prep.process_spectrum(spec2, min_peaks=5, min_mz_range=250) is None
    )


def test_remove_precursor_peak_all_charges():
    # Charge 2 precursor at 500: removal windows at 500 (c=2) and
    # (500 - proton)*2/1 + proton = 998.99... (c=1).
    singly = (500.0 - prep.PROTON) * 2 + prep.PROTON
    spec = _spec(
        [150.0, 499.0, 500.0, 501.0, singly, 700.0, 900.0],
        [1.0, 1.0, 5.0, 1.0, 2.0, 1.0, 1.0],
        precursor_mz=500.0,
        charge=2,
    )
    out = prep.process_spectrum(
        spec, min_peaks=2, min_mz_range=100,
        remove_precursor_tolerance=1.5,
    )
    # 499/500/501 within 1.5 Da of 500, and the singly-charged ion removed.
    np.testing.assert_allclose(out["mz"], [150.0, 700.0, 900.0])


def test_none_charge_treated_as_one():
    # Reference spectrum.py:139-149: None charge -> temporarily 1, so only
    # the precursor m/z window itself is removed.
    spec = _spec(
        [150.0, 500.0, 700.0, 999.0, 1000.0],
        np.ones(5),
        precursor_mz=500.0,
        charge=None,
    )
    out = prep.process_spectrum(
        spec, min_peaks=2, min_mz_range=100,
        remove_precursor_tolerance=1.5,
    )
    np.testing.assert_allclose(out["mz"], [150.0, 700.0, 999.0, 1000.0])
    assert out["precursor_charge"] is None


def test_intensity_filter_and_top_k():
    mz = np.arange(100.0, 100.0 + 10 * 40, 40.0)
    intensity = np.array([100, 0.5, 30, 20, 10, 5, 4, 3, 2, 1.0])
    spec = _spec(mz, intensity)
    out = prep.process_spectrum(
        spec, min_peaks=2, min_mz_range=100,
        min_intensity=0.01, max_peaks_used=4,
    )
    # 0.5 < 0.01*100 = 1 -> dropped by the relative filter; top-4 of the
    # rest by intensity: 100, 30, 20, 10.
    np.testing.assert_allclose(out["mz"], [mz[0], mz[2], mz[3], mz[4]])


def test_scaling_and_l2_norm():
    mz = [100, 400, 700, 1000]
    intensity = [1.0, 4.0, 9.0, 16.0]
    # root scaling -> sqrt -> [1, 2, 3, 4], then L2-normalized.
    out = prep.process_spectrum(
        _spec(mz, intensity), min_peaks=2, min_mz_range=100,
        scaling="root", max_peaks_used=50,
    )
    expected = np.sqrt([1.0, 4.0, 9.0, 16.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(out["intensity"], expected, rtol=1e-6)
    assert abs(np.linalg.norm(out["intensity"]) - 1.0) < 1e-6

    # log scaling -> log2(x + 1).
    out = prep.process_spectrum(
        _spec(mz, intensity), min_peaks=2, min_mz_range=100,
        scaling="log", max_peaks_used=50,
    )
    expected = np.log2(np.asarray(intensity) + 1.0)
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(out["intensity"], expected, rtol=1e-6)

    # rank scaling: most intense peak gets rank max_rank.
    out = prep.process_spectrum(
        _spec(mz, intensity), min_peaks=2, min_mz_range=100,
        scaling="rank", max_peaks_used=50,
    )
    expected = np.array([47.0, 48.0, 49.0, 50.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(out["intensity"], expected, rtol=1e-6)

    # rank scaling with no peak cap: max_rank defaults to the number of
    # retained peaks instead of raising on None.
    out = prep.process_spectrum(
        _spec(mz, intensity), min_peaks=2, min_mz_range=100,
        scaling="rank", max_peaks_used=None,
    )
    expected = np.array([1.0, 2.0, 3.0, 4.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(out["intensity"], expected, rtol=1e-6)


def test_output_dict_schema():
    out = prep.process_spectrum(
        _spec([100, 300, 600, 900], [1, 2, 3, 4]),
        min_peaks=2, min_mz_range=100,
    )
    assert set(out.keys()) == {
        "identifier", "precursor_mz", "precursor_charge", "mz",
        "intensity", "retention_time", "filename",
    }
    assert out["mz"].dtype == np.float32
    assert out["intensity"].dtype == np.float32


def test_min_peaks_zero_empty_spectrum_rejected():
    """min_peaks=0 with a zero-peak spectrum is invalid (no m/z span),
    not an IndexError on the empty array."""
    from falcon_tpu.ms_io.containers import Spectrum

    empty = Spectrum(
        "empty", 400.0, 2, np.array([], np.float32),
        np.array([], np.float32), -1.0,
    )
    assert prep.process_spectrum(
        empty, min_peaks=0, min_mz_range=0.0
    ) is None


def test_binning_dims_delegates_to_get_dim():
    """The vectorizer's bin geometry and the preprocessing layer's must
    agree bit-for-bit (a float64 re-implementation rounded boundary
    values differently from get_dim's float32 arithmetic)."""
    from falcon_tpu.ops.hashing import binning_dims

    for bounds in ((101.0, 1500.0, 0.05), (100.1, 1499.9, 0.3),
                   (50.05, 2500.07, 1.0005)):
        assert binning_dims(*bounds) == prep.get_dim(*bounds)


def test_non_finite_metadata_rejected():
    """NaN/inf precursor m/z or RT must not enter the pipeline.

    A NaN precursor silently disables precursor-peak removal (every NaN
    comparison is false) and breaks the sorted-precursor invariants the
    charge bucketing and banded kNN rely on (SURVEY.md §3.5 divergence).
    """
    mz = [150, 300, 450, 600, 750]
    inten = [1, 2, 3, 4, 5]
    for bad in (np.nan, np.inf, -np.inf):
        assert prep.process_spectrum(
            _spec(mz, inten, precursor_mz=bad),
            min_peaks=3, min_mz_range=250) is None
        spec = _spec(mz, inten)
        spec = Spectrum("s", 500.0, 2,
                        np.asarray(mz, np.float32),
                        np.asarray(inten, np.float32), float(bad))
        assert prep.process_spectrum(
            spec, min_peaks=3, min_mz_range=250) is None
    # Missing RT (-1.0) is of course fine.
    spec = Spectrum("s", 500.0, 2, np.asarray(mz, np.float32),
                    np.asarray(inten, np.float32), -1.0)
    assert prep.process_spectrum(
        spec, min_peaks=3, min_mz_range=250) is not None


def test_non_finite_peaks_dropped_pairwise():
    out = prep.process_spectrum(
        _spec([150, 200, 300, 450, 600, 750],
              [1.0, np.nan, 2.0, np.inf, 4.0, 5.0]),
        min_peaks=3, min_mz_range=250)
    np.testing.assert_allclose(out["mz"], [150, 300, 600, 750])
    spec = _spec([150, np.nan, 300, 450, 600, 750],
                 [1.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    out = prep.process_spectrum(spec, min_peaks=3, min_mz_range=250)
    np.testing.assert_allclose(out["mz"], [150, 300, 450, 600, 750])
    # Dropping non-finite peaks can fail the min_peaks gate.
    assert prep.process_spectrum(
        _spec([150, 300, 450], [np.nan, 1.0, 2.0]),
        min_peaks=3, min_mz_range=100) is None


def test_all_zero_intensity_rejected_not_nan():
    # With the intensity filter disabled, all-zero intensities used to
    # normalize to a NaN vector.
    assert prep.process_spectrum(
        _spec([150, 300, 450, 600, 750], [0.0] * 5),
        min_peaks=3, min_mz_range=250) is None
