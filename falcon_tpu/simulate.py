"""Synthetic MS/MS spectrum generation for tests and benchmarks.

The reference ships no test data (SURVEY.md §4: "There are no tests"), so
this module generates realistic clustered inputs with known ground truth:
template spectra (random peak sets) are replicated with m/z jitter within
the fragment tolerance, intensity noise, and peak dropout, and mixed with
unrelated noise spectra.  Ground-truth cluster ids are returned so cluster
purity/completeness can be measured (BASELINE.json metric).
"""

import os
from typing import List, Optional, Tuple

import numpy as np

from .ms_io.containers import Spectrum
from .ms_io import mgf_io

PROTON = 1.0072766


def make_clustered_spectra(
    n_clusters: int = 50,
    cluster_size: int = 10,
    n_noise: int = 100,
    n_peaks: Tuple[int, int] = (20, 50),
    mz_range: Tuple[float, float] = (101.0, 1495.0),
    precursor_mz_range: Tuple[float, float] = (400.0, 1200.0),
    charges: Tuple[int, ...] = (2, 3),
    mz_jitter: float = 0.01,
    intensity_jitter: float = 0.15,
    dropout: float = 0.1,
    rt_range: Tuple[float, float] = (0.0, 3600.0),
    precursor_classes: Optional[int] = None,
    seed: int = 42,
) -> Tuple[List[Spectrum], np.ndarray]:
    """Generate clustered spectra with ground-truth labels.

    Returns (spectra, labels); noise spectra get unique labels after the
    cluster ids.  ``precursor_classes`` concentrates precursor m/z around
    that many discrete mass classes (as tryptic peptide masses cluster in
    practice), producing realistically sized precursor-tolerance buckets;
    None draws precursors uniformly.
    """
    rng = np.random.default_rng(seed)
    if precursor_classes is not None:
        class_mzs = rng.uniform(*precursor_mz_range, precursor_classes)

        def draw_precursor():
            # Within +-8 ppm of a mass class (inside the 20 ppm default).
            base = float(rng.choice(class_mzs))
            return base * (1.0 + rng.normal(0, 4e-6))
    else:
        def draw_precursor():
            return float(rng.uniform(*precursor_mz_range))
    spectra: List[Spectrum] = []
    labels: List[int] = []
    scan = 0

    def random_template():
        k = int(rng.integers(n_peaks[0], n_peaks[1] + 1))
        mz = np.sort(rng.uniform(mz_range[0], mz_range[1], k))
        # Enforce minimal peak spacing (1 Da) so fragment-tolerance matching
        # is unambiguous, as for real peptide fragments.
        mz = np.sort(mz_range[0] + np.cumsum(
            rng.uniform(1.0, (mz_range[1] - mz_range[0]) / k, k)
        ))
        mz = np.clip(mz, *mz_range)
        intensity = rng.lognormal(0.0, 1.0, k).astype(np.float64) + 0.05
        return mz, intensity

    for c in range(n_clusters):
        template_mz, template_int = random_template()
        precursor_mz = draw_precursor()
        charge = int(rng.choice(charges))
        rt = float(rng.uniform(*rt_range))
        for m in range(cluster_size):
            keep = rng.uniform(size=len(template_mz)) >= dropout
            if keep.sum() < 8:
                keep[:] = True
            mz = template_mz[keep] + rng.normal(0, mz_jitter, keep.sum())
            intensity = template_int[keep] * rng.lognormal(
                0.0, intensity_jitter, keep.sum()
            )
            # Precursor m/z within a few ppm of the template's.
            pmz = precursor_mz * (1.0 + rng.normal(0, 2e-6))
            spectra.append(
                Spectrum(
                    f"cluster{c}_member{m}_scan{scan}",
                    pmz,
                    charge,
                    np.sort(mz),
                    intensity[np.argsort(mz)],
                    rt + float(rng.normal(0, 5.0)),
                )
            )
            labels.append(c)
            scan += 1

    for i in range(n_noise):
        mz, intensity = random_template()
        spectra.append(
            Spectrum(
                f"noise{i}_scan{scan}",
                draw_precursor(),
                int(rng.choice(charges)),
                mz,
                intensity,
                float(rng.uniform(*rt_range)),
            )
        )
        labels.append(n_clusters + i)
        scan += 1

    order = rng.permutation(len(spectra))
    return [spectra[i] for i in order], np.asarray(labels)[order]


def write_mgf(path: str, spectra: List[Spectrum]) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    mgf_io.write_spectra(path, spectra)
    return path
