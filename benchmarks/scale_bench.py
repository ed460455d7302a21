"""Large-scale benchmarks: BASELINE configs #2 (1M multi-file mzML) and
#5 (multi-million-spectrum host-path stress).

Usage::

    python benchmarks/scale_bench.py gen-mzml  [n_files] [per_file]
    python benchmarks/scale_bench.py run-mzml  [--ann_index ivf|auto]
    python benchmarks/scale_bench.py gen-mgf5m [n_files] [per_file]
    python benchmarks/scale_bench.py run-mgf5m

Corpora are cached under ``.bench_cache/`` (gitignored); ``run-*`` prints
one JSON line with wall-clock, spectra/sec, and peak RSS, and logs the
per-phase summary to stderr.  Results are recorded in README.md.
"""

import base64
import json
import os
import resource
import shutil
import sys
import tempfile
import time
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cache")


def _write_mzml(path: str, spectra) -> None:
    def b64(arr, dtype):
        return base64.b64encode(
            zlib.compress(np.asarray(arr, dtype).tobytes())
        ).decode()

    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">\n'
            f'<run id="r"><spectrumList count="{len(spectra)}">\n'
        )
        for i, s in enumerate(spectra):
            charge = (
                f'<cvParam accession="MS:1000041" name="charge state" '
                f'value="{s.precursor_charge}"/>'
                if s.precursor_charge is not None else ""
            )
            f.write(
                f'<spectrum index="{i}" id="scan={i}" '
                f'defaultArrayLength="{len(s.mz)}">\n'
                '<cvParam accession="MS:1000511" name="ms level" '
                'value="2"/>\n'
                '<scanList count="1"><scan>'
                '<cvParam accession="MS:1000016" name="scan start time" '
                f'value="{s.retention_time}" unitName="second"/>'
                '</scan></scanList>\n'
                '<precursorList count="1"><precursor>'
                '<selectedIonList count="1"><selectedIon>'
                '<cvParam accession="MS:1000744" name="selected ion m/z" '
                f'value="{s.precursor_mz!r}"/>{charge}'
                '</selectedIon></selectedIonList></precursor>'
                '</precursorList>\n'
                '<binaryDataArrayList count="2"><binaryDataArray>'
                '<cvParam accession="MS:1000523" name="64-bit float"/>'
                '<cvParam accession="MS:1000574" name="zlib compression"/>'
                '<cvParam accession="MS:1000514" name="m/z array"/>'
                f'<binary>{b64(s.mz, np.float64)}</binary>'
                '</binaryDataArray><binaryDataArray>'
                '<cvParam accession="MS:1000521" name="32-bit float"/>'
                '<cvParam accession="MS:1000574" name="zlib compression"/>'
                '<cvParam accession="MS:1000515" name="intensity array"/>'
                f'<binary>{b64(s.intensity, np.float32)}</binary>'
                '</binaryDataArray></binaryDataArrayList>\n'
                '</spectrum>\n'
            )
        f.write("</spectrumList></run></mzML>\n")


def gen_corpus(fmt: str, n_files: int, per_file: int, name: str) -> str:
    from falcon_tpu.simulate import make_clustered_spectra, write_mgf

    out_dir = os.path.join(CACHE, name)
    os.makedirs(out_dir, exist_ok=True)
    ext = "mzml" if fmt == "mzml" else "mgf"
    for fi in range(n_files):
        path = os.path.join(out_dir, f"part{fi:03d}.{ext}")
        if os.path.isfile(path):
            continue
        t0 = time.time()
        # ~70% clustered / 30% noise, tryptic-like precursor classes.
        n_clusters = per_file * 7 // 100
        spectra, _ = make_clustered_spectra(
            n_clusters=n_clusters, cluster_size=10,
            n_noise=per_file - n_clusters * 10,
            precursor_classes=max(per_file // 80, 50), seed=1000 + fi,
        )
        if fmt == "mzml":
            _write_mzml(path, spectra)
        else:
            write_mgf(path, spectra)
        print(f"  {path}: {per_file} spectra in {time.time()-t0:.1f}s",
              flush=True)
    return out_dir


def run(pattern: str, n_spectra_hint: int, extra_args, label: str) -> int:
    from falcon_tpu import cli

    out_dir = tempfile.mkdtemp()
    try:
        t0 = time.time()
        rc = cli.main([
            pattern, os.path.join(out_dir, "out"),
            "--work_dir", os.path.join(out_dir, "work"),
            "--backend", "ann", "--eps", "0.10", "--overwrite",
            *extra_args,
        ])
        elapsed = time.time() - t0
        if rc != 0:
            print(json.dumps({"error": f"cli exited {rc}"}))
            return 1
        n_rows = 0
        with open(os.path.join(out_dir, "out.csv")) as f:
            for line in f:
                if not line.startswith("#"):
                    n_rows += 1
        n_rows -= 1  # header
        peak_rss_mb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024
        print(json.dumps({
            "metric": label,
            "n_spectra": n_rows,
            "wall_s": round(elapsed, 1),
            "spectra_per_sec": round(n_rows / elapsed, 1),
            "peak_rss_mb": round(peak_rss_mb, 1),
        }))
        return 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "help"
    if cmd == "gen-mzml":
        n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        per_file = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
        gen_corpus("mzml", n_files, per_file, "mzml_1m")
        return 0
    if cmd == "run-mzml":
        extra = sys.argv[2:]
        return run(os.path.join(CACHE, "mzml_1m", "*.mzml"), 10**6,
                   extra, "1M multi-file mzML end-to-end (config #2)")
    if cmd == "gen-mgf5m":
        n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        per_file = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
        gen_corpus("mgf", n_files, per_file, "mgf_5m")
        return 0
    if cmd == "run-mgf5m":
        n_files = len([f for f in os.listdir(os.path.join(CACHE, "mgf_5m"))
                       if f.endswith(".mgf")])
        return run(os.path.join(CACHE, "mgf_5m", "*.mgf"),
                   n_files * 10**5, sys.argv[2:],
                   f"{n_files / 10:.0f}M-spectrum MGF scale run "
                   "(config #5)")
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
