"""Oracle completeness ceiling of the 50k bench corpus (diagnostic).

Answers the round-2 verdict question "why is completeness frozen at
0.9675?": for each ground-truth class of the bench corpus
(``bench.py``'s exact generator parameters), build the EXACT
peak-matching-cosine eps-graph over the class's own members using the
scipy Hungarian oracle (``cluster/oracle.py``, the reference kernel
semantics of ``falcon/cluster/similarity.py:17-80``) and take connected
components.  The resulting ideal labeling is the best any eps-based
clustering can produce without violating purity; its completeness is
the ceiling.

Measured result (2026-08-17, CPU, ~25 min):

    multi-member truth classes: 3500; disconnected at eps=0.1: 2711
    oracle completeness ceiling: 0.9675

— numerically identical to the pipeline's reported completeness, with
the same number of split classes.  The 3.25% "missing" merges are
member pairs whose exact cosine distance exceeds eps (simulator peak
dropout/jitter), not a pipeline loss; the device pipeline achieves the
optimum.  Run with ``python benchmarks/completeness_ceiling.py``
(CPU-friendly; takes ~25 min for the 157,500 Hungarian solves).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

EPS = 0.10


def main() -> int:
    from falcon_tpu import metrics
    from falcon_tpu.cluster.oracle import cosine_exact
    from falcon_tpu.preprocess import process_spectrum
    from falcon_tpu.simulate import make_clustered_spectra

    spectra, truth = make_clustered_spectra(
        n_clusters=3500, cluster_size=10, n_noise=15000,
        precursor_classes=600, seed=42,
    )
    rows, kept_truth = [], []
    for s, t in zip(spectra, truth):
        p = process_spectrum(s, 5, 250.0, 101.0, 1500.0, 1.5, 0.01, 50,
                             None)
        if p is not None:
            rows.append(p)
            kept_truth.append(t)
    kept_truth = np.asarray(kept_truth)
    print("kept:", len(rows))

    by_class = {}
    for i, t in enumerate(kept_truth):
        by_class.setdefault(int(t), []).append(i)

    ideal = np.full(len(rows), -1, np.int64)
    next_label = 0
    n_disconnected = n_classes = n_checked = 0
    for t, members in by_class.items():
        if len(members) == 1:
            ideal[members[0]] = next_label
            next_label += 1
            continue
        n_classes += 1
        k = len(members)
        parent = list(range(k))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in range(k):
            ra = rows[members[a]]
            for b in range(a + 1, k):
                rb = rows[members[b]]
                sim, _ = cosine_exact(
                    ra["mz"], ra["intensity"], rb["mz"], rb["intensity"],
                    0.05,
                )
                n_checked += 1
                if sim >= 1.0 - EPS:
                    pa, pb = find(a), find(b)
                    if pa != pb:
                        parent[pa] = pb
        comps = {}
        for a in range(k):
            comps.setdefault(find(a), []).append(a)
        if len(comps) > 1:
            n_disconnected += 1
        for comp in comps.values():
            for a in comp:
                ideal[members[a]] = next_label
            next_label += 1

    print(f"multi-member truth classes: {n_classes}; "
          f"disconnected at eps={EPS}: {n_disconnected}")
    print(f"pairs checked: {n_checked}")
    print("oracle completeness ceiling:",
          round(metrics.cluster_completeness(ideal, kept_truth), 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
