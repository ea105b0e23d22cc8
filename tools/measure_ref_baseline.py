"""Measure the reference GraKeL's WL h=5 wall time on the same synthetic
NCI1-scale dataset bench.py uses, on this machine, and record it in
BENCH_BASELINE.json so bench.py reports an honest same-data speedup.

Run:  python tools/measure_ref_baseline.py
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import bench  # noqa: E402
from refshim import import_reference_grakel  # noqa: E402


def main():
    import_reference_grakel()
    from grakel.kernels import WeisfeilerLehman

    data = bench.make_nci1_scale_dataset()
    t0 = time.perf_counter()
    K = WeisfeilerLehman(n_iter=bench.H, normalize=False).fit_transform(data)
    secs = time.perf_counter() - t0
    assert K.shape == (bench.N_GRAPHS, bench.N_GRAPHS)

    out = {"ref_seconds": round(secs, 3), "seed": bench.SEED, "h": bench.H,
           "n_graphs": bench.N_GRAPHS,
           "note": "reference GraKeL (pure-python via tools/refshim) on the "
                   "same synthetic NCI1-scale data, this machine"}
    with open(os.path.join(ROOT, "BENCH_BASELINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
