"""Measure the reference GraKeL on one (kernel, dataset) bench cell —
the SAME synthetic dataset tools/full_bench.py uses — on this machine.

The published study ran on real TU datasets on a 2010 Xeon; where our
synthetic stand-in's size distribution differs from the real data's
(e.g. REDDIT-BINARY's heavy-tailed vertex counts), a published cell and
a measured cell aren't directly comparable.  This tool produces the
same-host, same-data reference number that IS comparable; results merge
into docs/ref_samehost.json and full_bench's table footnotes cite them.

Run (CPU only, no TPU contention):
    python tools/measure_ref_cell.py --cell ODD-STh/REDDIT-B \
        [--budget 3600] [--repeats 1]

A run that exceeds ``--budget`` wall seconds records
``{"dnf_budget_s": ...}`` for the cell instead of a time (the process
must be killed by the caller's timeout; use ``timeout <budget+slack>``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402

import full_bench as fb  # noqa: E402
from refshim import import_reference_grakel  # noqa: E402

OUT = os.path.join(ROOT, "docs", "ref_samehost.json")


def ref_kernels():
    import grakel.kernels as rk
    return {
        "VH": lambda: rk.VertexHistogram(),
        "EH": lambda: rk.EdgeHistogram(),
        "SP": lambda: rk.ShortestPath(),
        "WL-VH": lambda: rk.WeisfeilerLehman(n_iter=5),
        "NH": lambda: rk.NeighborhoodHash(),
        "NSPDK": lambda: rk.NeighborhoodSubgraphPairwiseDistance(),
        "ODD-STh": lambda: rk.OddSth(),
        "PM": lambda: rk.PyramidMatch(),
        "PK": lambda: rk.Propagation(random_state=42),
        "SVM-theta": lambda: rk.SvmTheta(random_state=42),
        "GR": lambda: rk.GraphletSampling(
            k=5, sampling={"n_samples": 150}, random_state=42),
        "RW": lambda: rk.RandomWalk(lamda=0.01),
        "GH": lambda: rk.GraphHopper(),
        "ML": lambda: rk.MultiscaleLaplacian(random_state=42),
        "WL-OA": lambda: rk.WeisfeilerLehmanOptimalAssignment(),
        "WL-SP": lambda: rk.WeisfeilerLehman(
            n_iter=5, base_graph_kernel=(rk.ShortestPath, {})),
        "WL-PM": lambda: rk.WeisfeilerLehman(
            n_iter=5, base_graph_kernel=(rk.PyramidMatch, {})),
        "CORE-WL": lambda: rk.CoreFramework(
            base_graph_kernel=(rk.WeisfeilerLehman, {})),
        "CORE-SP": lambda: rk.CoreFramework(
            base_graph_kernel=(rk.ShortestPath, {})),
        "SM": lambda: rk.SubgraphMatching(k=3),
        "Lo-theta": lambda: rk.LovaszTheta(random_state=42),
    }


def _to_ref_format(data):
    """grakel_tpu Graph items -> the reference's [edge_set, node_labels,
    edge_labels] format (the heavy-tailed bench datasets load as native
    Graph objects; the reference parses its own formats)."""
    from grakel_tpu.graph import Graph as TG
    out = []
    for it in data:
        if isinstance(it, TG):
            edges = {(int(s), int(r))
                     for s, r in zip(it.senders, it.receivers)}
            out.append([edges, dict(it.node_labels), {}])
        else:
            out.append(it)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", required=True, help="KERNEL/DATASET")
    ap.add_argument("--budget", type=float, default=3600.0)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()
    kname, dname = args.cell.split("/")

    import_reference_grakel()
    kfact = ref_kernels()[kname]
    data = fb.load(dname, features=fb.FEATURE_OVERRIDE.get(kname))
    data = _to_ref_format(data)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    # mark DNF up front; overwritten on success (so an external
    # `timeout` kill still leaves an honest record)
    merged[args.cell] = {"dnf_budget_s": args.budget}
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)

    times = []
    for _ in range(args.repeats):
        k = kfact()
        t0 = time.perf_counter()
        K = k.fit_transform(data)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(np.asarray(K)).all()
        if times[-1] > args.budget:
            break
    merged[args.cell] = {"seconds": round(min(times), 3),
                         "repeats": len(times)}
    if min(times) > args.budget:
        # finished, but past budget — flag so downstream tables can mark
        # the cell instead of silently trusting a success record
        merged[args.cell]["over_budget"] = True
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({args.cell: merged[args.cell]}))


if __name__ == "__main__":
    main()
