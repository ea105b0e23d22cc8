"""Downstream SVM-accuracy parity: ours vs the reference, per kernel.

BASELINE.md §F demands "matched downstream SVM accuracy on TU
datasets".  For every kernel this script computes the Gram matrix with
grakel_tpu AND with the reference (imported via tools/refshim), runs
the IDENTICAL 10-fold precomputed-kernel SVM protocol
(`grakel_tpu.utils.cross_validate_Kfold_SVM`, same folds via a fixed
seed) on both, and writes `docs/accuracy.md`.  The reference's own
per-kernel CV harness pattern is grakel/kernels/propagation.py:641-794.

Datasets: vendored MUTAG (node+edge labeled, 188 graphs) for discrete
kernels; vendored Cuneiform (node/edge attributed) for attributed
kernels.  Slow reference paths (pure-Python brute-force stand-ins for
its C extensions) run on subsets — the subset size is recorded in the
table.

Run on CPU (does not touch the TPU):
    python tools/accuracy_parity.py [--out docs/accuracy.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def _kernel_specs():
    """(label, ctor_name, params, dataset, n_graphs | None=all)."""
    return [
        ("VertexHistogram", "VertexHistogram", {}, "MUTAG", None),
        ("EdgeHistogram", "EdgeHistogram", {}, "MUTAG", None),
        ("ShortestPath", "ShortestPath", {}, "MUTAG", None),
        ("WeisfeilerLehman h=5", "WeisfeilerLehman", {"n_iter": 5},
         "MUTAG", None),
        ("WL-OptimalAssignment", "WeisfeilerLehmanOptimalAssignment", {},
         "MUTAG", None),
        ("NeighborhoodHash", "NeighborhoodHash", {"random_state": 42},
         "MUTAG", None),
        ("NSPD", "NeighborhoodSubgraphPairwiseDistance", {}, "MUTAG", None),
        ("OddSth", "OddSth", {}, "MUTAG", None),
        ("Propagation", "Propagation", {"random_state": 42}, "MUTAG", None),
        ("PyramidMatch", "PyramidMatch", {}, "MUTAG", None),
        ("GraphletSampling", "GraphletSampling",
         {"random_state": 42, "sampling": {"n_samples": 150}},
         "MUTAG", 120),
        ("RandomWalk", "RandomWalk", {}, "MUTAG", 100),
        ("RandomWalkLabeled", "RandomWalkLabeled", {}, "MUTAG", 60),
        ("HadamardCode", "HadamardCode", {}, "MUTAG", None),
        ("CoreFramework(WL)", "CoreFramework", {}, "MUTAG", None),
        # normalize=False: the default metric reads only the level-2
        # feature, which distribute_samples gives ZERO samples on
        # MUTAG-sized graphs in BOTH libraries -> zero diagonals -> NaN
        # under normalization (verified identical ours vs reference)
        ("SvmTheta", "SvmTheta",
         {"random_state": 42, "normalize": False}, "MUTAG", None),
        # smallest graphs only: the reference stand-in for its sm C
        # extension is brute force over subset pairs
        ("SubgraphMatching k=3", "SubgraphMatching", {"k": 3},
         "MUTAG-small", 16),
        ("GraphHopper", "GraphHopper", {}, "Cuneiform", None),
        ("PropagationAttr", "PropagationAttr", {"random_state": 42},
         "Cuneiform", None),
        ("MultiscaleLaplacian", "MultiscaleLaplacian",
         {"random_state": 42}, "Cuneiform", 80),
        ("ShortestPathAttr", "ShortestPathAttr", {}, "Cuneiform", 60),
        # LovaszTheta: reference needs cvxopt (absent) -> ours only
        ("LovaszTheta", "LovaszTheta", {"random_state": 42}, "MUTAG", 80),
    ]


def cv_accuracy(K, y, seed=0):
    from grakel_tpu.utils import cross_validate_Kfold_SVM
    accs = cross_validate_Kfold_SVM(
        [np.asarray(K, np.float64)], y, n_iter=3, n_splits=10,
        random_state=seed, C_grid=10.0 ** np.arange(-2, 5))
    a = np.asarray(accs[0])
    return float(a.mean()), float(a.std())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "accuracy.md"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from refshim import import_reference_grakel
    import_reference_grakel()
    import grakel as ref
    import grakel_tpu as ours
    from grakel_tpu.datasets import read_data

    data = {}
    for name in ("MUTAG", "Cuneiform"):
        bunch = read_data(name, path=os.path.join(HERE, "tests", "data"),
                          prefer_attr_nodes=(name == "Cuneiform"),
                          prefer_attr_edges=False)
        data[name] = (bunch.data, np.asarray(bunch.target))
    # size-sorted MUTAG, classes interleaved so any prefix is balanced
    # (for kernels whose reference stand-in is O(V^k))
    X, y = data["MUTAG"]
    order = sorted(range(len(X)), key=lambda i: len(X[i][1]))
    by_cls = {}
    for i in order:
        by_cls.setdefault(int(y[i]), []).append(i)
    inter = []
    lists = list(by_cls.values())
    for j in range(max(map(len, lists))):
        inter.extend(l[j] for l in lists if j < len(l))
    data["MUTAG-small"] = ([X[i] for i in inter], y[np.asarray(inter)])

    rows = []
    for label, ctor, params, dname, cap in _kernel_specs():
        if args.only and args.only not in label:
            continue
        X, y = data[dname]
        if cap:
            X, y = X[:cap], y[:cap]
        n = len(X)
        norm = params.pop("normalize", True)
        try:
            k_our = getattr(ours, ctor)(normalize=norm, **params)
            t0 = time.perf_counter()
            K_our = np.asarray(k_our.fit_transform(X), np.float64)
            t_our = time.perf_counter() - t0
            acc_our, std_our = cv_accuracy(K_our, y)
        except Exception as e:
            print(f"OURS FAIL {label}: {e}", file=sys.stderr)
            continue
        try:
            import grakel.kernels as rk
            k_ref = getattr(rk, ctor)(normalize=norm, **params)
            t0 = time.perf_counter()
            K_ref = np.asarray(k_ref.fit_transform(X), np.float64)
            t_ref = time.perf_counter() - t0
            acc_ref, std_ref = cv_accuracy(K_ref, y)
        except Exception as e:
            acc_ref = std_ref = t_ref = None
            print(f"REF n/a {label}: {e}", file=sys.stderr)
        rows.append((label, dname, n, acc_our, std_our, acc_ref, std_ref))
        ref_s = ("%.3f ± %.3f" % (acc_ref, std_ref)
                 if acc_ref is not None else "n/a")
        print(f"{label:26s} {dname:9s} n={n:3d} "
              f"ours={acc_our:.3f}±{std_our:.3f} ref={ref_s}", flush=True)

    # merge with previous runs (per-kernel json cache), regenerate md
    import json
    jpath = os.path.splitext(args.out)[0] + ".json"
    merged = {}
    if os.path.exists(jpath):
        with open(jpath) as f:
            merged = json.load(f)
    for label, dname, n, ao, so, ar, sr in rows:
        merged[label] = [dname, n, ao, so, ar, sr]
    with open(jpath, "w") as f:
        json.dump(merged, f, indent=1)
    order = [s[0] for s in _kernel_specs()]
    rows = [(label, *merged[label]) for label in order if label in merged]

    lines = [
        "# Downstream SVM accuracy — ours vs the reference",
        "",
        "10-fold precomputed-kernel SVM, 3 repetitions, identical folds",
        "(seed 0) and C grid (1e-2..1e4) for both libraries, via",
        "`grakel_tpu.utils.cross_validate_Kfold_SVM`.  Values are mean ±",
        "std over repetitions.  Reference = GraKeL 0.1.10 imported via",
        "`tools/refshim.py`; rows marked n/a need dependencies the",
        "environment lacks (cvxopt).  Datasets: vendored TU MUTAG",
        "(labeled) and Cuneiform (attributed); n = graphs used (subsets",
        "bound the pure-Python reference stand-in runtimes).",
        "",
        "| Kernel | Dataset | n | ours | reference | Δ |",
        "|---|---|---|---|---|---|",
    ]
    for label, dname, n, ao, so, ar, sr in rows:
        if ar is None:
            lines.append("| %s | %s | %d | %.3f ± %.3f | n/a | — |"
                         % (label, dname, n, ao, so))
        else:
            lines.append(
                "| %s | %s | %d | %.3f ± %.3f | %.3f ± %.3f | %+.3f |"
                % (label, dname, n, ao, so, ar, sr, ao - ar))
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
