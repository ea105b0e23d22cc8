"""Breadth benchmark: per-kernel Gram wall time on synthetic datasets
with the statistics of the reference's evaluation study.

The reference publishes Gram-matrix wall times per kernel per dataset
(reference doc/benchmarks/evaluation.rst; copied to BASELINE.md).  The
real TU datasets cannot be downloaded in this zero-egress environment,
so each dataset is replaced by a synthetic stand-in with the published
statistics (graph count, vertex/edge averages, label count —
BASELINE.md §E).  Times are therefore comparable in scale, not
identical-input measurements; the same-host reference re-measurement of
the headline WL number lives in BENCH_BASELINE.json.

Run (exclusive TPU access required — the axon pool serializes):
    python tools/full_bench.py [--out docs/benchmarks.md] [--quick]

Writes a markdown table (ours vs published baseline) and a JSON blob.
Each kernel runs twice; the min is reported (first run pays XLA
compiles).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from grakel_tpu.datasets import generate_dataset  # noqa: E402


# dataset-name -> (n_graphs, vertex range, connectivity range, n_labels)
# statistics from BASELINE.md §E (reference comparison.rst:21-44); the
# connectivity range is chosen so avg edges matches the published value.
DATASETS = {
    "MUTAG": dict(n_graphs=188, r_vertices=(10, 26),
                  r_connectivity=(0.10, 0.16), features=("nl", 7)),
    "ENZYMES": dict(n_graphs=600, r_vertices=(15, 50),
                    r_connectivity=(0.10, 0.14), features=("nl", 3)),
    "NCI1": dict(n_graphs=4110, r_vertices=(10, 50),
                 r_connectivity=(0.07, 0.15), features=("nl", 37)),
    "IMDB-B": dict(n_graphs=1000, r_vertices=(12, 28),
                   r_connectivity=(0.4, 0.6), features=None),
    # REDDIT-BINARY scale: 2000 graphs, avg ~430 vertices / ~500 edges
    # (sparse).  The reference OOMs/TIMEOUTs on most kernels here
    # (evaluation.rst:63-100) — this is the scaling demonstration.
    "REDDIT-B": dict(n_graphs=2000, r_vertices=(100, 760),
                     r_connectivity=(0.0035, 0.0075), features=None),
    # REDDIT-MULTI-12K scale: 11929 graphs, avg ~391 vertices / ~457
    # edges.  The reference's WL-VH / CORE-WL / ML rows are OUT-OF-MEM
    # here and SP/NSPDK/GH TIMEOUT (evaluation.rst:63-100) — the
    # dataset-scale demonstration VERDICT r2 asked for.
    "REDDIT-M-12K": dict(n_graphs=11929, r_vertices=(90, 690),
                         r_connectivity=(0.004, 0.008), features=None),
}

# published baseline wall seconds (BASELINE.md §A/§B); None = not published
PUBLISHED = {
    ("VH", "MUTAG"): 0.01, ("VH", "ENZYMES"): 0.04, ("VH", "NCI1"): 0.84,
    ("SP", "MUTAG"): 0.92, ("SP", "ENZYMES"): 11.03, ("SP", "NCI1"): 69.69,
    ("WL-VH", "MUTAG"): 0.21, ("WL-VH", "ENZYMES"): 3.81,
    ("WL-VH", "NCI1"): 425.33,
    ("NH", "MUTAG"): 0.40, ("NH", "ENZYMES"): 11.17, ("NH", "NCI1"): 424.54,
    ("NSPDK", "MUTAG"): 4.05, ("NSPDK", "ENZYMES"): 27.02,
    ("NSPDK", "NCI1"): 369.81,
    ("ODD-STh", "MUTAG"): 1.54, ("ODD-STh", "ENZYMES"): 50.05,
    ("ODD-STh", "NCI1"): 2762.13,
    ("PM", "MUTAG"): 2.59, ("PM", "ENZYMES"): 31.38, ("PM", "NCI1"): 2257.50,
    ("PK", "MUTAG"): 0.48, ("PK", "ENZYMES"): 12.05, ("PK", "NCI1"): 627.83,
    ("CORE-WL", "MUTAG"): 0.55, ("CORE-WL", "ENZYMES"): 12.52,
    ("CORE-WL", "NCI1"): 870.56,
    ("CORE-SP", "MUTAG"): 2.69, ("CORE-SP", "ENZYMES"): 48.02,
    ("CORE-SP", "NCI1"): 196.54,
    ("WL-SP", "MUTAG"): 7.02, ("WL-SP", "ENZYMES"): 87.07,
    ("WL-SP", "NCI1"): 929.50,
    ("RW", "MUTAG"): 106.86,
    ("SM", "MUTAG"): 117.25,
    ("GH", "MUTAG"): 24.70, ("GH", "ENZYMES"): 938.33,
    ("ML", "MUTAG"): 603.15,
    ("GR", "IMDB-B"): 1365.89,
    ("SVM-theta", "IMDB-B"): 39.40,
    ("PM", "IMDB-B"): 88.02,
    ("ODD-STh", "IMDB-B"): 4.47,
    ("NH", "IMDB-B"): 21.83,
    ("WL-VH", "IMDB-B"): 4.49,
    ("SP", "IMDB-B"): 11.51,
    ("PK", "IMDB-B"): 7.41,
    ("VH", "IMDB-B"): 0.07,
    ("RW", "IMDB-B"): 440.94,
    ("RW", "ENZYMES"): 15856.26,
    ("Lo-theta", "IMDB-B"): 19167.17,
    ("WL-PM", "MUTAG"): 222.07,
    ("WL-PM", "ENZYMES"): 3937.26,
    ("SM", "ENZYMES"): 12343.59,
    ("GH", "IMDB-B"): 131.15,
    ("GH", "NCI1"): 13508.31,
    ("ML", "IMDB-B"): 4926.04,
    ("ML", "ENZYMES"): 3403.76,
    ("ML", "NCI1"): 19856.29,
    ("ML", "REDDIT-B"): 30078.76,
    ("WL-SP", "IMDB-B"): 92.66,
    ("WL-PM", "NCI1"): 48694.36,
    ("NSPDK", "IMDB-B"): 258.12,
    ("CORE-WL", "IMDB-B"): 36.74,
    ("CORE-SP", "IMDB-B"): 238.29,
    ("CORE-WL", "REDDIT-B"): 2701.09,
    ("CORE-SP", "REDDIT-B"): 38223.94,
    # REDDIT-B column (evaluation.rst:63-100)
    ("VH", "REDDIT-B"): 0.67,
    ("WL-VH", "REDDIT-B"): 962.65,
    ("NH", "REDDIT-B"): 1383.42,
    ("PK", "REDDIT-B"): 83.42,
    ("ODD-STh", "REDDIT-B"): 113.50,
    ("PM", "REDDIT-B"): 609.24,
    ("SVM-theta", "REDDIT-B"): 1164.73,
    ("SP", "REDDIT-B"): 17291.19,
    ("GR", "REDDIT-B"): 2685.42,
    # REDDIT-M-12K column (evaluation.rst:63-100); WL-VH is OUT-OF-MEM
    # for the reference, so no number exists for it
    ("VH", "REDDIT-M-12K"): 6.37,
    ("NH", "REDDIT-M-12K"): 33083.67,
    ("PK", "REDDIT-M-12K"): 1241.73,
    ("ODD-STh", "REDDIT-M-12K"): 500.66,
    ("SVM-theta", "REDDIT-M-12K"): 3130.36,
    ("PM", "REDDIT-M-12K"): 13838.60,
    ("GR", "REDDIT-M-12K"): 3194.22,
}

# cells where the reference could not produce a number at all
REF_FAILED = {
    ("WL-VH", "REDDIT-M-12K"): "OUT-OF-MEM",
    ("CORE-WL", "REDDIT-M-12K"): "OUT-OF-MEM",
    ("CORE-SP", "REDDIT-M-12K"): "OUT-OF-MEM",
    ("ML", "REDDIT-M-12K"): "OUT-OF-MEM",
    ("SP", "REDDIT-M-12K"): "TIMEOUT",
    ("NSPDK", "REDDIT-M-12K"): "TIMEOUT",
    ("GH", "REDDIT-M-12K"): "TIMEOUT",
    ("WL-SP", "REDDIT-M-12K"): "TIMEOUT",
    ("RW", "REDDIT-M-12K"): "TIMEOUT",
    ("Lo-theta", "REDDIT-M-12K"): "TIMEOUT",
    ("RW", "NCI1"): "TIMEOUT",
    ("RW", "REDDIT-B"): "TIMEOUT",
    ("WL-SP", "REDDIT-B"): "TIMEOUT",
    ("NSPDK", "REDDIT-B"): "TIMEOUT",
    ("GH", "REDDIT-B"): "TIMEOUT",
    ("Lo-theta", "REDDIT-B"): "TIMEOUT",
    ("SM", "NCI1"): "TIMEOUT",
    ("SM", "IMDB-B"): "TIMEOUT",
    ("SM", "REDDIT-B"): "OUT-OF-MEM",
}


def _kernels():
    import grakel_tpu as gt
    return {
        "VH": lambda: gt.VertexHistogram(),
        "SP": lambda: gt.ShortestPath(),
        "WL-VH": lambda: gt.WeisfeilerLehman(n_iter=5),
        "WL-SP": lambda: gt.WeisfeilerLehman(
            n_iter=5, base_graph_kernel=(gt.ShortestPath, {})),
        "NH": lambda: gt.NeighborhoodHash(),
        "NSPDK": lambda: gt.NeighborhoodSubgraphPairwiseDistance(),
        "ODD-STh": lambda: gt.OddSth(),
        "PM": lambda: gt.PyramidMatch(),
        "PK": lambda: gt.Propagation(random_state=42),
        "CORE-WL": lambda: gt.CoreFramework(
            base_graph_kernel=(gt.WeisfeilerLehman, {})),
        "CORE-SP": lambda: gt.CoreFramework(
            base_graph_kernel=(gt.ShortestPath, {})),
        "WL-PM": lambda: gt.WeisfeilerLehman(
            n_iter=5, base_graph_kernel=(gt.PyramidMatch, {})),
        "Lo-theta": lambda: gt.LovaszTheta(random_state=42),
        "RW": lambda: gt.RandomWalk(lamda=0.01),
        "SM": lambda: gt.SubgraphMatching(k=3),
        "GH": lambda: gt.GraphHopper(),
        "ML": lambda: gt.MultiscaleLaplacian(random_state=42),
        "GR": lambda: gt.GraphletSampling(
            k=5, sampling={"n_samples": 150}, random_state=42),
        "SVM-theta": lambda: gt.SvmTheta(random_state=42),
        "WL-OA": lambda: gt.WeisfeilerLehmanOptimalAssignment(),
        "EH": lambda: gt.EdgeHistogram(),
    }


# which (kernel, dataset) cells to run; order = fast first
PLAN = [
    ("VH", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("WL-VH", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
               "REDDIT-M-12K"]),
    ("SP", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("NH", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("PK", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("PM", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("ODD-STh", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
                 "REDDIT-M-12K"]),
    ("NSPDK", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
               "REDDIT-M-12K"]),
    ("WL-OA", ["MUTAG", "ENZYMES", "NCI1"]),
    ("CORE-WL", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
                 "REDDIT-M-12K"]),
    ("CORE-SP", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B"]),
    ("WL-SP", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B"]),
    ("SVM-theta", ["MUTAG", "IMDB-B", "REDDIT-B", "REDDIT-M-12K"]),
    ("GR", ["MUTAG", "NCI1", "IMDB-B", "REDDIT-B", "REDDIT-M-12K"]),
    ("RW", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B"]),
    ("SM", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B"]),
    ("GH", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("ML", ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
            "REDDIT-M-12K"]),
    ("Lo-theta", ["MUTAG", "IMDB-B"]),
    ("WL-PM", ["MUTAG", "ENZYMES", "NCI1"]),
]

QUICK_PLAN = [(k, [d for d in ds if d == "MUTAG"]) for k, ds in PLAN]


# kernels needing node attributes instead of discrete labels
FEATURE_OVERRIDE = {"ML": ("na", 6)}


_CACHE_DIR = os.path.join(HERE, ".bench_cache")


def load(name, features=None):
    spec = dict(DATASETS[name])
    if features is not None:
        spec["features"] = features
    elif spec["features"] is None:
        spec["features"] = ("nl", 2)  # degree-like labels stand-in
    n = spec.pop("n_graphs")

    # disk-cache the generated dataset as COO + labels: regenerating
    # REDDIT-M-12K costs ~20 min of host time per bench invocation
    fk, fd = spec["features"]
    tag = f"{name}_{fk}{fd}_{n}"
    path = os.path.join(_CACHE_DIR, tag + ".npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        ns, goff = z["ns"], z["goff"]
        src, dst, w, eoff = z["src"], z["dst"], z["w"], z["eoff"]
        labs = z["labs"]
        out = []
        for g in range(len(ns)):
            m = int(ns[g])
            A = np.zeros((m, m))
            s = slice(eoff[g], eoff[g + 1])
            A[src[s], dst[s]] = w[s]
            lv = labs[goff[g]:goff[g + 1]]
            if fk == "nl":
                nl = {v: int(lv[v]) for v in range(m)}
            else:
                nl = {v: lv[v].copy() for v in range(m)}
            out.append([A, nl, {}])
        return out

    train, _ = generate_dataset(n_graphs=n + 1, n_graphs_test=1,
                                random_state=1234, **spec)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        ns = np.array([a[0].shape[0] for a in train], np.int64)
        goff = np.concatenate([[0], np.cumsum(ns)])
        srcs, dsts, ws = [], [], []
        labl = []
        for A, nl, _e in train:
            i, j = np.nonzero(A)
            srcs.append(i.astype(np.int32))
            dsts.append(j.astype(np.int32))
            ws.append(A[i, j])
            if fk == "nl":
                labl.append(np.array([nl[v] for v in range(A.shape[0])],
                                     np.int64))
            else:
                labl.append(np.stack([nl[v] for v in range(A.shape[0])])
                            if A.shape[0] else np.zeros((0, fd)))
        eoff = np.concatenate(
            [[0], np.cumsum([len(x) for x in srcs])]).astype(np.int64)
        np.savez_compressed(
            path, ns=ns, goff=goff, eoff=eoff,
            src=np.concatenate(srcs), dst=np.concatenate(dsts),
            w=np.concatenate(ws), labs=np.concatenate(labl))
    except Exception as e:  # cache failure must never break a bench
        print("dataset cache write failed:", e, file=sys.stderr)
    return train


def _flush_cell(path, kname, dname, secs):
    """Merge one measured cell into the json immediately — a killed or
    timed-out run keeps everything it measured."""
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged[f"{kname}/{dname}"] = secs
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "benchmarks.md"))
    ap.add_argument("--json", default=os.path.join(HERE, "docs",
                                                   "benchmarks.json"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated kernel names to run")
    ap.add_argument("--datasets", default=None,
                    help="comma-separated dataset names to run")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    plan = QUICK_PLAN if args.quick else PLAN
    if args.only:
        keep = set(args.only.split(","))
        plan = [(k, ds) for k, ds in plan if k in keep]
    if args.datasets:
        dkeep = set(args.datasets.split(","))
        plan = [(k, [d for d in ds if d in dkeep]) for k, ds in plan]

    kernels = _kernels()
    cache = {}
    results = {}
    for kname, dnames in plan:
        for dname in dnames:
            feats = FEATURE_OVERRIDE.get(kname)
            ckey = (dname, feats)
            if ckey not in cache:
                cache[ckey] = load(dname, features=feats)
            data = cache[ckey]
            times = []
            try:
                for _ in range(args.repeats):
                    k = kernels[kname]()
                    t0 = time.perf_counter()
                    K = k.fit_transform(data)
                    times.append(time.perf_counter() - t0)
                K = np.asarray(K)
                assert K.shape == (len(data), len(data))
                assert np.isfinite(K).all()
                secs = min(times)
            except Exception as e:  # record failures, keep going
                print(f"FAIL {kname} {dname}: {e}", file=sys.stderr)
                results[(kname, dname)] = None
                continue
            results[(kname, dname)] = secs
            base = PUBLISHED.get((kname, dname))
            sp = f"  ({base / secs:8.1f}x)" if base else ""
            print(f"{kname:10s} {dname:8s} {secs:9.3f}s{sp}", flush=True)
            _flush_cell(args.json, kname, dname, secs)

    # ---- merge into the existing json, regenerate the md from it ----- #
    # (partial runs used to OVERWRITE the json and leave the md stale;
    # now every run merges its cells and the md is always re-derived
    # from the full merged set, so the two can never disagree)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    merged = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            merged = json.load(f)
    for (k, d), v in results.items():
        if v is not None:
            merged[f"{k}/{d}"] = v
    with open(args.json, "w") as f:
        json.dump(merged, f, indent=1)

    dnames = ["MUTAG", "ENZYMES", "NCI1", "IMDB-B", "REDDIT-B",
              "REDDIT-M-12K"]
    kernel_order = [k for k, _ in PLAN]
    for key in merged:
        k = key.split("/")[0]
        if k not in kernel_order:
            kernel_order.append(k)
    lines = [
        "# Benchmarks — grakel_tpu vs the reference's published study",
        "",
        "Gram-matrix wall seconds (min of 2 runs, compile excluded by the",
        "repeat) on one TPU v5e chip behind a network tunnel, on synthetic",
        "datasets matching the published statistics (BASELINE.md §E;",
        "REDDIT-B = 2000 graphs ~430 avg vertices, REDDIT-M-12K = 11929",
        "graphs ~390 avg vertices — the scales where the reference",
        "OOMs/TIMEOUTs on most kernels).",
        "Baseline = the reference's published single-thread CPU numbers",
        "(BASELINE.md §A/§B, Xeon E7-4860 @2.27 GHz).  `--` = cell not",
        "run or not published; OUT-OF-MEM/TIMEOUT = the reference failed",
        "there (multiplier shown as inf); multipliers have one decimal",
        "and cells where we LOSE are marked `SLOWER`.",
        "",
        "| Kernel | " + " | ".join(
            f"{d} ours | ref | x" for d in dnames) + " |",
        "|---|" + "---|" * (3 * len(dnames)),
    ]
    for kname in kernel_order:
        row = [kname]
        any_cell = False
        for d in dnames:
            secs = merged.get(f"{kname}/{d}")
            base = PUBLISHED.get((kname, d))
            failed = REF_FAILED.get((kname, d))
            any_cell = any_cell or secs is not None
            row.append(f"{secs:.2f}s" if secs is not None else "--")
            row.append(failed if failed else
                       (f"{base:.2f}s" if base else "--"))
            if secs and base:
                m = base / secs
                row.append(f"{m:.1f}x" if m >= 1
                           else f"{m:.2f}x SLOWER")
            elif secs and failed:
                row.append("inf")
            else:
                row.append("--")
        if any_cell:
            lines.append("| " + " | ".join(row) + " |")
    lines.append("")
    lines.append("Per-stage wall-time breakdowns for every sub-50x cell"
                 " (dispatch/transfer-floor analysis) are in"
                 " [stage_breakdown.md](stage_breakdown.md).")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
