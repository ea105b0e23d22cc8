"""Multi-host launcher for the distributed WL Gram path.

Spawns N worker processes (each one standing in for a host: its own
JAX runtime, its own local devices, connected only through the
coordination service + collectives — exactly the structure of an
N-host TPU pod slice, with gloo/DCN in place of ICI), initializes
``jax.distributed`` in each, builds the process-spanning global mesh,
and runs ``grakel_tpu.parallel.distributed_wl_gram`` over it.  Process
0 verifies the result against the single-process WL kernel and prints
one JSON line with timing + edges/s.

Usage (from the repo root; CPU backend, D devices per process):

    python tools/launch_distributed.py --processes 2 --devices-per-proc 4
    python tools/launch_distributed.py --processes 1 --devices-per-proc 8

Comparing the two invocations above (same 8-device mesh, 1 vs 2
"hosts") measures the cross-process overhead of the boundary exchange —
the scaling-efficiency axis of BASELINE.md §F.  On a real TPU pod the
same worker body runs unmodified under the pod launcher (one process
per host, JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
from the pod metadata); only the spawning below is environment-specific.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=%d" % args.devices_per_proc)
    sys.path.insert(0, HERE)
    # distributed_init must run before ANYTHING touches the XLA backend,
    # so import only jax + the mesh module (no grakel_tpu package yet)
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.processes > 1:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "_mesh", os.path.join(HERE, "grakel_tpu", "parallel",
                                  "mesh.py"))
        _mesh = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mesh)
        _mesh.distributed_init(coordinator_address=args.coordinator,
                               num_processes=args.processes,
                               process_id=args.process_id)
    import numpy as np
    from grakel_tpu.parallel import make_mesh, distributed_wl_gram
    from grakel_tpu.kernels import WeisfeilerLehman
    from grakel_tpu.kernels.base import normalize_input
    from grakel_tpu.datasets import generate_dataset
    n_devices = args.processes * args.devices_per_proc
    assert len(jax.devices()) == n_devices, \
        (len(jax.devices()), n_devices)
    mesh = make_mesh(n_devices)

    train, _ = generate_dataset(n_graphs=args.graphs, n_graphs_test=1,
                                r_vertices=(10, 30), random_state=0,
                                features=("nl", 4))
    graphs = normalize_input(train)
    edges = sum(len(g.senders) for g in graphs)

    if args.path == "dataset":
        def run():
            return distributed_wl_gram(graphs, n_iter=args.n_iter,
                                       mesh=mesh)

        def check(K):
            K_single = np.asarray(
                WeisfeilerLehman(n_iter=args.n_iter).fit_transform(train))
            return np.allclose(K, K_single, rtol=1e-5, atol=1e-5)

    elif args.path == "rect":
        # rectangular ring Gram: rows = second half of the dataset
        # (transform block), cols = first half, VH count features
        from jax.sharding import NamedSharding, PartitionSpec
        from grakel_tpu.parallel.gram import ring_rect_gram
        from grakel_tpu.parallel.wl import _to_host
        half = len(graphs) // 2
        L = 8

        def counts(gs):
            rows = -(-len(gs) // n_devices) * n_devices
            C = np.zeros((rows, L), np.float32)
            for i, g in enumerate(gs):
                labs = g.get_labels(label_type="vertex")
                for v in range(g.n):
                    C[i, int(labs[v]) % L] += 1.0
            return C
        Crows, Ccols = counts(graphs[half:]), counts(graphs[:half])
        sh = NamedSharding(mesh, PartitionSpec("g", None))

        def run():
            Kd = ring_rect_gram(mesh, jax.device_put(Crows, sh),
                                jax.device_put(Ccols, sh))
            return _to_host(Kd)[:len(graphs) - half]

        def check(K):
            # ring layout: column block j of the result holds rows
            # against device j's feature block
            exp = Crows @ Ccols.T
            return np.allclose(K[:, :half], exp[:len(graphs) - half,
                                                :half], rtol=1e-5)

    elif args.path == "large":
        # mixed dataset: ordinary graphs + one edge-partitioned big graph
        from grakel_tpu.parallel.large_graph import large_graph_wl_gram
        from grakel_tpu.graph import Graph
        rng = np.random.RandomState(0)
        nbig = args.big_nodes
        s = rng.randint(0, nbig, size=3 * nbig)
        r = rng.randint(0, nbig, size=3 * nbig)
        keep = s != r
        big = Graph.from_arrays(
            nbig, np.concatenate([s[keep], r[keep]]),
            np.concatenate([r[keep], s[keep]]),
            node_labels={v: int(x) for v, x in
                         enumerate(rng.randint(0, 4, nbig))})
        mixed = graphs + [big]
        edges += len(big.senders)

        def run():
            return large_graph_wl_gram(mixed, n_iter=args.n_iter,
                                       mesh=mesh, big_threshold=1000)

        def check(K):
            K_single = np.asarray(WeisfeilerLehman(
                n_iter=args.n_iter).fit_transform(mixed))
            return np.allclose(K, K_single, rtol=1e-5, atol=1e-5)
    else:
        raise SystemExit("unknown --path %r" % args.path)

    K = run()  # warm (compiles)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        K = run()
    dt = (time.perf_counter() - t0) / args.repeats

    if args.process_id == 0:
        ok = bool(check(np.asarray(K)))
        print(json.dumps({
            "path": args.path,
            "processes": args.processes,
            "devices_per_proc": args.devices_per_proc,
            "graphs": args.graphs, "n_iter": args.n_iter,
            "seconds": round(dt, 4),
            "edges_per_s": round(edges * (args.n_iter + 1) / dt),
            "allclose_vs_single_chip": ok,
        }), flush=True)
        if not ok:
            raise SystemExit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--graphs", type=int, default=64)
    ap.add_argument("--n-iter", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--path", default="dataset",
                    choices=["dataset", "rect", "large"],
                    help="which sharded code path to exercise")
    ap.add_argument("--big-nodes", type=int, default=3000,
                    help="size of the edge-partitioned graph (--path "
                         "large)")
    ap.add_argument("--coordinator", default="127.0.0.1:12381")
    ap.add_argument("--process-id", type=int, default=None,
                    help="internal: set when running as a worker")
    args = ap.parse_args()

    if args.process_id is not None:  # worker mode
        worker(args)
        return

    if args.processes == 1:
        args.process_id = 0
        worker(args)
        return

    procs = []
    for pid in range(args.processes):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--processes", str(args.processes),
               "--devices-per-proc", str(args.devices_per_proc),
               "--graphs", str(args.graphs),
               "--n-iter", str(args.n_iter),
               "--repeats", str(args.repeats),
               "--path", args.path,
               "--big-nodes", str(args.big_nodes),
               "--coordinator", args.coordinator,
               "--process-id", str(pid)]
        procs.append(subprocess.Popen(
            cmd, stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL))
    rc = 0
    for p in procs:
        p.wait()
        rc = rc or p.returncode
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
