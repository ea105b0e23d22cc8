"""Multi-device scaling harness: distributed WL Gram edges/s at mesh
sizes 1..N.

On a real pod slice run under `jax.distributed`; without one, set
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the sharded program on virtual devices (correctness + the
collective schedule; virtual-device wall times are NOT hardware
scaling numbers).

Usage: python tools/scaling_bench.py [n_graphs] [n_iter]
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402


def main(n_graphs=512, n_iter=3):
    import jax
    # the env var alone does not override a pre-registered TPU plugin
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from grakel_tpu.datasets import generate_dataset
    from grakel_tpu.kernels.base import normalize_input
    from grakel_tpu.parallel import make_mesh, distributed_wl_gram

    train, _ = generate_dataset(n_graphs=n_graphs + 1, n_graphs_test=1,
                                r_vertices=(10, 40), random_state=0,
                                features=("nl", 5))
    graphs = normalize_input(train)
    total_edges = sum(len(g.senders) for g in graphs)

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    results = []
    for P in sizes:
        mesh = make_mesh(P)
        distributed_wl_gram(graphs, n_iter, mesh)       # warm
        t0 = time.perf_counter()
        distributed_wl_gram(graphs, n_iter, mesh)
        dt = time.perf_counter() - t0
        eps = total_edges * (n_iter + 1) / dt
        results.append({"devices": P, "wall_s": round(dt, 3),
                        "edges_per_s": round(eps)})
        print(json.dumps(results[-1]))
    if len(results) > 1:
        base = results[0]["edges_per_s"]
        for r in results[1:]:
            r["scaling_efficiency"] = round(
                r["edges_per_s"] / (base * r["devices"]), 3)
        print(json.dumps({"summary": results}))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
