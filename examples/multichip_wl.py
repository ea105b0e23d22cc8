"""Distributed WL Gram over all available devices (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
for a virtual mesh, or on a real pod slice under jax.distributed)."""

import os

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from grakel_tpu.datasets import generate_dataset
from grakel_tpu.kernels.base import normalize_input
from grakel_tpu.parallel import make_mesh, distributed_wl_gram

train, _ = generate_dataset(n_graphs=65, n_graphs_test=1,
                            r_vertices=(8, 24), random_state=0,
                            features=("nl", 4))
graphs = normalize_input(train)
mesh = make_mesh(len(jax.devices()))
K = distributed_wl_gram(graphs, n_iter=4, mesh=mesh)
print("Gram", K.shape, "on", len(jax.devices()), "devices;",
      "K[0,:4] =", K[0, :4])
