"""Device-mesh helpers.

One logical axis matters for graph-kernel Gram assembly: ``"g"`` (graph
shards / Gram row tiles).  Multi-host execution uses
``jax.distributed.initialize`` before calling :func:`make_mesh`; a single
process with N local (or ``xla_force_host_platform_device_count``
virtual) devices produces the same program.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_mesh"]


def make_mesh(n_devices=None, axis_name="g"):
    """1-D mesh over the first ``n_devices`` available devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                "requested %d devices but only %d available"
                % (n_devices, len(devs)))
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def local_mesh(axis_name="g"):
    """Mesh over all addressable devices of this process."""
    return Mesh(np.asarray(jax.local_devices()), (axis_name,))
