"""Batched all-pairs shortest paths on device.

The reference computes APSP per graph on host (Dijkstra-per-source or a
row-vectorized Floyd-Warshall, grakel/graph.py:593-692,1709-1791).  Here
whole padded batches run one min-plus Floyd-Warshall under jit: the k-loop
is a ``lax.fori_loop`` over [n, V, V] tiles, which XLA fuses into
broadcast-min updates on the VPU.  Graphs are grouped into V-size buckets
by the caller so padding waste stays bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_floyd_warshall", "INF"]

# safe to add two of these without f32 overflow.  MUST be a HOST scalar
# (np, not jnp): a module-level jnp scalar is a committed device array,
# and every jit trace closing over it embeds it as an MLIR constant via
# a synchronous device->host fetch — on the tunneled axon backend that
# one fetch costs SECONDS per enclosing (sub)computation, which made the
# fused ShortestPath program take minutes to lower.
INF = np.float32(3.4e38 / 4)


@jax.jit
def batched_floyd_warshall(adj, node_mask):
    """APSP over a padded batch.

    Parameters
    ----------
    adj : f32 [n, V, V] — weighted adjacency; 0 means "no edge"
        (matching the reference convention, grakel/graph.py:1770-1780).
    node_mask : bool [n, V]

    Returns
    -------
    S : f32 [n, V, V] — shortest distances; INF where unreachable or
        either endpoint is padding; 0 on the (valid) diagonal.
    """
    V = adj.shape[1]
    S = jnp.where(adj > 0, adj, INF)
    eye = jnp.eye(V, dtype=bool)
    S = jnp.where(eye[None, :, :], 0.0, S)
    valid = node_mask[:, :, None] & node_mask[:, None, :]
    S = jnp.where(valid, S, INF)
    S = jnp.where(eye[None, :, :] & node_mask[:, :, None], 0.0, S)

    def body(k, S):
        via = S[:, :, k][:, :, None] + S[:, k, :][:, None, :]
        return jnp.minimum(S, via)

    return jax.lax.fori_loop(0, V, body, S)
