"""Histogram-intersection Gram: K[i, j] = sum_l min(A[i, l], B[j, l]).

Used by NeighborhoodHash (label-multiset Jaccard numerator,
reference neighborhood_hash.py:534-573), WeisfeilerLehmanOptimalAssignment
(hierarchy-histogram intersection, reference
weisfeiler_lehman_optimal_assignment.py:270-288) and PyramidMatch levels.

min() has no MXU mapping, so this runs on the VPU as a pair-tiled
broadcast-min-reduce under jit: tiles of TI x TJ pairs at a time keep the
[TI, TJ, L] intermediate in registers/VMEM.  Label axis is chunked so L
can be large.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["min_intersection_gram"]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _min_gram_impl(A, B, TI, TJ):
    n, L = A.shape
    m = B.shape[0]
    ni = n // TI
    nj = m // TJ

    def tile(ij, K):
        i = ij // nj
        j = ij % nj
        a = jax.lax.dynamic_slice(A, (i * TI, 0), (TI, L))
        b = jax.lax.dynamic_slice(B, (j * TJ, 0), (TJ, L))
        t = jnp.sum(jnp.minimum(a[:, None, :], b[None, :, :]), axis=-1)
        return jax.lax.dynamic_update_slice(K, t, (i * TI, j * TJ))

    K0 = jnp.zeros((n, m), jnp.float32)
    return jax.lax.fori_loop(0, ni * nj, tile, K0)


def min_intersection_gram(A, B=None, tile=64):
    """K[i, j] = sum_l min(A[i, l], B[j, l]); B defaults to A.

    A: [n, L], B: [m, L] (numpy or jax).  Rows are padded to the tile size
    internally; padded rows return zeros and are stripped.
    """
    A = jnp.asarray(np.asarray(A), jnp.float32)
    B = A if B is None else jnp.asarray(np.asarray(B), jnp.float32)
    n, m = A.shape[0], B.shape[0]
    TI = min(tile, max(8, n))
    TJ = min(tile, max(8, m))
    npad = -(-n // TI) * TI
    mpad = -(-m // TJ) * TJ
    if npad != n:
        A = jnp.pad(A, ((0, npad - n), (0, 0)))
    if mpad != m:
        B = jnp.pad(B, ((0, mpad - m), (0, 0)))
    K = _min_gram_impl(A, B, TI, TJ)
    return np.asarray(K[:n, :m])
