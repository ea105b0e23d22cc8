"""Canonical codes for small graphs — the TPU-native replacement for the
reference's bliss-based isomorphism binning (reference
_isomorphism/bliss.pyx:313-358: linear scan of `isomorphic()` calls).

Two graphlets are isomorphic iff their canonical codes are equal, so
binning becomes a hash lookup instead of a pairwise-isomorphism scan —
asymptotically better than the reference even before acceleration.

For graphs of size s <= 8 the canonical code is the minimum over all s!
vertex permutations of the bit-packed upper-triangular adjacency
(undirected; inputs are symmetrized the same way the reference's
bliss wrapper does by building an undirected graph from directed pairs).
The min-over-permutations runs BATCHED on device: one gather of
[B, s!, s(s-1)/2] bits + a weighted-sum + min reduction.  s > 8 falls
back to the individualization-refinement canonicalizer
(grakel_tpu.isomorphism / native/src/canonical.cpp).
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["canonical_codes", "MAX_DEVICE_SIZE"]

MAX_DEVICE_SIZE = 8  # s(s-1)/2 = 28 bits fits int32

_PERM_CACHE = {}


def _perm_pair_index(s):
    """[s!, s(s-1)/2] flat indices into an s*s adjacency such that row p
    lists the upper-triangle entries of the p-permuted matrix."""
    cached = _PERM_CACHE.get(s)
    if cached is not None:
        return cached
    pairs = [(i, j) for i in range(s) for j in range(i + 1, s)]
    idx = np.array(
        [[p[i] * s + p[j] for (i, j) in pairs]
         for p in itertools.permutations(range(s))], dtype=np.int32)
    _PERM_CACHE[s] = idx
    return idx


@functools.partial(jax.jit, static_argnums=(1,))
def _codes_impl(flat_bits, s):
    """flat_bits: [B, s*s] int32 0/1 (symmetrized) -> [B] int32 codes."""
    idx = jnp.asarray(_perm_pair_index(s))            # [P, nb]
    nb = idx.shape[1]
    bits = flat_bits[:, idx]                          # [B, P, nb]
    weights = (jnp.int32(1) << jnp.arange(nb, dtype=jnp.int32))
    codes = jnp.sum(bits * weights[None, None, :], axis=-1)
    return jnp.min(codes, axis=1)


def canonical_codes(adjs):
    """Canonical int codes for a list of small square 0/1 adjacency
    arrays, all the SAME size s <= MAX_DEVICE_SIZE.  Directed inputs are
    symmetrized (undirected-isomorphism semantics, like the reference's
    bliss wrapper).  Batched on device; large batches are chunked to
    bound the [B, s!, nb] gather.
    """
    if len(adjs) == 0:
        return np.zeros(0, np.int64)
    s = adjs[0].shape[0]
    if s > MAX_DEVICE_SIZE:
        raise ValueError("device canonical codes support size <= %d"
                         % MAX_DEVICE_SIZE)
    if s <= 1:
        return np.zeros(len(adjs), np.int64)
    A = np.stack([np.asarray(a) for a in adjs]).astype(bool)
    A = A | np.transpose(A, (0, 2, 1))
    flat = A.reshape(len(adjs), s * s).astype(np.int32)
    n_perms = _perm_pair_index(s).shape[0]
    # keep the gather under ~64M elements
    chunk = max(1, (1 << 26) // max(n_perms * s * s, 1))
    out = []
    for lo in range(0, flat.shape[0], chunk):
        out.append(np.asarray(_codes_impl(jnp.asarray(flat[lo:lo + chunk]),
                                          s)))
    return np.concatenate(out).astype(np.int64)
