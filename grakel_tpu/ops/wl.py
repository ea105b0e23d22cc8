"""Weisfeiler-Lehman label refinement as device ops.

The reference relabels with Python string credentials
``str(l(v)) + "," + str(sorted(neighbor labels))`` and a global sorted
re-enumeration (reference weisfeiler_lehman.py:213-241).  Credential
identity only depends on (own label, neighbor-label *multiset*), so a
TPU-native refinement step is:

1. hash each node's (own label, neighbor multiset) with a pair of
   independent 32-bit commutative multiset hashes (sums of mixed
   neighbor labels wrap mod 2^32 — order-free, exactly matching the
   sorted-credential semantics);
2. compact hash pairs to dense ids by lexsort + boundary cumsum — a
   fully on-device, static-shape replacement for the host dict.

Gram matrices are label-permutation invariant, so the ids produced here
(ranked by hash value instead of credential string) yield Grams equal to
the reference's (SURVEY.md §7.3).  Collisions: two distinct credentials
colliding in BOTH 32-bit hashes has probability ~2^-64 per pair; with
~1e6 distinct credentials the chance of any collision is ~1e-7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["wl_refine", "wl_hash_refine", "compact_ids", "host_compact",
           "wl_fused_step", "wl_final_gram", "pack_u16", "fetch_count_gram"]

_U = jnp.uint32


def _fmix32(x, seed):
    """murmur3-style 32-bit finalizer with a seed fold."""
    x = x ^ _U(seed)
    x = x ^ (x >> 16)
    x = x * _U(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * _U(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def compact_ids(h1, h2, valid):
    """Dense ids for equal (h1, h2) pairs; invalid rows get the last id.

    Returns (ids int32[N], n_unique int32 scalar incl. the pad id when
    any invalid rows exist).
    """
    n = h1.shape[0]
    big = _U(0xFFFFFFFF)
    h1 = jnp.where(valid, h1, big)
    h2 = jnp.where(valid, h2, big)
    order = jnp.lexsort((h2, h1))
    s1 = h1[order]
    s2 = h2[order]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])
    ids_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    ids = jnp.zeros(n, jnp.int32).at[order].set(ids_sorted)
    return ids, ids_sorted[-1] + 1


@jax.jit
def wl_hash_refine(labels, senders, receivers, edge_valid):
    """One WL refinement returning the raw (h1, h2) hash pairs WITHOUT
    id compaction.  No sort inside — on TPU the variadic sort of
    ``compact_ids`` costs minutes of XLA compile time at large N, so the
    performance path hashes on device and compacts on host
    (:func:`host_compact`), a ~1 MB round trip.
    """
    l = labels.astype(_U)
    nl = l[receivers]
    m1 = jnp.where(edge_valid, _fmix32(nl, 0x9E3779B9), _U(0))
    m2 = jnp.where(edge_valid, _fmix32(nl, 0x7F4A7C15), _U(0))
    n = labels.shape[0]
    sum1 = jax.ops.segment_sum(m1, senders, num_segments=n)
    sum2 = jax.ops.segment_sum(m2, senders, num_segments=n)
    h1 = _fmix32(l * _U(0x9E3779B9) + sum1, 0x165667B1)
    h2 = _fmix32(l * _U(0x85EBCA6B) + sum2, 0x27D4EB2F)
    return h1, h2


def host_compact(h1, h2, valid):
    """Dense ids for equal (h1, h2) pairs via host ``np.unique`` —
    equivalent ordering to :func:`compact_ids` (ids ranked by sorted
    (h1, h2)), but without the on-device sort.  Returns
    (ids int32[N] numpy, n_unique int)."""
    import numpy as np
    h1 = np.asarray(h1, np.uint64)
    h2 = np.asarray(h2, np.uint64)
    valid = np.asarray(valid)
    packed = (h1 << np.uint64(32)) | h2
    packed = np.where(valid, packed, np.uint64(0xFFFFFFFFFFFFFFFF))
    uniq, ids = np.unique(packed, return_inverse=True)
    return ids.astype(np.int32), int(len(uniq))


@functools.partial(jax.jit, static_argnums=(7, 8, 9),
                   donate_argnums=(6,))
def wl_fused_step(labels, senders, receivers, edge_valid, gids,
                  node_valid, K, n_graphs, n_chunks, chunk):
    """One WL generation in a single dispatch: accumulate the current
    generation's histogram Gram into ``K`` (donated buffer) and emit the
    next generation's hash pairs, stacked into ONE [2, N] array so the
    host fetches them in a single transfer.  Minimizes host<->device
    round trips, which dominate on tunneled TPU setups (26 ms per
    dispatch measured).
    """
    from .gram import chunked_counts_gram_raw
    ones = jnp.where(node_valid, 1.0, 0.0).astype(jnp.float32)
    K = chunked_counts_gram_raw(gids, labels, ones, node_valid,
                                n_graphs, n_chunks, chunk, K0=K)
    h1, h2 = wl_hash_refine(labels, senders, receivers, edge_valid)
    return K, jnp.stack([h1, h2])


@jax.jit
def pack_u16(K):
    """(K low byte-plane u8, K high byte-plane u8, max(K)).

    The Gram of histogram counts is exact integers in f32, so when
    max < 2^16 the 16-bit copy is lossless.  Splitting it into two u8
    byte planes beats a single u16 fetch on the tunneled backend (which
    compresses transfers): the high plane is low-entropy (mostly 0/1)
    and compresses away — measured 0.75 s vs 1.03 s (u16) vs 1.31 s
    (f32) for a 4110x4110 Gram of realistic counts.  The caller checks
    the (scalar, cheap) max before fetching; unused outputs are never
    transferred.
    """
    u = K.astype(jnp.uint16)
    return ((u & jnp.uint16(0xFF)).astype(jnp.uint8),
            (u >> jnp.uint16(8)).astype(jnp.uint8),
            jnp.max(K))


def fetch_count_gram(Kd):
    """Fetch an integer-valued f32 count-Gram from device to host with
    the cheapest lossless encoding (byte planes when max < 2^16)."""
    import numpy as np
    lo, hi, kmax = pack_u16(Kd)
    if float(kmax) < 65536.0:
        out = np.asarray(lo).astype(np.float32)
        out += np.asarray(hi).astype(np.float32) * np.float32(256.0)
        return out
    return np.asarray(Kd)


@functools.partial(jax.jit, static_argnums=(4, 5, 6),
                   donate_argnums=(3,))
def wl_final_gram(labels, gids, node_valid, K, n_graphs, n_chunks, chunk):
    """Last generation: Gram accumulation only (no refinement).

    (An upper-triangle-only device->host transfer was tried to halve
    the dominant transfer cost, but the 8.4M-index gather compiles
    pathologically on this backend; the full K transfer is robust.)"""
    from .gram import chunked_counts_gram_raw
    ones = jnp.where(node_valid, 1.0, 0.0).astype(jnp.float32)
    return chunked_counts_gram_raw(gids, labels, ones, node_valid,
                                   n_graphs, n_chunks, chunk, K0=K)


@jax.jit
def wl_refine(labels, senders, receivers, edge_valid, node_valid):
    """One WL refinement: labels int32[N] -> (new ids int32[N], n_unique).

    Each node aggregates the labels of its OUT-neighbors (edge u->v
    contributes l(v) to u), matching the reference's
    ``neighbors(purpose='any')`` credential; undirected inputs carry both
    edge directions so the distinction only matters for directed graphs.
    """
    l = labels.astype(_U)
    nl = l[receivers]
    m1 = jnp.where(edge_valid, _fmix32(nl, 0x9E3779B9), _U(0))
    m2 = jnp.where(edge_valid, _fmix32(nl, 0x7F4A7C15), _U(0))
    n = labels.shape[0]
    sum1 = jax.ops.segment_sum(m1, senders, num_segments=n)
    sum2 = jax.ops.segment_sum(m2, senders, num_segments=n)
    h1 = _fmix32(l * _U(0x9E3779B9) + sum1, 0x165667B1)
    h2 = _fmix32(l * _U(0x85EBCA6B) + sum2, 0x27D4EB2F)
    return compact_ids(h1, h2, node_valid)
