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
           "host_hash_refine",
           "wl_fused_step", "wl_final_gram",
           "host_compact_counts", "split_singletons"]

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


def host_hash_refine(labels, senders, receivers, edge_valid):
    """Numpy twin of :func:`wl_hash_refine` (bit-identical uint32
    arithmetic).  For small batches the two device round trips per
    generation (~70 ms on a tunneled backend) dwarf the O(N+E) hash
    work, so the WL fast path hashes on host below a size threshold."""
    import numpy as np

    def fmix(x, seed):
        x = x ^ np.uint32(seed)
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x85EBCA6B)
        x ^= x >> np.uint32(13)
        x *= np.uint32(0xC2B2AE35)
        x ^= x >> np.uint32(16)
        return x

    with np.errstate(over="ignore"):
        l = np.asarray(labels).astype(np.uint32)
        nl = l[receivers]
        m1 = np.where(edge_valid, fmix(nl, 0x9E3779B9), np.uint32(0))
        m2 = np.where(edge_valid, fmix(nl, 0x7F4A7C15), np.uint32(0))
        n = l.shape[0]
        sum1 = np.zeros(n, np.uint32)
        sum2 = np.zeros(n, np.uint32)
        np.add.at(sum1, senders, m1)
        np.add.at(sum2, senders, m2)
        h1 = fmix(l * np.uint32(0x9E3779B9) + sum1, 0x165667B1)
        h2 = fmix(l * np.uint32(0x85EBCA6B) + sum2, 0x27D4EB2F)
    return h1, h2


def host_compact(h1, h2, valid):
    """Dense ids for equal (h1, h2) pairs via host ``np.unique`` —
    equivalent ordering to :func:`compact_ids` (ids ranked by sorted
    (h1, h2)), but without the on-device sort.  Returns
    (ids int32[N] numpy, n_unique int)."""
    ids, nu, _ = host_compact_counts(h1, h2, valid)
    return ids, nu


def host_compact_counts(h1, h2, valid):
    """:func:`host_compact` + per-id occurrence counts (int64[n_unique])."""
    import numpy as np
    h1 = np.asarray(h1, np.uint64)
    h2 = np.asarray(h2, np.uint64)
    valid = np.asarray(valid)
    packed = (h1 << np.uint64(32)) | h2
    packed = np.where(valid, packed, np.uint64(0xFFFFFFFFFFFFFFFF))
    uniq, ids, counts = np.unique(packed, return_inverse=True,
                                  return_counts=True)
    return ids.astype(np.int32), int(len(uniq)), counts


def split_singletons(ids, counts, valid, gids, n_graphs):
    """Split a compacted labeling into (repeated-only relabeling,
    singleton diagonal correction).

    Labels occurring once contribute ONLY to the Gram diagonal (a
    singleton cannot co-occur in two graphs, nor twice in one), so the
    chunked counts-GEMM need only run over the repeated labels — in late
    WL generations most labels are singletons, cutting GEMM chunks by a
    large factor.  Returns ``(gram_labels int32[N], gram_valid bool[N],
    n_repeated, diag_correction f64[n_graphs])``.
    """
    import numpy as np
    rep = counts > 1                     # [n_unique]
    node_rep = rep[ids] & valid
    rep_idx = np.nonzero(rep)[0]
    remap = np.zeros(len(counts), np.int32)
    remap[rep_idx] = np.arange(len(rep_idx), dtype=np.int32)
    gram_labels = remap[ids]
    single = valid & ~node_rep
    diag = np.bincount(gids[single], minlength=n_graphs)[:n_graphs]
    return gram_labels, node_rep, int(len(rep_idx)), diag.astype(np.float64)


@functools.partial(jax.jit, static_argnums=(9, 10, 11),
                   donate_argnums=(8,))
def wl_fused_step(labels, senders, receivers, edge_valid,
                  gram_labels, gram_valid, gids,
                  node_valid, K, n_graphs, n_chunks, chunk):
    """One WL generation in a single dispatch: accumulate the current
    generation's histogram Gram into ``K`` (donated buffer) and emit the
    next generation's hash pairs, stacked into ONE [2, N] array so the
    host fetches them in a single transfer.  Minimizes host<->device
    round trips, which dominate on tunneled TPU setups (26 ms per
    dispatch measured).

    The Gram runs over ``(gram_labels, gram_valid)`` — typically the
    repeated-labels-only relabeling from :func:`split_singletons` —
    while refinement hashes the full ``labels``.
    """
    from .gram import chunked_counts_gram_raw
    ones = jnp.where(gram_valid, 1.0, 0.0).astype(jnp.float32)
    K = chunked_counts_gram_raw(gids, gram_labels, ones, gram_valid,
                                n_graphs, n_chunks, chunk, K0=K)
    h1, h2 = wl_hash_refine(labels, senders, receivers, edge_valid)
    return K, jnp.stack([h1, h2])


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
