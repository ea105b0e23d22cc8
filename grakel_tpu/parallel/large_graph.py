"""Edge-partitioned WL refinement for a SINGLE large graph.

``distributed_wl_gram`` (parallel/wl.py) assigns whole graphs to
devices, which is the right layout for dataset Grams.  When ONE graph is
too large (or must be load-balanced across a mesh), this module shards
its nodes and edges instead:

* nodes are block-partitioned across the mesh axis; each edge lives on
  its SENDER's device (so the segment-sum scatter of the hash
  aggregation is purely local);
* each refinement step ``all_gather``s the label shards (the boundary
  exchange — labels are int32, so this is 4·N bytes per device per
  step over ICI), hashes locally against the global label vector, and
  emits local hash shards;
* id compaction is host-side ``np.unique`` over the gathered hashes,
  exactly like the single-chip fast path;
* per-level node-label histograms (the WL feature vector of the graph)
  come from a local bincount + ``psum``.

``edge_partitioned_wl_features`` returns the per-generation histogram
feature map of the large graph — the object that feeds Gram rows
against other graphs — plus the final labels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..batch import bucket_size
from ..ops import wl as wl_ops

__all__ = ["edge_partitioned_wl_features"]


def _refine_step(P, axis="g"):
    def step(labels, send_local, recv_global, emask):
        labels = labels[0]        # [N/P] local label shard
        send_local = send_local[0]
        recv_global = recv_global[0]
        emask = emask[0]
        # boundary exchange: gather every device's labels
        all_labels = jax.lax.all_gather(labels, axis).reshape(-1)  # [N]
        l = all_labels.astype(jnp.uint32)
        nl = l[recv_global]
        m1 = jnp.where(emask, wl_ops._fmix32(nl, 0x9E3779B9),
                       jnp.uint32(0))
        m2 = jnp.where(emask, wl_ops._fmix32(nl, 0x7F4A7C15),
                       jnp.uint32(0))
        n_local = labels.shape[0]
        s1 = jax.ops.segment_sum(m1, send_local, num_segments=n_local)
        s2 = jax.ops.segment_sum(m2, send_local, num_segments=n_local)
        lo = labels.astype(jnp.uint32)
        h1 = wl_ops._fmix32(lo * jnp.uint32(0x9E3779B9) + s1, 0x165667B1)
        h2 = wl_ops._fmix32(lo * jnp.uint32(0x85EBCA6B) + s2, 0x27D4EB2F)
        return h1[None], h2[None]
    return step


def edge_partitioned_wl_features(g, n_iter, mesh, axis="g"):
    """WL per-generation label histograms of one graph over a mesh.

    g: :class:`grakel_tpu.graph.Graph` with integer-enumerable node
    labels.  Returns (list of {label_id: count} dicts per generation,
    final numpy label array).
    """
    P = mesh.shape[axis]
    n = g.n
    npd = -(-n // P)
    N_pad = npd * P

    labs = g.get_labels(label_type="vertex")
    enum = {}
    labels = np.zeros(N_pad, np.int32)
    for v in range(n):
        l = labs[v]
        if l not in enum:
            enum[l] = len(enum)
        labels[v] = enum[l]
    # park padded nodes in a sink label so they never collide with real
    # ones and are dropped from histograms
    labels[n:] = -1
    node_valid = np.zeros(N_pad, bool)
    node_valid[:n] = True

    # edges on the sender's device, receiver kept GLOBAL
    send = np.asarray(g.senders, np.int64)
    recv = np.asarray(g.receivers, np.int64)
    dev = send // npd
    E_per = np.bincount(dev, minlength=P)
    E_pad = bucket_size(max(int(E_per.max()) if len(E_per) else 1, 1))
    send_local = np.zeros((P, E_pad), np.int32)
    recv_global = np.zeros((P, E_pad), np.int32)
    emask = np.zeros((P, E_pad), bool)
    fill = np.zeros(P, np.int64)
    for s, r in zip(send, recv):
        d = int(s // npd)
        k = fill[d]
        send_local[d, k] = s - d * npd
        recv_global[d, k] = r
        emask[d, k] = True
        fill[d] = k + 1

    spec = PartitionSpec(axis, None)
    step = shard_map(_refine_step(P, axis), mesh=mesh,
                     in_specs=(spec,) * 4, out_specs=(spec, spec))

    labels_sh = jnp.asarray(labels.reshape(P, npd))
    args = (jnp.asarray(send_local), jnp.asarray(recv_global),
            jnp.asarray(emask))

    def histogram(lab_flat):
        c = {}
        for l in lab_flat[node_valid]:
            c[int(l)] = c.get(int(l), 0) + 1
        return c

    feats = [histogram(labels[:N_pad])]
    cur = labels
    for _ in range(n_iter):
        h1, h2 = step(labels_sh, *args)
        ids, nu = wl_ops.host_compact(
            np.asarray(h1).ravel(), np.asarray(h2).ravel(), node_valid)
        cur = ids
        labels_sh = jnp.asarray(ids.reshape(P, npd).astype(np.int32))
        feats.append(histogram(cur))
    return feats, cur[:n]
