"""Distributed WL subtree Gram: graph-sharded refinement + ring tiling.

The whole-dataset equivalent of the single-chip WL fast path
(kernels/weisfeiler_lehman.py) over a 1-D device mesh:

* graphs are assigned to devices in contiguous blocks (whole graphs —
  edges never straddle devices, so refinement is local);
* WL hashing runs per shard in one ``shard_map``-ped step per
  generation; label-id consistency across devices comes from a host
  ``np.unique`` over the gathered hash pairs (the same host-compaction
  trade that wins on single chip — the gather is ~1 MB/device);
* per-generation histogram Grams accumulate as ring-tiled row blocks
  (``parallel.gram._ring_body``): each step overlaps one MXU GEMM with
  one ICI ``ppermute`` hop.

``distributed_wl_gram`` computes the full symmetric Gram for a list of
host graphs on every addressable device of a mesh.
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
from ..ops.gram import chunk_plan
from .gram import _ring_body

__all__ = ["distributed_wl_gram"]


def _to_host(x):
    """Full numpy copy of a (possibly multi-process-sharded) array.

    Single-process arrays are fully addressable and copy directly; under
    ``jax.distributed`` the per-process shards are allgathered first so
    every process sees the same global value (host compaction must be
    deterministic and identical across processes)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _shard_graphs(graphs, n_devices, node_label_enum):
    """Pack graphs into per-device flat arrays [P, ...] with equal pads.

    Graphs are assigned to contiguous blocks of ``gpd = ceil(n/P)``
    graphs per device; node/edge arrays are padded to the max per-device
    size (bucketed).
    """
    from ..batch import enumerate_labels
    n = len(graphs)
    P = n_devices
    gpd = -(-n // P)
    dev_graphs = [graphs[d * gpd:(d + 1) * gpd] for d in range(P)]
    N_pad = bucket_size(max(
        (sum(g.n for g in gs) + 1) for gs in dev_graphs if gs) or 1)
    E_pad = bucket_size(max(
        max((sum(len(g.senders) for g in gs) for gs in dev_graphs
             if gs), default=1), 1))

    labels = np.zeros((P, N_pad), np.int32)
    gids = np.full((P, N_pad), gpd, np.int32)
    nmask = np.zeros((P, N_pad), bool)
    send = np.full((P, E_pad), N_pad - 1, np.int32)
    recv = np.full((P, E_pad), N_pad - 1, np.int32)
    emask = np.zeros((P, E_pad), bool)

    for d, gs in enumerate(dev_graphs):
        npos = 0
        epos = 0
        for li, g in enumerate(gs):
            labs = g.get_labels(label_type="vertex")
            raw = [labs[v] for v in range(g.n)]
            ids = enumerate_labels(raw, node_label_enum, extend=True)
            labels[d, npos:npos + g.n] = ids
            gids[d, npos:npos + g.n] = li
            nmask[d, npos:npos + g.n] = True
            m = len(g.senders)
            send[d, epos:epos + m] = g.senders + npos
            recv[d, epos:epos + m] = g.receivers + npos
            emask[d, epos:epos + m] = True
            npos += g.n
            epos += m
    return labels, gids, nmask, send, recv, emask, gpd


def _make_step(P, gpd, n_chunks, chunk, axis="g"):
    def step(labels, gids, nmask, send, recv, emask, K):
        labels = labels[0]
        gids = gids[0]
        nmask = nmask[0]
        send = send[0]
        recv = recv[0]
        emask = emask[0]
        K = K[0]
        N_loc = labels.shape[0]
        # local per-generation histogram -> ring Gram row block
        ones = jnp.where(nmask, 1.0, 0.0).astype(jnp.float32)
        L = n_chunks * chunk

        def gram_chunk(c, Kacc):
            lo = c * chunk
            rel = labels - lo
            inc = nmask & (rel >= 0) & (rel < chunk)
            g = jnp.where(inc, gids, gpd)
            r = jnp.where(inc, rel, 0)
            seg = g * chunk + r
            counts = jax.ops.segment_sum(
                jnp.where(inc, ones, 0.0), seg,
                num_segments=(gpd + 1) * chunk)
            phi = counts.reshape(gpd + 1, chunk)[:gpd]
            return Kacc + _ring_body(phi, P, axis)

        K0 = jax.lax.pvary(jnp.zeros((gpd, P * gpd), jnp.float32),
                           (axis,))
        Kadd = jax.lax.fori_loop(0, n_chunks, gram_chunk, K0)
        K = K + Kadd
        h1, h2 = wl_ops.wl_hash_refine(labels, send, recv, emask)
        return K[None], h1[None], h2[None]
    return step


def distributed_wl_gram(graphs, n_iter, mesh, axis="g"):
    """Symmetric WL h=``n_iter`` subtree Gram over a device mesh.

    graphs: list of :class:`grakel_tpu.graph.Graph`.  Returns the
    [n, n] numpy Gram (upper pad rows stripped).
    """
    P = mesh.shape[axis]
    enum = {}
    labels, gids, nmask, send, recv, emask, gpd = _shard_graphs(
        graphs, P, enum)
    n = len(graphs)
    L = max(len(enum), 1)

    spec = PartitionSpec(axis, None)
    # device_put with explicit shardings so host numpy becomes global
    # sharded arrays in BOTH single- and multi-process meshes (every
    # process holds the identical full-host copy and uploads its shards)
    from jax.sharding import NamedSharding
    row_sh = NamedSharding(mesh, spec)
    K_sh = NamedSharding(mesh, PartitionSpec(axis, None, None))
    put = functools.partial(jax.device_put, device=row_sh)
    K = jax.device_put(np.zeros((P, gpd, P * gpd), np.float32), K_sh)
    labels_j = put(labels)
    args = tuple(map(put, (gids, nmask, send, recv, emask)))
    nmask_np = nmask

    for it in range(n_iter + 1):
        nc, ch = chunk_plan(L)
        step = shard_map(
            _make_step(P, gpd, nc, ch, axis), mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(PartitionSpec(axis, None, None),
                       spec, spec))
        K, h1, h2 = step(labels_j, *args, K)
        if it < n_iter:
            ids, nu = wl_ops.host_compact(
                _to_host(h1).ravel(), _to_host(h2).ravel(),
                nmask_np.ravel())
            labels_j = put(ids.reshape(nmask_np.shape).astype(np.int32))
            L = bucket_size(nu)

    # assemble [P*gpd, P*gpd] from per-device row blocks, strip padding
    Kfull = _to_host(K).reshape(P * gpd, P * gpd)
    return Kfull[:n, :n]
