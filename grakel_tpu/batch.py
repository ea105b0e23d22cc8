"""GraphBatch: padded, device-resident batch of graphs.

This is the TPU-native replacement for looping over ``grakel.Graph``
objects (reference grakel/kernels/*.py parse_input loops).  All graphs in
a dataset are packed into flat arrays with masks; every kernel's feature
extraction then runs as vmapped / segment ops over the whole batch at once.

Two layouts, both padded to static bucket shapes so XLA compiles once per
bucket rather than once per dataset:

* **flat**  — concatenated node/edge arrays + per-node graph ids
              (segment-sum friendly: histograms, WL relabel, propagation)
* **dense** — ``[n_graphs, V_max, V_max]`` adjacency stack
              (MXU friendly: Floyd–Warshall, random walk, eigenvectors)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["GraphBatch", "bucket_size", "enumerate_labels"]

# pad-size buckets: next value in this ladder >= requested size; bounds the
# number of distinct compiled shapes per process.
_BUCKETS = [128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536,
            131072, 262144, 524288, 1048576, 2097152, 4194304]


def bucket_size(n, minimum=128):
    n = max(int(n), 1)
    for b in _BUCKETS:
        if b >= n and b >= minimum:
            return b
    # beyond the ladder: round up to a multiple of 128k
    step = 131072
    return ((n + step - 1) // step) * step


def enumerate_labels(labels, enum, extend=True):
    """Map hashable labels -> compact ints via mutable dict ``enum``.

    At fit time kernels pass a fresh dict (grown here); at transform time
    they pass the fit dict with ``extend=True`` so unseen labels get NEW ids
    past the fit range — reproducing the reference's ``_enum`` / ``_Y_enum``
    semantics (e.g. vertex_histogram.py:110-126).
    Returns an int32 numpy array.
    """
    out = np.empty(len(labels), dtype=np.int32)
    for i, lab in enumerate(labels):
        idx = enum.get(lab)
        if idx is None:
            if extend:
                idx = len(enum)
                enum[lab] = idx
            else:
                idx = -1
        out[i] = idx
    return out


@dataclasses.dataclass
class GraphBatch:
    """Padded batch.  Host metadata is numpy; device arrays are jnp."""

    n_graphs: int
    # ---- flat layout (always built) ----
    node_graph_ids: jnp.ndarray    # i32 [N_pad]; == n_graphs for padding
    node_mask: jnp.ndarray         # bool [N_pad]
    node_labels: jnp.ndarray       # i32 [N_pad]; 0 where unlabeled/pad
    senders: jnp.ndarray           # i32 [E_pad] global node index; pad -> N_pad-1
    receivers: jnp.ndarray         # i32 [E_pad]
    edge_mask: jnp.ndarray         # bool [E_pad]
    edge_weights: jnp.ndarray      # f32 [E_pad]; 0 on padding
    edge_labels: jnp.ndarray       # i32 [E_pad]
    edge_graph_ids: jnp.ndarray    # i32 [E_pad]; == n_graphs for padding
    # ---- host metadata ----
    n_nodes: np.ndarray            # i64 [n_graphs]
    n_edges: np.ndarray            # i64 [n_graphs]
    node_offsets: np.ndarray       # i64 [n_graphs+1] start of each graph's nodes
    num_node_labels: int
    num_edge_labels: int
    # ---- lazy dense layout ----
    _dense_adj: Optional[jnp.ndarray] = None         # f32 [n, V_max, V_max]
    _dense_labels: Optional[jnp.ndarray] = None      # i32 [n, V_max]
    _dense_mask: Optional[jnp.ndarray] = None        # bool [n, V_max]

    # ------------------------------------------------------------------ #
    @property
    def total_nodes(self) -> int:
        return int(self.node_offsets[-1])

    @property
    def total_edges(self) -> int:
        return int(self.n_edges.sum())

    @property
    def max_nodes(self) -> int:
        return int(self.n_nodes.max()) if self.n_graphs else 0

    @classmethod
    def from_graphs(cls, graphs, node_label_enum=None, edge_label_enum=None,
                    extend_enums=True, node_pad=None, edge_pad=None,
                    to_device=True):
        """Pack a list of :class:`grakel_tpu.graph.Graph` into one batch.

        ``node_label_enum`` / ``edge_label_enum`` are mutable dicts mapping
        raw labels to compact ids (see :func:`enumerate_labels`); pass the
        fit-time dicts at transform time for consistent ids.

        ``to_device=False`` keeps the flat arrays as numpy — callers that
        may run fully on host (e.g. the WL fast path below its size
        thresholds) avoid ~9 host->device uploads they would never use;
        ``jnp.asarray`` converts lazily where a device path needs them.
        """
        n = len(graphs)
        n_nodes = np.array([g.n for g in graphs], dtype=np.int64)
        n_edges = np.array([len(g.senders) for g in graphs], dtype=np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_nodes, out=offsets[1:])
        N = int(offsets[-1])
        E = int(n_edges.sum())
        N_pad = node_pad or bucket_size(N + 1)  # +1: reserve a sink pad node
        E_pad = edge_pad or bucket_size(max(E, 1))

        node_gid = np.full(N_pad, n, dtype=np.int32)
        node_msk = np.zeros(N_pad, dtype=bool)
        send = np.full(E_pad, N_pad - 1, dtype=np.int32)
        recv = np.full(E_pad, N_pad - 1, dtype=np.int32)
        ew = np.zeros(E_pad, dtype=np.float32)
        edge_gid = np.full(E_pad, n, dtype=np.int32)
        edge_msk = np.zeros(E_pad, dtype=bool)

        # vectorized packing: one concatenate per array instead of a
        # python loop of slice assignments per graph
        node_gid[:N] = np.repeat(np.arange(n, dtype=np.int32), n_nodes)
        node_msk[:N] = True
        edge_off = np.repeat(offsets[:-1], n_edges).astype(np.int32)
        if E:
            send[:E] = np.concatenate(
                [g.senders for g in graphs]) + edge_off
            recv[:E] = np.concatenate(
                [g.receivers for g in graphs]) + edge_off
            ew[:E] = np.concatenate([g.weights for g in graphs])
            edge_gid[:E] = np.repeat(np.arange(n, dtype=np.int32), n_edges)
            edge_msk[:E] = True
        if node_label_enum is None:
            node_label_enum = {}
        if edge_label_enum is None:
            edge_label_enum = {}

        # vectorized fast path: fresh enums + all-integer node labels +
        # no edge labels -> one np.unique instead of per-item dict ops.
        # (Only valid for fresh enums: ids come out value-ordered, not
        # first-occurrence-ordered; downstream Grams are id-permutation
        # invariant and all fresh-enum callers pass whole batches.)
        nl = el = None
        if extend_enums and not node_label_enum and not edge_label_enum \
                and all(not g.edge_labels for g in graphs):
            arrs = [g.numeric_node_label_array() for g in graphs]
            if all(a is not None for a in arrs):
                raw = (np.concatenate(arrs) if arrs
                       else np.zeros(0, np.int64))
                uniq, nl = np.unique(raw, return_inverse=True)
                nl = nl.astype(np.int32)
                node_label_enum.update(
                    {int(u): i for i, u in enumerate(uniq)})
                el = np.zeros(E, dtype=np.int32)
                if E:
                    edge_label_enum[0] = 0
        if nl is None:
            node_lab_raw = []
            edge_lab_raw = []
            for g in graphs:
                labs = g.node_labels
                node_lab_raw.extend(labs.get(v, 0) for v in range(g.n))
                elabs = g.edge_labels
                edge_lab_raw.extend(
                    elabs.get((int(s), int(r)), 0)
                    for s, r in zip(g.senders, g.receivers))
            nl = enumerate_labels(node_lab_raw, node_label_enum,
                                  extend_enums)
            el = enumerate_labels(edge_lab_raw, edge_label_enum,
                                  extend_enums)
        node_lab = np.zeros(N_pad, dtype=np.int32)
        node_lab[:N] = nl
        edge_lab = np.zeros(E_pad, dtype=np.int32)
        edge_lab[:E] = el

        conv = jnp.asarray if to_device else (lambda a: a)
        return cls(
            n_graphs=n,
            node_graph_ids=conv(node_gid),
            node_mask=conv(node_msk),
            node_labels=conv(node_lab),
            senders=conv(send),
            receivers=conv(recv),
            edge_mask=conv(edge_msk),
            edge_weights=conv(ew),
            edge_labels=conv(edge_lab),
            edge_graph_ids=conv(edge_gid),
            n_nodes=n_nodes,
            n_edges=n_edges,
            node_offsets=offsets,
            num_node_labels=len(node_label_enum),
            num_edge_labels=len(edge_label_enum),
        )

    # ------------------------------------------------------------------ #
    def dense(self, v_max=None):
        """Dense per-graph layout ``(adj [n,V,V], labels [n,V], mask [n,V])``.

        V is bucketed to a multiple of 8 (f32 sublane) >= max graph size.
        Built once and cached.
        """
        if self._dense_adj is not None and (
                v_max is None or self._dense_adj.shape[1] >= v_max):
            return self._dense_adj, self._dense_labels, self._dense_mask
        V = v_max or max(8, int(np.ceil(self.max_nodes / 8.0)) * 8)
        n = self.n_graphs
        # host-side scatter (one-time packing cost, off the compute path)
        gid = np.asarray(self.edge_graph_ids)
        s = np.asarray(self.senders)
        r = np.asarray(self.receivers)
        w = np.asarray(self.edge_weights)
        msk = np.asarray(self.edge_mask)
        offs = self.node_offsets
        A = np.zeros((n, V, V), dtype=np.float32)
        valid = msk & (gid < n)
        gi = gid[valid]
        li = s[valid] - offs[gi]
        lj = r[valid] - offs[gi]
        A[gi, li, lj] = w[valid]
        L = np.zeros((n, V), dtype=np.int32)
        M = np.zeros((n, V), dtype=bool)
        nlab = np.asarray(self.node_labels)
        for g in range(n):
            k = int(self.n_nodes[g])
            L[g, :k] = nlab[offs[g]:offs[g] + k]
            M[g, :k] = True
        self._dense_adj = jnp.asarray(A)
        self._dense_labels = jnp.asarray(L)
        self._dense_mask = jnp.asarray(M)
        return self._dense_adj, self._dense_labels, self._dense_mask
