"""Edge-partitioned WL refinement for SINGLE large graphs, and the mixed
Gram path that lets huge graphs sit inside an ordinary dataset.

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
  exactly like the single-chip fast path.

The edge-partitioned hash arithmetic is BIT-IDENTICAL to the per-graph
batched refinement (ops/wl.wl_hash_refine), so hashes from huge and
small graphs can be compacted JOINTLY into one id space per generation —
that is what :func:`large_graph_wl_gram` does to produce a Gram over a
dataset that mixes a 50k-node graph with ordinary graphs (the scaling
axis the reference cannot reach: REDDIT-scale inputs OOM/TIMEOUT it,
reference doc/benchmarks/evaluation.rst:63-100).
"""

from __future__ import annotations

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
from .wl import _to_host

__all__ = ["edge_partitioned_wl_features", "large_graph_wl_gram"]


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


class _EdgePartition:
    """Sharding plan of one graph over a P-way mesh axis: node blocks +
    sender-local edge slices, packed with vectorized scatters."""

    def __init__(self, g, P):
        n = g.n
        self.n = n
        self.npd = npd = -(-n // P)
        self.N_pad = npd * P
        self.node_valid = np.zeros(self.N_pad, bool)
        self.node_valid[:n] = True

        send = np.asarray(g.senders, np.int64)
        recv = np.asarray(g.receivers, np.int64)
        dev = send // npd
        counts = np.bincount(dev, minlength=P)
        E_pad = bucket_size(max(int(counts.max()) if len(send) else 1, 1))
        self.send_local = np.zeros((P, E_pad), np.int32)
        self.recv_global = np.zeros((P, E_pad), np.int32)
        self.emask = np.zeros((P, E_pad), bool)
        if len(send):
            order = np.argsort(dev, kind="stable")
            dsort = dev[order]
            starts = np.zeros(P, np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            pos = np.arange(len(send)) - starts[dsort]
            self.send_local[dsort, pos] = (send[order]
                                           - dsort * npd).astype(np.int32)
            self.recv_global[dsort, pos] = recv[order].astype(np.int32)
            self.emask[dsort, pos] = True

    def device_args(self, sharding=None):
        if sharding is None:
            return (jnp.asarray(self.send_local),
                    jnp.asarray(self.recv_global), jnp.asarray(self.emask))
        # multi-process-safe: every process holds the identical host
        # copy and uploads its own shards of the global array
        put = lambda a: jax.device_put(a, sharding)  # noqa: E731
        return (put(self.send_local), put(self.recv_global),
                put(self.emask))


def _initial_labels(g, enum):
    """Shared-enumeration initial WL ids for one graph."""
    labs = g.get_labels(label_type="vertex")
    out = np.zeros(g.n, np.int32)
    for v in range(g.n):
        l = labs[v]
        if l not in enum:
            enum[l] = len(enum)
        out[v] = enum[l]
    return out


def _histogram(ids, valid):
    """{label_id: count} via one bincount (no Python per-node loop)."""
    vals = np.asarray(ids)[np.asarray(valid)]
    if vals.size == 0:
        return {}
    cnt = np.bincount(vals.astype(np.int64))
    nz = np.nonzero(cnt)[0]
    return {int(l): int(cnt[l]) for l in nz}


def edge_partitioned_wl_features(g, n_iter, mesh, axis="g"):
    """WL per-generation label histograms of one graph over a mesh.

    g: :class:`grakel_tpu.graph.Graph` with integer-enumerable node
    labels.  Returns (list of {label_id: count} dicts per generation,
    final numpy label array).
    """
    from jax.sharding import NamedSharding
    P = mesh.shape[axis]
    part = _EdgePartition(g, P)
    enum = {}
    labels = np.full(part.N_pad, -1, np.int32)
    labels[:g.n] = _initial_labels(g, enum)

    spec = PartitionSpec(axis, None)
    row_sh = NamedSharding(mesh, spec)
    step = shard_map(_refine_step(P, axis), mesh=mesh,
                     in_specs=(spec,) * 4, out_specs=(spec, spec))
    args = part.device_args(row_sh)

    feats = [_histogram(labels, part.node_valid)]
    cur = labels
    labels_sh = jax.device_put(labels.reshape(P, part.npd), row_sh)
    for _ in range(n_iter):
        h1, h2 = step(labels_sh, *args)
        ids, nu = wl_ops.host_compact(
            _to_host(h1).ravel(), _to_host(h2).ravel(),
            part.node_valid)
        cur = ids
        labels_sh = jax.device_put(
            ids.reshape(P, part.npd).astype(np.int32), row_sh)
        feats.append(_histogram(cur, part.node_valid))
    return feats, cur[:g.n]


def large_graph_wl_gram(graphs, n_iter, mesh, big_threshold=10000,
                        axis="g"):
    """Symmetric WL h=``n_iter`` subtree Gram for a dataset that may
    contain graphs too large for per-device residence.

    Graphs with ``n >= big_threshold`` refine EDGE-PARTITIONED over the
    mesh (node shards + sender-local edges, all_gather boundary
    exchange); the rest refine as one flat host batch
    (ops/wl.host_hash_refine — bit-identical arithmetic).  Each
    generation's hash pairs from both populations are compacted JOINTLY
    (one np.unique), so label ids live in a single shared space and the
    Gram equals the single-device WeisfeilerLehman Gram exactly.
    """
    from ..ops.gram import cpu_gemm

    graphs = list(graphs)
    n_graphs = len(graphs)
    big_idx = [i for i, g in enumerate(graphs) if g.n >= big_threshold]
    small_idx = [i for i, g in enumerate(graphs) if g.n < big_threshold]
    P = mesh.shape[axis]
    enum = {}

    # --- small population: one flat batch ---------------------------- #
    sm_graphs = [graphs[i] for i in small_idx]
    sm_n = np.array([g.n for g in sm_graphs], np.int64)
    sm_off = np.zeros(len(sm_graphs) + 1, np.int64)
    sm_off[1:] = np.cumsum(sm_n)
    Ns = int(sm_off[-1])
    sm_labels = np.zeros(Ns, np.int32)
    sm_gids = np.zeros(Ns, np.int64)
    sends, recvs = [], []
    for k, g in enumerate(sm_graphs):
        o = sm_off[k]
        sm_labels[o:o + g.n] = _initial_labels(g, enum)
        sm_gids[o:o + g.n] = small_idx[k]
        sends.append(np.asarray(g.senders, np.int64) + o)
        recvs.append(np.asarray(g.receivers, np.int64) + o)
    sm_send = np.concatenate(sends) if sends else np.zeros(0, np.int64)
    sm_recv = np.concatenate(recvs) if recvs else np.zeros(0, np.int64)

    # --- big population: edge-partitioned shards ---------------------- #
    from jax.sharding import NamedSharding
    parts, big_labels, steps = {}, {}, {}
    spec = PartitionSpec(axis, None)
    row_sh = NamedSharding(mesh, spec)
    for i in big_idx:
        part = _EdgePartition(graphs[i], P)
        lab = np.full(part.N_pad, -1, np.int32)
        lab[:graphs[i].n] = _initial_labels(graphs[i], enum)
        parts[i] = part
        big_labels[i] = lab
        steps[i] = shard_map(_refine_step(P, axis), mesh=mesh,
                             in_specs=(spec,) * 4,
                             out_specs=(spec, spec))

    K = np.zeros((n_graphs, n_graphs), np.float64)
    Kd = None  # device accumulator for the wide generations

    # flat (graph id, valid) node stream shared by every generation:
    # small-population nodes first, then each big graph's padded shard
    all_gids = np.concatenate(
        [sm_gids] + [np.full(parts[i].N_pad, i, np.int64)
                     for i in big_idx]).astype(np.int32) \
        if (Ns or big_idx) else np.zeros(0, np.int32)
    all_valid = np.concatenate(
        [np.ones(Ns, bool)] + [parts[i].node_valid for i in big_idx]) \
        if (Ns or big_idx) else np.zeros(0, bool)
    pad = bucket_size(max(len(all_gids), 1))
    gids_p = np.zeros(pad, np.int32)
    gids_p[:len(all_gids)] = all_gids
    valid_p = np.zeros(pad, bool)
    valid_p[:len(all_gids)] = all_valid
    ones_p = np.ones(pad, np.float32)

    # label-width bound below which one dense [n_graphs, width] count
    # matrix is cheap; wider generations (width grows toward the total
    # node count) stream COO through the chunked device counts-GEMM into
    # a device accumulator instead of densifying on host — the exact
    # OOM shape this module exists to avoid at REDDIT-M-12K scale
    _DENSE_WIDTH = 2048

    def node_label_stream(ids_small, ids_big):
        lab = np.zeros(pad, np.int32)
        lab[:Ns] = ids_small
        o = Ns
        for i in big_idx:
            lab[o:o + parts[i].N_pad] = ids_big[i]
            o += parts[i].N_pad
        return lab

    def accumulate_dense(ids_small, ids_big, width):
        counts = np.zeros((n_graphs, width), np.float32)
        if Ns:
            np.add.at(counts, (sm_gids, ids_small), 1.0)
        for i, ids in ids_big.items():
            v = parts[i].node_valid
            counts[i] += np.bincount(np.asarray(ids)[v].astype(np.int64),
                                     minlength=width)[:width]
        return cpu_gemm(counts).astype(np.float64)

    cur_small = sm_labels
    cur_big = {i: big_labels[i] for i in big_idx}
    width = max(len(enum), 1)
    for it in range(n_iter + 1):
        if width <= _DENSE_WIDTH:
            K += accumulate_dense(cur_small, cur_big, width)
        else:
            from ..ops.gram import coo_counts_gram_acc
            if Kd is None:
                Kd = jnp.zeros((n_graphs, n_graphs), jnp.float32)
            Kd = coo_counts_gram_acc(
                gids_p, node_label_stream(cur_small, cur_big), ones_p,
                valid_p, n_graphs, width, Kd)
        if it == n_iter:
            break
        # hash both populations with the same arithmetic
        if Ns:
            h1s, h2s = wl_ops.host_hash_refine(
                cur_small, sm_send, sm_recv,
                np.ones(len(sm_send), bool))
        else:
            h1s = h2s = np.zeros(0, np.uint32)
        hb = {}
        for i in big_idx:
            part = parts[i]
            lab_sh = jax.device_put(cur_big[i].reshape(P, part.npd),
                                    row_sh)
            h1, h2 = steps[i](lab_sh, *part.device_args(row_sh))
            hb[i] = (_to_host(h1).ravel(), _to_host(h2).ravel())
        # joint compaction: one shared id space per generation
        all_h1 = np.concatenate([h1s] + [hb[i][0] for i in big_idx]) \
            if big_idx else h1s
        all_h2 = np.concatenate([h2s] + [hb[i][1] for i in big_idx]) \
            if big_idx else h2s
        all_valid = np.concatenate(
            [np.ones(Ns, bool)] + [parts[i].node_valid for i in big_idx])
        ids, width = wl_ops.host_compact(all_h1, all_h2, all_valid)
        cur_small = ids[:Ns].astype(np.int32)
        o = Ns
        for i in big_idx:
            part = parts[i]
            cur_big[i] = ids[o:o + part.N_pad].astype(np.int32)
            o += part.N_pad
    if Kd is not None:
        from ..ops.gram import fetch_gram
        K += np.asarray(fetch_gram(Kd), np.float64)
    return K


class LargeGraphWL:
    """sklearn-style frontend over :func:`large_graph_wl_gram`.

    A drop-in WL subtree kernel for datasets that mix REDDIT-scale
    graphs (too large for per-device residence — the inputs that
    OOM/TIMEOUT the reference, reference doc/benchmarks/evaluation.rst:
    63-100) with ordinary graphs: members with ``n >= big_threshold``
    refine edge-partitioned over the mesh, the rest as one flat batch,
    and every Gram equals ``WeisfeilerLehman(n_iter=...)`` exactly
    (joint per-generation id compaction; see module docstring).

    ``transform`` recomputes refinement over the fit+transform union —
    WL refinement is per-graph independent, so fit-time ids are
    reproduced bit-identically and the rectangular block is exact (the
    same recompute strategy as the single-chip fast path,
    kernels/weisfeiler_lehman.py ``_device_rect``).
    """

    def __init__(self, n_iter=5, mesh=None, big_threshold=10000,
                 normalize=False, axis="g"):
        self.n_iter = n_iter
        self.mesh = mesh
        self.big_threshold = big_threshold
        self.normalize = normalize
        self.axis = axis

    def _mesh(self):
        if self.mesh is not None:
            return self.mesh
        from .mesh import make_mesh
        return make_mesh()

    def fit(self, X, y=None):
        from ..kernels.base import normalize_input
        self.X = normalize_input(X)
        return self

    def fit_transform(self, X, y=None):
        self.fit(X)
        K = large_graph_wl_gram(self.X, self.n_iter, self._mesh(),
                                big_threshold=self.big_threshold,
                                axis=self.axis)
        self._X_diag = np.diagonal(K).copy()
        if self.normalize:
            K = K / np.sqrt(np.outer(self._X_diag, self._X_diag))
        return K

    def transform(self, X):
        from sklearn.exceptions import NotFittedError
        from ..kernels.base import normalize_input
        if not hasattr(self, "X"):
            raise NotFittedError("call fit before transform")
        Y = normalize_input(X)
        nx = len(self.X)
        Kfull = large_graph_wl_gram(list(self.X) + list(Y), self.n_iter,
                                    self._mesh(),
                                    big_threshold=self.big_threshold,
                                    axis=self.axis)
        K = Kfull[nx:, :nx]
        self._X_diag = np.diagonal(Kfull)[:nx].copy()
        self._Y_diag = np.diagonal(Kfull)[nx:].copy()
        if self.normalize:
            K = K / np.sqrt(np.outer(self._Y_diag, self._X_diag))
        return K

    def diagonal(self):
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "_X_diag"):
            raise NotFittedError("call fit_transform before diagonal")
        if hasattr(self, "_Y_diag"):
            return self._X_diag, self._Y_diag
        return self._X_diag
