"""ODD-STh kernel (Da San Martino et al., ordered DAG decomposition).

Reference semantics (grakel/kernels/odd_sth.py):

* per graph, per vertex v: BFS DAG rooted at v keeping edges to nodes at
  the same-or-deeper BFS level, depth-capped at ``h`` (:333-376);
* inverse topological ordering (Kahn's algorithm, queue sorted by vertex
  label each step) and edge lists sorted by (ordering, label) (:379-457);
* bottom-up subtree canonical IDs ``label(child_id,child_id,...)`` with
  per-node subtree size d and frequency (:460-511);
* all per-vertex DAGs of a graph merge into one DAG keyed by ID, then all
  graphs merge into a *bigDAG* with per-graph frequency vectors
  (:514-608);
* K = phi^T (C * phi) where phi[node, graph] = frequency and C[node] is
  the node's frequency in the first graph that contributed it (the
  reference stores the inserting frequency in position 0 of each bigDAG
  entry, odd_sth.py:604, and reads it back as C at :160-166);
  transform deep-copies the fit bigDAG and appends the new graphs
  (:101-120).

The decomposition is inherently sequential/host-bound; the TPU part is
the Gram: features are scaled by sqrt(C) and streamed through the
chunked counts-GEMM (K = (phi sqrtC)^T (phi sqrtC)).

Note: the reference's ``diagonal()`` references a non-existent
``_phi_X`` attribute and crashes on the fit-then-transform path; this
implementation computes the documented quantity instead.
"""

from __future__ import annotations

import copy
import warnings
from collections import defaultdict

import numpy as np

from .base import Kernel, normalize_input
from ..batch import bucket_size
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag,
                        normalize_gram)

__all__ = ["OddSth"]


def _bfs_dag(root, nbrs, h):
    """BFS DAG from ``root``: level dict + child lists (reference dag())."""
    q = [(root, 0)]
    level = {root: 0}
    children = defaultdict(list)
    while q:
        u, lev = q.pop(0)
        if lev == h:
            break
        for n in nbrs[u]:
            if n not in level:
                children[u].append(n)
                q.append((n, lev + 1))
                level[n] = lev + 1
            elif level[n] >= lev + 1:
                children[u].append(n)
    return set(level.keys()), children


def _inverse_topological(vertices, children, labels):
    """Kahn's algorithm with the reference's label-sorted queue; returns
    (ordering dict, children with lists sorted by (ordering, label)).

    The reference re-sorts the whole queue by label before every pop
    (stable, so equal labels keep insertion order); a heap keyed by
    (label, insertion counter) pops in exactly that order in O(log k).
    """
    indeg = {}
    zero = set(vertices)
    for u, cs in children.items():
        for v in cs:
            indeg[v] = indeg.get(v, 0) + 1
            zero.discard(v)
    import heapq
    cnt = 0
    q = []
    for x in zero:
        q.append((labels[x], cnt, x))
        cnt += 1
    heapq.heapify(q)
    ordering = {}
    visited = len(vertices)
    while q:
        _, _, e = heapq.heappop(q)
        ordering[e] = visited
        for k in children[e]:
            if k in indeg:
                if indeg[k] == 1:
                    indeg.pop(k)
                    heapq.heappush(q, (labels[k], cnt, k))
                    cnt += 1
                else:
                    indeg[k] -= 1
        visited -= 1
    for u in children:
        children[u].sort(key=lambda x: (ordering[x], labels[x]))
    return ordering, children


def _hash_tree(vertices, children, ordering, labels):
    """Bottom-up subtree IDs; returns ({v: [d, freq, ID]}, {ID: [v...]},
    v_ordered) (reference hash_trees())."""
    v_ordered = sorted(vertices, key=lambda x: (ordering[x], labels[x]))
    hash_map = {}
    info = {}
    for v in v_ordered:
        cs = children.get(v, [])
        if len(cs) == 0:
            ID = str(labels[v])
            info[v] = [0, 1, ID]
        else:
            d = 0
            ids = []
            for c in cs:
                d += 1 + info[c][0]
                ids.append(info[c][2])
            ID = str(labels[v]) + "(" + ",".join(ids) + ")"
            info[v] = [d, 1, ID]
        hash_map.setdefault(ID, []).append(v)
    return info, hash_map, v_ordered


def _merge(dag, acc, merge_features=True, col=None):
    """Merge one DAG into the accumulator keyed by subtree ID
    (reference big_dag_append()); acc = (info, hash_map, edges, labels).

    With ``merge_features`` (within-graph merging) frequencies are plain
    ints.  Without it (the cross-graph bigDAG), each node's frequency is
    a sparse ``{graph column: count}`` dict written at ``col`` — the
    reference densifies a per-graph list instead (odd_sth.py:514-608),
    which is O(nodes x graphs); the dict keeps it O(nnz).
    """
    info, hash_map, v_ordered, children, labels = dag
    if acc is None:
        D_info, D_hash, D_edges, D_labels = {}, {}, {}, {}
    else:
        D_info, D_hash, D_edges, D_labels = acc
    idx = len(D_info)
    for q in v_ordered:
        key = info[q][2]
        if key in D_hash:
            node = D_hash[key][0]
            if merge_features:
                D_info[node][1] += info[q][1]
            else:
                f = D_info[node][1]
                f[col] = f.get(col, 0) + info[q][1]
        else:
            D_labels[idx] = labels[q]
            d_edges = []
            seen = set()
            for c in children.get(q, []):
                ck = info[c][2]
                if ck in D_hash:
                    node = D_hash[ck][0]
                    if node not in seen:
                        d_edges.append(node)
                        seen.add(node)
            D_edges[idx] = d_edges
            D_hash[key] = [idx]
            freq = info[q][1] if merge_features else {col: info[q][1]}
            # position 0 mirrors the reference exactly (odd_sth.py:604):
            # the inserting frequency, NOT the subtree size d from
            # hash_trees — the reference's C weights are the frequency of
            # the subtree in the first graph that contributed it
            D_info[idx] = [info[q][1], freq, key]
            idx += 1
    return (D_info, D_hash, D_edges, D_labels)


def _graph_big_dag(g, h):
    """All per-vertex DAGs of one graph merged, reordered
    (reference make_big_dag())."""
    labs = g.get_labels(label_type="vertex", return_none=True)
    if labs is None:
        raise ValueError("OddSth requires node labels")
    nbrs = [g.neighbors(v) for v in range(g.n)]
    acc = None
    for v in range(g.n):
        vertices, children = _bfs_dag(v, nbrs, h)
        ordering, children = _inverse_topological(vertices, children, labs)
        info, hash_map, v_ordered = _hash_tree(vertices, children,
                                               ordering, labs)
        acc = _merge((info, hash_map, v_ordered, children, labs), acc)
    D_info, D_hash, D_edges, D_labels = acc
    ordering, D_edges = _inverse_topological(
        set(D_info.keys()), D_edges, D_labels)
    v_ordered = sorted(D_info.keys(),
                       key=lambda x: (ordering[x], D_labels[x]))
    return (D_info, D_hash, v_ordered, D_edges, D_labels)


def _stable_label_id(l):
    """Stable (cross-process) 64-bit identity of a node label for the
    native fingerprint engine: integral values map to themselves, other
    labels to an FNV-1a of their string form with the top bit set."""
    if isinstance(l, (int, np.integer)) or (
            isinstance(l, (float, np.floating)) and float(l).is_integer()):
        u = int(l) & 0xFFFFFFFFFFFFFFFF
    else:
        u = 0xCBF29CE484222325
        for b in str(l).encode("utf-8", "surrogatepass"):
            u = ((u ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        u |= 1 << 63
    return u - (1 << 64) if u >= (1 << 63) else u


class OddSth(Kernel):
    """ODD-STh kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False, h=None):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.h = h

    def initialize(self):
        if self.h is not None and (not isinstance(self.h, int)
                                   or self.h <= 0):
            raise ValueError("h must be an integer bigger than zero")
        self.h_ = -1 if self.h is None else self.h

    # ---------------------------------------------------------------- #
    # native path: the whole batch decomposition (BFS DAGs, Kahn
    # ordering, subtree fingerprints, per-graph merge) runs in C++
    # (native/src/odd_sth.cpp); the big-DAG state is plain arrays.
    # ---------------------------------------------------------------- #
    def _decompose_native(self, graphs):
        from ..native import odd_sth_decompose_native, have_native
        if not have_native():
            return None
        per_graph = []
        for g in graphs:
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError("OddSth requires node labels")
            per_graph.append([labs[v] for v in range(g.n)])
        flat = [l for ls in per_graph for l in ls]
        try:
            distinct = sorted(set(flat))
        except TypeError:   # unsortable/unhashable labels -> python path
            return None
        code_of = {l: i for i, l in enumerate(distinct)}
        id_of = {l: _stable_label_id(l) for l in distinct}
        codes = np.fromiter((code_of[l] for l in flat), np.int64,
                            len(flat))
        ids = np.fromiter((id_of[l] for l in flat), np.int64, len(flat))
        node_off = np.zeros(len(graphs) + 1, np.int64)
        np.cumsum([g.n for g in graphs], out=node_off[1:])
        adj_parts, deg_parts = [], []
        for g in graphs:
            s = np.asarray(g.senders)
            # neighbor order must match Graph.neighbors (edge order)
            order = np.argsort(s, kind="stable")
            adj_parts.append(np.asarray(g.receivers)[order]
                             .astype(np.int32))
            deg_parts.append(np.bincount(s, minlength=g.n)
                             .astype(np.int64))
        adj = (np.concatenate(adj_parts) if adj_parts
               else np.zeros(0, np.int32))
        degs = (np.concatenate(deg_parts) if deg_parts
                else np.zeros(0, np.int64))
        adj_off = np.zeros(len(degs) + 1, np.int64)
        np.cumsum(degs, out=adj_off[1:])
        out = odd_sth_decompose_native(node_off, adj_off, adj, codes,
                                       ids, self.h_)
        if out is None:  # pragma: no cover
            return None
        ha, hb, C, node, graph, freq = out
        return {"ha": ha, "hb": hb, "C": C, "node": node, "graph": graph,
                "freq": freq, "ncols": len(graphs)}

    @staticmethod
    def _merge_native(fit, y):
        """Append a transform batch to the fit big-DAG table: matched
        fingerprints reuse fit rows (and fit C weights); fresh ones get
        new rows in the transform batch's first-appearance order, C =
        their frequency in the first transform graph containing them —
        exactly the reference's deep-copy-and-append semantics
        (reference odd_sth.py:101-120)."""
        Df = len(fit["ha"])
        allk = np.concatenate([
            np.stack([fit["ha"], fit["hb"]], axis=1),
            np.stack([y["ha"], y["hb"]], axis=1)])
        _, inv = np.unique(allk, axis=0, return_inverse=True)
        inv = inv.reshape(-1)
        lut = np.full(inv.max() + 1 if len(inv) else 1, -1, np.int64)
        lut[inv[:Df]] = np.arange(Df)
        y_row = lut[inv[Df:]]
        fresh = y_row < 0
        y_row = np.where(fresh, Df + np.cumsum(fresh) - 1, y_row)
        return {
            "ha": np.concatenate([fit["ha"], y["ha"][fresh]]),
            "hb": np.concatenate([fit["hb"], y["hb"][fresh]]),
            "C": np.concatenate([fit["C"], y["C"][fresh]]),
            "node": np.concatenate([fit["node"].astype(np.int64),
                                    y_row[y["node"]]]),
            "graph": np.concatenate([fit["graph"].astype(np.int64),
                                     y["graph"] + fit["ncols"]]),
            "freq": np.concatenate([fit["freq"], y["freq"]]),
            "ncols": fit["ncols"] + y["ncols"],
        }

    @staticmethod
    def _native_stream(state, col_lo, col_hi):
        """(graph, node, freq*sqrt(C)) COO for columns in range."""
        cols = state["graph"]
        sel = (cols >= col_lo) & (cols < col_hi)
        nodes = state["node"][sel]
        w = (state["freq"][sel].astype(np.float64)
             * np.sqrt(state["C"][nodes].astype(np.float64)))
        return ((cols[sel] - col_lo).astype(np.int32),
                nodes.astype(np.int32), w.astype(np.float32))

    def parse_input(self, X):
        graphs = normalize_input(X)
        fit_native = (self._method_calling != 3
                      or isinstance(self.X, dict))
        native = self._decompose_native(graphs) if fit_native else None
        if native is not None:
            if self._method_calling == 3:
                merged = self._merge_native(self.X, native)
                self._ny = len(graphs)
                return merged
            self._nx = len(graphs)
            return native
        if self._method_calling == 3 and isinstance(self.X, dict):
            raise RuntimeError(
                "OddSth was fitted with the native decomposition engine "
                "but it is unavailable for transform (no compiler, or "
                "unsortable labels); refit with matching inputs")
        if self._method_calling == 3:
            out = copy.deepcopy(self.X)
            col0 = self._nx
        else:
            out = None
            col0 = 0
        for ci, g in enumerate(graphs):
            out = _merge(_graph_big_dag(g, self.h_), out,
                         merge_features=False, col=col0 + ci)
        if self._method_calling in (1, 2):
            self._nx = len(graphs)
        else:
            self._ny = len(graphs)
        return out

    # ------------------------------------------------------------------ #
    @staticmethod
    def _stream(big_dag, col_range):
        """COO (graph, node, freq*sqrt(C)) items for graph columns in
        ``col_range``; O(nnz) over the sparse frequency dicts."""
        D_info = big_dag[0]
        gids, feats, wts = [], [], []
        start, stop = col_range.start, col_range.stop
        for i, v in enumerate(D_info.keys()):
            C = D_info[v][0]
            if C == 0:
                continue
            sc = np.sqrt(C)
            for j, f in D_info[v][1].items():
                if start <= j < stop and f:
                    gids.append(j - start)
                    feats.append(i)
                    wts.append(f * sc)
        return (np.asarray(gids, np.int32), np.asarray(feats, np.int32),
                np.asarray(wts, np.float32))

    @staticmethod
    def _pad(g, k, w):
        pad = bucket_size(max(len(g), 1))
        gg = np.zeros(pad, np.int32)
        kk = np.zeros(pad, np.int32)
        ww = np.zeros(pad, np.float32)
        vv = np.zeros(pad, bool)
        gg[:len(g)] = g
        kk[:len(g)] = k
        ww[:len(g)] = w
        vv[:len(g)] = True
        return gg, kk, ww, vv

    # feature-space width above which the Gram is assembled on host as a
    # scipy sparse product instead of the device chunked counts-GEMM:
    # bigDAGs at REDDIT scale reach millions of distinct subtrees, where
    # the chunk loop degenerates (n_chunks * nnz work) and the giant
    # padded stream has crashed the TPU worker outright.  The sparse
    # host product is O(sum of in-column pair products) — the natural
    # cost of a ~1-nnz-per-row-per-column matrix.
    _DEVICE_MAX_WIDTH = 1 << 20

    @staticmethod
    def _host_sparse_gram(g, k, w, n, m, D, rect_gk=None):
        import scipy.sparse as sp
        A = sp.csr_matrix((w, (g, k)), shape=(n, D))
        if rect_gk is None:
            return np.asarray((A @ A.T).toarray(), np.float64)
        g2, k2, w2 = rect_gk
        B = sp.csr_matrix((w2, (g2, k2)), shape=(m, D))
        return np.asarray((A @ B.T).toarray(), np.float64)

    def fit_transform(self, X, y=None):
        self._method_calling = 2
        self.fit(X)
        big = self.X
        if isinstance(big, dict):
            D = len(big["C"])
            g, k, w = self._native_stream(big, 0, self._nx)
        else:
            D = len(big[0])
            g, k, w = self._stream(big, range(self._nx))
        L = bucket_size(max(D, 1))
        if L > self._DEVICE_MAX_WIDTH:
            km = self._host_sparse_gram(g, k, w, self._nx, self._nx, D)
        else:
            gg, kk, ww, vv = self._pad(g, k, w)
            km = np.asarray(coo_counts_gram(gg, kk, ww, vv, self._nx, L),
                            np.float64)
        self._X_diag = np.diagonal(km).copy()
        if self.normalize:
            return np.nan_to_num(normalize_gram(km, self._X_diag,
                                                self._X_diag))
        return km

    def transform(self, X):
        self._method_calling = 3
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "X") or self.X is None:
            raise NotFittedError("call fit before transform")
        full = self.parse_input(X)
        if isinstance(full, dict):
            D = len(full["C"])
            gx, kx, wx = self._native_stream(full, 0, self._nx)
            gy, ky, wy = self._native_stream(full, self._nx,
                                             self._nx + self._ny)
        else:
            D = len(full[0])
            gx, kx, wx = self._stream(full, range(self._nx))
            gy, ky, wy = self._stream(full, range(self._nx,
                                                  self._nx + self._ny))
        L = bucket_size(max(D, 1))
        if L > self._DEVICE_MAX_WIDTH:
            km = self._host_sparse_gram(gy, ky, wy, self._ny, self._nx, D,
                                        rect_gk=(gx, kx, wx))
            dx = np.zeros(self._nx)
            np.add.at(dx, gx, wx.astype(np.float64) ** 2)
            dy = np.zeros(self._ny)
            np.add.at(dy, gy, wy.astype(np.float64) ** 2)
            self._X_diag = dx
            self._Y_diag_cache = dy
        else:
            ga, ka, wa, va = self._pad(gy, ky, wy)
            gb, kb, wb, vb = self._pad(gx, kx, wx)
            km = np.asarray(coo_counts_gram_rect(
                ga, ka, wa, va, gb, kb, wb, vb, self._ny, self._nx, L),
                np.float64)
            # diagonals from the joint bigDAG feature space
            self._X_diag = np.asarray(
                counts_diag(gb, kb, wb, vb, self._nx, L), np.float64)
            self._Y_diag_cache = np.asarray(
                counts_diag(ga, ka, wa, va, self._ny, L), np.float64)
        self._is_transformed = True
        if self.normalize:
            km = normalize_gram(km, self._Y_diag_cache, self._X_diag)
        return km

    def diagonal(self):
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "_X_diag"):
            raise NotFittedError("call fit_transform or transform first")
        if getattr(self, "_is_transformed", False):
            return self._X_diag, self._Y_diag_cache
        return self._X_diag
