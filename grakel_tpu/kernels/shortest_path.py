"""Shortest-path kernels.

``ShortestPath`` — reference semantics (grakel/kernels/shortest_path.py:
413-500): per graph compute APSP; features count triplets
``(label_u, label_v, d(u, v))`` (labeled) or distances ``d(u, v)``
(unlabeled), skipping ``u == v`` and unreachable pairs; Gram is the dot
product of those count vectors, with transform-time features unseen at
fit contributing nothing (enum-extension semantics, :477-487).

TPU design: APSP = batched Floyd-Warshall over V-size-bucketed dense
batches (ops/floyd_warshall.py).  Triplets are hashed to a
(distance-bits, label-pair) uint32 pair per (u, v), compacted to dense
feature ids with the same sort-based compaction used by WL, then pushed
through the chunked counts-GEMM.  Exact float distance equality matches
the reference's dict-key equality for weighted graphs.

``ShortestPathAttr`` — reference computes an O(n^4) Python loop
(shortest_path.py:131-165).  Here each pair kernel is reformulated per
distinct distance value d:  k(x, y) = sum_d sum(M * (X_d @ M @ Y_d))
with M[i,k] = metric(attr_x_i, attr_y_k), X_d = [S_x == d],
Y_d = [S_y == d] — two MXU GEMMs per distance instead of a quadruple
loop (derivation: grouping index pairs by equal distance).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .base import Kernel, normalize_input
from ..batch import bucket_size
from ..ops.floyd_warshall import batched_floyd_warshall, INF
from ..ops.wl import compact_ids
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag,
                        normalize_gram)

__all__ = ["ShortestPath", "ShortestPathAttr"]


def _size_buckets(graphs):
    """Group graph indices by padded vertex-count bucket (powers of two,
    min 8) to bound both padding waste and recompilation."""
    out = {}
    for i, g in enumerate(graphs):
        v = max(8, 1 << (max(g.n - 1, 1)).bit_length())
        out.setdefault(v, []).append(i)
    return out


@jax.jit
def _triplet_hashes(S, labels, mask):
    """Per (u, v) pair: (h1, h2) uint32 feature keys + validity.

    h1 = bit pattern of the f32 distance, h2 = label pair (or 0 when the
    caller zeroed labels for the unlabeled variant).
    """
    V = S.shape[1]
    valid = (mask[:, :, None] & mask[:, None, :]
             & ~jnp.eye(V, dtype=bool)[None] & (S < INF / 2))
    h1 = jax.lax.bitcast_convert_type(S, jnp.uint32)
    lu = labels[:, :, None].astype(jnp.uint32)
    lv = labels[:, None, :].astype(jnp.uint32)
    h2 = lu * jnp.uint32(0x10001) + lv
    return (h1.reshape(-1), h2.reshape(-1), valid.reshape(-1))


class ShortestPath(Kernel):
    """Labeled/unlabeled shortest-path kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 algorithm_type="auto", with_labels=True):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        # algorithm_type accepted for reference API parity; the device
        # path always runs batched Floyd-Warshall.
        self.algorithm_type = algorithm_type
        self.with_labels = with_labels

    def parse_input(self, X):
        graphs = normalize_input(X)
        return self._extract_stream(graphs)

    def _extract_stream(self, graphs):
        """-> dict of flat (h1, h2, gids, valid) numpy arrays over all
        ordered vertex pairs of all graphs."""
        buckets = _size_buckets(graphs)
        h1s, h2s, gids, valids = [], [], [], []
        for V, idxs in sorted(buckets.items()):
            nb = len(idxs)
            A = np.zeros((nb, V, V), dtype=np.float32)
            L = np.zeros((nb, V), dtype=np.int32)
            M = np.zeros((nb, V), dtype=bool)
            for bi, gi in enumerate(idxs):
                g = graphs[gi]
                A[bi, :g.n, :g.n] = g.get_adjacency_matrix()
                M[bi, :g.n] = True
                if self.with_labels:
                    labs = g.get_labels(label_type="vertex",
                                        return_none=True)
                    if labs is None:
                        raise ValueError(
                            "ShortestPath with_labels=True requires "
                            "node-labeled graphs")
                    if self._method_calling in (1, 2) and \
                            not hasattr(self, "_enum"):
                        self._enum = {}
                    for v in range(g.n):
                        lab = labs[v]
                        if lab not in self._enum:
                            self._enum[lab] = len(self._enum)
                        L[bi, v] = self._enum[lab]
            S = batched_floyd_warshall(jnp.asarray(A), jnp.asarray(M))
            h1, h2, valid = _triplet_hashes(
                S, jnp.asarray(L), jnp.asarray(M))
            h1s.append(np.asarray(h1))
            h2s.append(np.asarray(h2))
            valids.append(np.asarray(valid))
            gid = np.repeat(np.asarray(idxs, np.int32), V * V)
            gids.append(gid)
        return {
            "n": len(graphs),
            "h1": np.concatenate(h1s),
            "h2": np.concatenate(h2s),
            "gids": np.concatenate(gids),
            "valid": np.concatenate(valids),
        }

    def fit(self, X, y=None):
        self._method_calling = 1
        self._is_transformed = False
        if hasattr(self, "_enum"):
            del self._enum
        self.initialize()
        self.X = self.parse_input(X)
        self._X_diag = None
        return self

    @staticmethod
    def _pad_stream(st):
        n_items = len(st["h1"])
        pad = bucket_size(max(n_items, 1))
        out = {}
        for k in ("h1", "h2"):
            a = np.zeros(pad, dtype=np.uint32)
            a[:n_items] = st[k]
            out[k] = a
        g = np.zeros(pad, dtype=np.int32)
        g[:n_items] = st["gids"]
        out["gids"] = g
        v = np.zeros(pad, dtype=bool)
        v[:n_items] = st["valid"]
        out["valid"] = v
        out["n"] = st["n"]
        return out

    def _gram(self, px, py=None):
        if py is None:
            st = self._pad_stream(px)
            ids, nu = compact_ids(jnp.asarray(st["h1"]),
                                  jnp.asarray(st["h2"]),
                                  jnp.asarray(st["valid"]))
            L = bucket_size(int(nu))
            ones = np.ones(len(st["gids"]), np.float32)
            from ..ops.gram import fetch_gram
            return fetch_gram(coo_counts_gram(
                st["gids"], ids, ones, st["valid"], st["n"], L))
        # joint stream: consistent feature ids across X and Y
        joint = {
            "n": px["n"] + py["n"],
            "h1": np.concatenate([px["h1"], py["h1"]]),
            "h2": np.concatenate([px["h2"], py["h2"]]),
            "gids": np.concatenate([px["gids"], py["gids"] + px["n"]]),
            "valid": np.concatenate([px["valid"], py["valid"]]),
        }
        st = self._pad_stream(joint)
        ids, nu = compact_ids(jnp.asarray(st["h1"]),
                              jnp.asarray(st["h2"]),
                              jnp.asarray(st["valid"]))
        L = bucket_size(int(nu))
        nx, ny = px["n"], py["n"]
        gids = st["gids"]
        is_y = gids >= nx
        vy = st["valid"] & is_y
        vx = st["valid"] & ~is_y
        gy = np.where(is_y, gids - nx, 0).astype(np.int32)
        gx = np.where(is_y, 0, gids).astype(np.int32)
        ones = np.ones(len(gids), np.float32)
        from ..ops.gram import fetch_gram
        K = fetch_gram(coo_counts_gram_rect(
            gy, ids, ones, vy, gx, ids, ones, vx, ny, nx, L))
        self._Y_diag_cache = np.asarray(
            counts_diag(gy, ids, ones, vy, ny, L))
        return K

    def _diag(self, parsed):
        if (getattr(self, "_is_transformed", False)
                and parsed is getattr(self, "_Y", None)
                and hasattr(self, "_Y_diag_cache")):
            return self._Y_diag_cache
        st = self._pad_stream(parsed)
        ids, nu = compact_ids(jnp.asarray(st["h1"]),
                              jnp.asarray(st["h2"]),
                              jnp.asarray(st["valid"]))
        L = bucket_size(int(nu))
        ones = np.ones(len(st["gids"]), np.float32)
        return np.asarray(counts_diag(
            st["gids"], ids, ones, st["valid"], st["n"], L))


class ShortestPathAttr(Kernel):
    """Attributed shortest-path kernel (reference
    shortest_path.py:131-165), reformulated as per-distance GEMMs."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 algorithm_type="auto", metric=np.dot):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.algorithm_type = algorithm_type
        self.metric = metric

    def parse_input(self, X):
        graphs = normalize_input(X)
        out = []
        for g in graphs:
            S, _ = g.build_shortest_path_matrix()
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError("ShortestPathAttr requires node attributes")
            attrs = np.asarray([np.asarray(labs[v], dtype=np.float64)
                                for v in range(g.n)])
            out.append((S, attrs))
        return out

    def pairwise_operation(self, x, y):
        Sx, Ax = x
        Sy, Ay = y
        if self.metric is np.dot:
            M = Ax @ Ay.T
        else:
            M = np.asarray([[self.metric(a, b) for b in Ay] for a in Ax])
        dx = Sx[np.isfinite(Sx)]
        dy = Sy[np.isfinite(Sy)]
        common = np.intersect1d(np.unique(dx), np.unique(dy))
        total = 0.0
        for d in common:
            if d == 0:
                # u==v pairs excluded in the reference loop (i != j)
                Xd = (Sx == 0) & ~np.eye(Sx.shape[0], dtype=bool)
                Yd = (Sy == 0) & ~np.eye(Sy.shape[0], dtype=bool)
            else:
                Xd = Sx == d
                Yd = Sy == d
            if not Xd.any() or not Yd.any():
                continue
            total += float(np.sum(M * (Xd.astype(np.float64) @ M
                                       @ Yd.astype(np.float64))))
        return total
