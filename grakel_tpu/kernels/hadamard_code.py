"""Hadamard code kernel framework (Kataoka & Inokuchi 2016).

Reference semantics (grakel/kernels/hadamard_code.py:107-260):

* initial label(v) = row ``enum[l(v)]`` of the Hadamard matrix
  H(2^ceil(log2(#labels))) (:189-202);
* iteration: new(v) = old(v) + sum over out-neighbors old(q) (vector
  addition, :205-218);
* ``n_iter`` generations total (initial + n_iter-1 refinements), each fed
  as tuple-valued node labels to one base-kernel instance per generation
  (default VertexHistogram); K = sum over generations (:220-251);
* transform extends the label enumeration; if that crosses a power of
  two, H grows and transform-time code tuples can never equal fit-time
  tuples (they differ in length) — this length-sensitivity is preserved
  by folding the code dimension into the feature identity.

TPU fast path (base kernel = VertexHistogram): codes are int32 rows
[N, D]; each generation is one segment-sum neighbor add; per-generation
VH features are sort-compacted row hashes pushed through the chunked
counts-GEMM, mirroring the WL fast path.  Other base kernels use a host
generation loop with tuple labels.
"""

from __future__ import annotations

import functools
from math import ceil, log2

import numpy as np
import jax
import jax.numpy as jnp
from scipy.linalg import hadamard

from .base import Kernel, normalize_input
from .histogram import VertexHistogram
from ..batch import GraphBatch, bucket_size
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag, fetch_gram,
                        normalize_gram)
from ..ops.wl import compact_ids

__all__ = ["HadamardCode"]

_U = jnp.uint32


from ..ops.wl import _fmix32  # noqa: E402  (after jax import)


@functools.partial(jax.jit, static_argnums=(2,))
def _row_hash(codes, dim_tag, D):
    """Two independent 32-bit hashes of each code row (+ dimension tag).

    Each element is murmur-finalized together with its position before
    summation so permuted/shifted rows do not collide (a plain weighted
    sum is far too linear for code vectors that are themselves sums).
    """
    c = codes.astype(_U)
    pos1 = jnp.arange(D, dtype=_U) * _U(0x9E3779B9)
    pos2 = jnp.arange(D, dtype=_U) * _U(0xC2B2AE35)
    e1 = _fmix32(c ^ pos1[None, :], 0x85EBCA6B)
    e2 = _fmix32(c + pos2[None, :], 0x27D4EB2F)
    h1 = _fmix32(jnp.sum(e1, axis=1) ^ (dim_tag * _U(0x9E3779B1)),
                 0x165667B1)
    h2 = _fmix32(jnp.sum(e2, axis=1) + dim_tag * _U(0x7F4A7C15),
                 0x7F4A7C15)
    return h1, h2


class HadamardCode(Kernel):
    """Hadamard code framework kernel."""

    def __init__(self, n_jobs=None, verbose=False, normalize=False,
                 n_iter=5, base_graph_kernel=None):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.n_iter = n_iter
        self.base_graph_kernel = base_graph_kernel

    def initialize(self):
        if not isinstance(self.n_iter, int) or self.n_iter <= 0:
            raise TypeError("'n_iter' must be a positive integer")
        bk = self.base_graph_kernel
        if bk is None:
            self._base_cls, self._base_params = VertexHistogram, {}
        elif isinstance(bk, tuple) and len(bk) == 2:
            self._base_cls, self._base_params = bk[0], dict(bk[1])
        elif isinstance(bk, type) and issubclass(bk, Kernel):
            self._base_cls, self._base_params = bk, {}
        else:
            raise TypeError("base_graph_kernel must be None, a Kernel "
                            "subclass, or a (class, params) tuple")
        self._base_params.pop("normalize", None)
        self._fast = (self._base_cls is VertexHistogram
                      and not self._base_params)

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        return normalize_input(X)

    def fit(self, X, y=None):
        self._method_calling = 1
        self._is_transformed = False
        self.initialize()
        self.X = self.parse_input(X)
        self._enum = {}
        self._collect_labels(self.X, extend=True)
        self._X_diag = None
        if not self._fast:
            self._host_fit(with_gram=False)
        return self

    def fit_transform(self, X, y=None):
        self._method_calling = 2
        self._is_transformed = False
        self.initialize()
        self.X = self.parse_input(X)
        self._enum = {}
        self._collect_labels(self.X, extend=True)
        self._X_diag = None
        if self._fast:
            K = self._device_sym(self.X)
        else:
            K = self._host_fit(with_gram=True)
        self._K_fit = K
        diag = np.diagonal(K).copy()
        self._X_diag = diag
        if self.normalize:
            K = normalize_gram(K, diag, diag)
        return np.asarray(K)

    def transform(self, X):
        self._method_calling = 3
        if not hasattr(self, "X") or self.X is None:
            from sklearn.exceptions import NotFittedError
            raise NotFittedError("call fit before transform")
        Y = self.parse_input(X)
        n_fit_labels = len(self._enum)
        enum_t = dict(self._enum)
        self._collect_labels(Y, extend=True, enum=enum_t)
        if self._fast:
            K, xd, yd = self._device_rect(self.X, Y, n_fit_labels, enum_t)
            if self._X_diag is None:
                self._X_diag = xd
        else:
            K = self._host_transform(Y, enum_t)
            yd = self._host_diag(side=1)
            if self._X_diag is None:
                self._X_diag = self._host_diag(side=0)
        self._Y_diag = yd
        self._is_transformed = True
        if self.normalize:
            K = normalize_gram(K, self._Y_diag, self._X_diag)
        return np.asarray(K)

    def diagonal(self):
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "X") or self.X is None:
            raise NotFittedError("call fit before diagonal")
        if self._X_diag is None:
            if self._fast:
                K = self._device_sym(self.X)
                self._X_diag = np.diagonal(K).copy()
            else:
                self._X_diag = self._host_diag(side=0)
        if getattr(self, "_is_transformed", False):
            return self._X_diag, self._Y_diag
        return self._X_diag

    # ------------------------------------------------------------------ #
    def _collect_labels(self, graphs, extend, enum=None):
        enum = self._enum if enum is None else enum
        for g in graphs:
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError("HadamardCode requires node labels")
            for v in set(labs.values()):
                if v not in enum and extend:
                    enum[v] = len(enum)
        return enum

    @staticmethod
    def _hdim(nl):
        return int(2 ** ceil(log2(max(nl, 1))))

    def _initial_codes(self, graphs, enum, D_pad):
        """int32 [sum nodes, D_pad] initial Hadamard codes."""
        D = self._hdim(len(enum))
        H = hadamard(D).astype(np.int32)
        rows = []
        for g in graphs:
            labs = g.get_labels(label_type="vertex")
            idx = np.array([enum[labs[v]] for v in range(g.n)], np.int64)
            rows.append(H[idx])
        out = np.concatenate(rows, axis=0) if rows else \
            np.zeros((0, D), np.int32)
        if D < D_pad:
            out = np.pad(out, ((0, 0), (0, D_pad - D)))
        return out, D

    def _device_run(self, graphs, codes, dims, batch):
        """Yield (h1, h2) row-hash pairs per generation, iterating the
        neighbor-sum on device.  ``dims`` per-node code dimensions."""
        N_pad = int(batch.node_labels.shape[0])
        c = np.zeros((N_pad, codes.shape[1]), np.int32)
        c[:codes.shape[0]] = codes
        c = jnp.asarray(c)
        dim_tag = jnp.asarray(dims, _U)
        D = codes.shape[1]
        send, recv = batch.senders, batch.receivers
        emask = batch.edge_mask
        for it in range(self.n_iter):
            if it > 0:
                gathered = jnp.where(emask[:, None],
                                     c[recv], jnp.int32(0))
                c = c + jax.ops.segment_sum(gathered, send,
                                            num_segments=N_pad)
            yield _row_hash(c, dim_tag, D)

    def _device_sym(self, graphs):
        batch = GraphBatch.from_graphs(graphs, node_label_enum={})
        n = batch.n_graphs
        gids = batch.node_graph_ids
        valid = batch.node_mask
        N_pad = int(gids.shape[0])
        codes, D = self._initial_codes(graphs, self._enum,
                                       self._hdim(len(self._enum)))
        dims = np.full(N_pad, D, np.uint32)
        ones = np.ones(N_pad, np.float32)
        K = np.zeros((n, n), np.float32)
        for h1, h2 in self._device_run(graphs, codes, dims, batch):
            ids, nu = compact_ids(h1, h2, valid)
            L = bucket_size(int(nu))
            K += fetch_gram(coo_counts_gram(gids, ids, ones, valid, n, L))
        return K

    def _device_rect(self, Xg, Yg, n_fit_labels, enum_t):
        nx, ny = len(Xg), len(Yg)
        batch = GraphBatch.from_graphs(list(Xg) + list(Yg),
                                       node_label_enum={})
        gids = np.asarray(batch.node_graph_ids)
        valid = np.asarray(batch.node_mask)
        N_pad = len(gids)
        Dx = self._hdim(n_fit_labels)
        Dt = self._hdim(len(enum_t))
        D_pad = max(Dx, Dt)
        cx, _ = self._initial_codes(Xg, self._enum, D_pad)
        cy, _ = self._initial_codes(Yg, enum_t, D_pad)
        codes = np.concatenate([cx, cy], axis=0)
        n_x_nodes = cx.shape[0]
        dims = np.full(N_pad, Dt, np.uint32)
        dims[:n_x_nodes] = Dx
        is_y = gids >= nx
        gids_y = np.where(is_y, gids - nx, 0).astype(np.int32)
        gids_x = np.where(is_y, 0, gids).astype(np.int32)
        vy = valid & is_y
        vx = valid & ~is_y
        ones = np.ones(N_pad, np.float32)
        K = np.zeros((ny, nx), np.float32)
        xd = np.zeros(nx, np.float32)
        yd = np.zeros(ny, np.float32)
        for h1, h2 in self._device_run(list(Xg) + list(Yg), codes, dims,
                                       batch):
            ids, nu = compact_ids(h1, h2, jnp.asarray(valid))
            L = bucket_size(int(nu))
            K += fetch_gram(coo_counts_gram_rect(
                gids_y, ids, ones, vy, gids_x, ids, ones, vx, ny, nx, L))
            xd += np.asarray(counts_diag(gids_x, ids, ones, vx, nx, L))
            yd += np.asarray(counts_diag(gids_y, ids, ones, vy, ny, L))
        return K, xd, yd

    # --------------------------------------------------------- host path
    def _host_generations(self, graphs, enum):
        D = self._hdim(len(enum))
        H = hadamard(D).astype(np.int64)
        labels = []
        for g in graphs:
            labs = g.get_labels(label_type="vertex")
            labels.append({v: H[enum[labs[v]]] for v in range(g.n)})
        nbrs = [[g.neighbors(v) for v in range(g.n)] for g in graphs]

        def materialize(labels):
            from ..graph import Graph
            out = []
            for g, lab in zip(graphs, labels):
                ng = Graph.from_arrays(
                    g.n, g.senders, g.receivers, g.weights,
                    {v: tuple(lab[v]) for v in lab}, g.edge_labels)
                # share structural caches across iterations (e.g. an SP
                # base kernel then solves Floyd-Warshall once per graph)
                ng._cache = g._cache
                out.append(ng)
            return out

        yield materialize(labels)
        for _ in range(1, self.n_iter):
            new = []
            for gi, g in enumerate(graphs):
                nl = {}
                for v in range(g.n):
                    acc = labels[gi][v]
                    for q in nbrs[gi][v]:
                        acc = np.add(acc, labels[gi][q])
                    nl[v] = acc
                new.append(nl)
            labels = new
            yield materialize(labels)

    def _host_fit(self, with_gram):
        """Per-iteration base-kernel dispatch through
        :func:`grakel_tpu.kernels.base.parallel_sum` when ``n_jobs`` is
        set (reference hadamard_code.py:240-251 joblib analog)."""
        from .base import parallel_sum
        self._base_kernels = {}
        jobs = []
        for i, gen in enumerate(self._host_generations(self.X, self._enum)):
            bk = self._base_cls(normalize=False, verbose=self.verbose,
                                **self._base_params)
            self._base_kernels[i] = bk
            if with_gram:
                jobs.append(lambda bk=bk, gen=gen: bk.fit_transform(gen))
            else:
                jobs.append(lambda bk=bk, gen=gen: bk.fit(gen) and None)
        K = parallel_sum(jobs, self.n_jobs)
        return K if with_gram else None

    def _host_transform(self, Y, enum_t):
        from .base import parallel_sum
        jobs = [
            lambda bk=self._base_kernels[i], gen=gen: bk.transform(gen)
            for i, gen in enumerate(self._host_generations(Y, enum_t))]
        return parallel_sum(jobs, self.n_jobs)

    def _host_diag(self, side):
        d = None
        for i, bk in self._base_kernels.items():
            di = bk.diagonal()
            if isinstance(di, tuple):
                di = di[side]
            d = di if d is None else d + di
        return np.asarray(d) if d is not None else None
