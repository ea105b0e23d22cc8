"""Propagation kernels (Neumann et al. 2015).

Reference semantics (grakel/kernels/propagation.py):

* per graph: transition matrix T = row-l1-normalized adjacency (or a
  user-supplied T as 4th element / (Graph, T) pair) (:213);
* P0 = stacked one-hot label matrix over all graphs (:242-251)
  [attr variant: raw attribute matrix, :470+];
* ``t_max`` rounds: LSH bucket ids ``floor((P.u + b)/w)`` with
  u ~ N(0,1) (sqrt(P) first for M='H'), u ~ Cauchy for M='TV'
  [attr: per-dimension ``floor((P*u+b)/w)`` row-tuples, L1/L2] (:368-394,
  :617-638); per-graph Counter of bucket ids per round (:269-286);
  ``P <- T.P`` between rounds;
* pairwise k = sum_t metric(Counter_x[t], Counter_y[t]), default dot
  (:133-147);
* transform reuses fit's u/b and bucket dicts; graphs with labels unseen
  at fit follow the reference's exact extension quirks (:314-366).

TPU split: the hashing pipeline runs on host in numpy — it is O(total
nodes * labels) and must reproduce the reference's RandomState draw
order and dict-extension semantics bit-for-bit — while the O(N^2) Gram
over bucket-count features (where the reference spends its time in
Counter dots) becomes one chunked counts-GEMM on device, keyed by
(round, bucket-id).  Custom ``metric`` callables fall back to the host
pairwise loop.
"""

from __future__ import annotations

import warnings
from collections import Counter
from itertools import chain, filterfalse
from numbers import Real

import numpy as np
from sklearn.preprocessing import normalize as normalizer
from sklearn.utils import check_random_state

from .base import Kernel, normalize_input
from ..batch import bucket_size
from ..graph import Graph
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag,
                        fetch_gram)

__all__ = ["Propagation", "PropagationAttr"]


def _dot(x, y):
    return sum(x[k] * y[k] for k in x.keys() & y.keys())


class Propagation(Kernel):
    """Label propagation kernel (M in {'H', 'TV'})."""

    attr_ = False

    def __init__(self, n_jobs=None, verbose=False, normalize=False,
                 random_state=None, metric=_dot, M="TV", t_max=5, w=0.01):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.random_state = random_state
        self.M = M
        self.t_max = t_max
        self.w = w
        self.metric = metric

    def initialize(self):
        valid = ["L1", "L2"] if self.attr_ else ["H", "TV"]
        if not isinstance(self.M, str) or self.M not in valid:
            raise TypeError("Metric type must be a str, one of %s" % valid)
        if not self.attr_:
            self.take_sqrt_ = self.M == "H"
        self.take_cauchy_ = self.M in ("TV", "L1")
        if not isinstance(self.t_max, int) or self.t_max <= 0:
            raise TypeError("The number of iterations must be a "
                            "positive integer.")
        if not isinstance(self.w, Real) or self.w <= 0:
            raise TypeError("The bin width must be a positive number.")
        if not callable(self.metric):
            raise TypeError("The base kernel must be callable.")
        self.random_state_ = check_random_state(self.random_state)

    # ------------------------------------------------------------------ #
    def _parse_graphs(self, X):
        """-> (list of (graph, T) with T row-normalized, labels list)."""
        out = []
        for idx, x in enumerate(X):
            T = None
            if isinstance(x, Graph):
                g = x
            elif isinstance(x, (list, tuple)):
                x = list(x)
                if len(x) == 0:
                    warnings.warn("Ignoring empty element on index: "
                                  + str(idx))
                    continue
                if len(x) == 2 and isinstance(x[0], Graph):
                    g, T = x
                else:
                    g = Graph(x[0], x[1] if len(x) > 1 else None, None)
                    if len(x) == 4:
                        T = x[3]
            else:
                g = Graph(x)
            if T is not None:
                T = np.asarray(T)
                if T.shape[0] != T.shape[1]:
                    raise TypeError("Transition matrix on index %d must "
                                    "be a square matrix." % idx)
                if T.shape[0] != g.n:
                    raise TypeError("Propagation matrix must have the same "
                                    "dimension as the number of vertices.")
            else:
                T = g.get_adjacency_matrix()
            out.append((g, normalizer(T, axis=1, norm="l1")))
        if len(out) == 0:
            raise ValueError("Parsed input is empty")
        return out

    def _lsh(self, X, u, b):
        if not self.attr_ and self.take_sqrt_:
            X = np.sqrt(X)
        if self.attr_:
            return np.floor((X * u + b) / self.w)
        return np.floor((np.dot(X, u) + b) / self.w)

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        if not hasattr(X, "__iter__"):
            raise ValueError("input must be an iterable\n")
        graphs = self._parse_graphs(X)
        n = len(graphs)
        indexes = [0]
        labels = set()
        L = []
        for g, T in graphs:
            lab = g.get_labels(label_type="vertex")
            labels |= set(lab.values())
            L.append((g.n, lab))
            indexes.append(indexes[-1] + g.n)

        if self._method_calling in (1, 2):
            enum_labels = {l: i for i, l in enumerate(list(labels))}
            self._enum_labels = enum_labels
            self._parent_labels = labels
        else:
            new_elements = labels - self._parent_labels
            if len(new_elements) > 0:
                new_enum_labels = iter(
                    (l, i) for i, l in enumerate(list(new_elements),
                                                 len(self._enum_labels)))
                enum_labels = dict(chain(self._enum_labels.items(),
                                         new_enum_labels))
            else:
                enum_labels = self._enum_labels

        data = []
        for k, (nv, label) in enumerate(L):
            data += [(indexes[k] + j, enum_labels[label[j]])
                     for j in range(nv)]
        rows, cols = zip(*data)
        P = np.zeros(shape=(indexes[-1], len(enum_labels)))
        P[rows, cols] = 1
        dim_orig = len(self._enum_labels)
        transition = [T for _, T in graphs]

        if self._method_calling in (1, 2):
            self._u, self._b, self._hd = [], [], []
            for t in range(self.t_max):
                u = self.random_state_.randn(len(enum_labels))
                if self.take_cauchy_:
                    u = np.divide(u, self.random_state_.randn(
                        len(enum_labels)))
                self._u.append(u)
                self._b.append(self.w * self.random_state_.rand())
            phi = {k: dict() for k in range(n)}
            for t in range(self.t_max):
                hashes = self._lsh(P, self._u[t], self._b[t])
                hd = dict((j, i) for i, j in
                          enumerate(set(np.unique(hashes))))
                self._hd.append(hd)
                features = np.vectorize(lambda i: hd[i])(hashes)
                for k in range(n):
                    phi[k][t] = Counter(features[indexes[k]:indexes[k + 1]])
                if t < self.t_max - 1:
                    for k in range(n):
                        s, e = indexes[k:k + 2]
                        P[s:e, :] = np.dot(transition[k], P[s:e, :])
            return [phi[k] for k in range(n)]

        if dim_orig >= len(enum_labels):
            # no unseen labels
            phi = {k: dict() for k in range(n)}
            for t in range(self.t_max):
                hashes = self._lsh(P, self._u[t], self._b[t])
                hd = dict(chain(
                    self._hd[t].items(),
                    iter((j, i) for i, j in enumerate(
                        filterfalse(lambda x: x in self._hd[t],
                                    np.unique(hashes)),
                        len(self._hd[t])))))
                features = np.vectorize(lambda i: hd[i])(hashes)
                for k in range(n):
                    phi[k][t] = Counter(features[indexes[k]:indexes[k + 1]])
                if t < self.t_max - 1:
                    for k in range(n):
                        s, e = indexes[k:k + 2]
                        P[s:e, :] = np.dot(transition[k], P[s:e, :])
            return [phi[k] for k in range(n)]

        # unseen labels: reproduce the reference's exact quirks
        # (propagation.py:314-366) including the inclusive index bound
        # and the non-unique hd extension for new-label vertices
        cols = np.array(cols)
        vertices = np.where(cols < dim_orig)[0]
        vertices_p = np.where(cols >= dim_orig)[0]
        nnv = len(enum_labels) - dim_orig
        phi = {k: dict() for k in range(n)}
        for t in range(self.t_max):
            hashes = self._lsh(P[vertices, :dim_orig], self._u[t],
                               self._b[t])
            hd = dict(chain(
                self._hd[t].items(),
                iter((j, i) for i, j in enumerate(
                    filterfalse(lambda x: x in self._hd[t],
                                np.unique(hashes)),
                    len(self._hd[t])))))
            features = np.vectorize(lambda i: hd[i], otypes=[int])(hashes)

            u = self.random_state_.randn(nnv)
            if self.take_cauchy_:
                u = np.divide(u, self.random_state_.randn(nnv))
            u = np.hstack((self._u[t], u))
            hashes_p = self._lsh(P[vertices_p, :], u, self._b[t])
            hd = dict(chain(hd.items(),
                            iter((j, i) for i, j in
                                 enumerate(hashes_p, len(hd)))))
            features_p = np.vectorize(
                lambda i: hd[i], otypes=[int])(hashes_p)

            for k in range(n):
                A = Counter(features[np.logical_and(
                    indexes[k] <= vertices, vertices <= indexes[k + 1])])
                B = Counter(features_p[np.logical_and(
                    indexes[k] <= vertices_p,
                    vertices_p <= indexes[k + 1])])
                phi[k][t] = A + B

            if t < self.t_max - 1:
                for k in range(n):
                    s, e = indexes[k:k + 2]
                    P[s:e, :] = np.dot(transition[k], P[s:e, :])
                Q = np.all(P[:, dim_orig:] > 0, axis=1)
                vertices = np.where(~Q)[0]
                vertices_p = np.where(Q)[0]
        return [phi[k] for k in range(n)]

    # ------------------------------------------------------------------ #
    def _stream(self, parsed, key_enum, extend=True):
        """Counter dicts -> COO (gid, key_id, weight) stream."""
        gids, keys, wts = [], [], []
        for gi, phi in enumerate(parsed):
            for t, counter in phi.items():
                for h, c in counter.items():
                    k = (t, h)
                    ki = key_enum.get(k)
                    if ki is None:
                        if not extend:
                            continue
                        ki = len(key_enum)
                        key_enum[k] = ki
                    gids.append(gi)
                    keys.append(ki)
                    wts.append(float(c))
        return (np.asarray(gids, np.int32), np.asarray(keys, np.int32),
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

    def _gram(self, px, py=None):
        if self.metric is not _dot:
            return None  # custom metric -> host pairwise fallback
        enum = {}
        gx, kx, wx = self._stream(px, enum)
        if py is None:
            g, k, w, v = self._pad(gx, kx, wx)
            L = bucket_size(max(len(enum), 1))
            return fetch_gram(coo_counts_gram(g, k, w, v, len(px), L))
        gy, ky, wy = self._stream(py, enum)
        L = bucket_size(max(len(enum), 1))
        ga, ka, wa, va = self._pad(gy, ky, wy)
        gb, kb, wb, vb = self._pad(gx, kx, wx)
        return fetch_gram(coo_counts_gram_rect(
            ga, ka, wa, va, gb, kb, wb, vb, len(py), len(px), L))

    def _diag(self, parsed):
        if self.metric is not _dot:
            return None
        enum = {}
        g, k, w = self._stream(parsed, enum)
        gg, kk, ww, vv = self._pad(g, k, w)
        L = bucket_size(max(len(enum), 1))
        return np.asarray(counts_diag(gg, kk, ww, vv, len(parsed), L))

    def pairwise_operation(self, x, y):
        return sum(self.metric(x[t], y[t]) for t in range(self.t_max))


class PropagationAttr(Propagation):
    """Attributed propagation kernel (M in {'L1', 'L2'})."""

    attr_ = True

    def __init__(self, n_jobs=None, verbose=False, normalize=False,
                 random_state=None, metric=_dot, M="L1", t_max=5, w=4):
        super().__init__(n_jobs=n_jobs, verbose=verbose, normalize=normalize,
                         random_state=random_state, metric=metric, M=M,
                         t_max=t_max, w=w)

    def parse_input(self, X):
        if not hasattr(X, "__iter__"):
            raise ValueError("input must be an iterable\n")
        graphs = self._parse_graphs(X)
        n = len(graphs)
        indexes = [0]
        Attr = []
        transition = []
        for g, T in graphs:
            attr = g.get_labels(label_type="vertex")
            try:
                attributes = np.array([attr[j] for j in range(g.n)])
            except TypeError:
                raise TypeError("All attributes of a single graph should "
                                "have the same dimension.")
            Attr.append(attributes)
            transition.append(T)
            indexes.append(indexes[-1] + g.n)
        try:
            P = np.vstack(Attr).astype(float)
        except ValueError:
            raise ValueError("Attribute dimensions should be the same, "
                             "for all graphs")
        if self._method_calling in (1, 2):
            self._dim = P.shape[1]
        else:
            if self._dim != P.shape[1]:
                raise ValueError("transform attribute vectors should have "
                                 "the same dimension as in fit")

        if self._method_calling in (1, 2):
            self._u, self._b, self._hd = [], [], []
            for t in range(self.t_max):
                u = self.random_state_.randn(self._dim)
                if self.take_cauchy_:
                    u = np.divide(u, self.random_state_.randn(self._dim))
                self._u.append(u)
                self._b.append(self.w * self.random_state_.randn(self._dim))
            phi = {k: dict() for k in range(n)}
            for t in range(self.t_max):
                hashes = self._lsh(P, self._u[t], self._b[t]).tolist()
                hd = {j: i for i, j in enumerate({tuple(l)
                                                  for l in hashes})}
                self._hd.append(hd)
                features = np.array([hd[tuple(l)] for l in hashes])
                for k in range(n):
                    phi[k][t] = Counter(
                        features[indexes[k]:indexes[k + 1]].flat)
                if t < self.t_max - 1:
                    for k in range(n):
                        s, e = indexes[k:k + 2]
                        P[s:e, :] = np.dot(transition[k], P[s:e, :])
            return [phi[k] for k in range(n)]

        phi = {k: dict() for k in range(n)}
        for t in range(self.t_max):
            hashes = self._lsh(P, self._u[t], self._b[t]).tolist()
            hd = dict(chain(
                self._hd[t].items(),
                iter((j, i) for i, j in enumerate(
                    filterfalse(lambda x: x in self._hd[t],
                                {tuple(l) for l in hashes}),
                    len(self._hd[t])))))
            features = np.array([hd[tuple(l)] for l in hashes])
            for k in range(n):
                phi[k][t] = Counter(features[indexes[k]:indexes[k + 1]])
            if t < self.t_max - 1:
                for k in range(n):
                    s, e = indexes[k:k + 2]
                    P[s:e, :] = np.dot(transition[k], P[s:e, :])
        return [phi[k] for k in range(n)]
