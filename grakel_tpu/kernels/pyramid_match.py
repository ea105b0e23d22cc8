"""Pyramid match kernel (Nikolentzos et al. 2017).

Reference semantics (grakel/kernels/pyramid_match.py):

* per graph: d-dim vertex embedding U = |top-d adjacency eigenvectors|
  (scipy ``eigs`` when n > d+1 with ncv=10d, dense ``eig`` otherwise,
  eigenvalues sorted descending) (:135-151);
* histograms at levels j = 0..L-1 with 2^j cells per dimension; labeled
  graphs count per (label*d + dim, cell) row (:181-253); transform-time
  unseen labels extend the label enumeration (:160-176);
* pairwise value: the reference's pairwise loop (:255-288) fills the
  per-level intersection array progressively while re-adding partial
  weighted differences each iteration; its closed form over the final
  per-level intersections I_p is

      k = I_{L-1} + sum_{p=0}^{L-2} 2^{-(L-p-1)} ((L-p) I_p
                                                  - (L-p-1) I_{p+1})

  which this implementation reproduces exactly.

TPU design: embeddings stay on host (iterative ARPACK / LAPACK eig,
matching the reference's numerics); histogram scatters are vectorized
numpy; the per-level all-pairs intersections I_p — the O(N^2) cost —
run as tiled min-intersection Grams on device (ops/intersect.py).
"""

from __future__ import annotations

import warnings
from itertools import chain

import numpy as np

from .base import Kernel, normalize_input
from ..ops.intersect import min_intersection_gram

__all__ = ["PyramidMatch"]


class PyramidMatch(Kernel):
    """Pyramid match kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 with_labels=True, L=4, d=6):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.with_labels = with_labels
        self.L = L
        self.d = d

    def initialize(self):
        if not isinstance(self.with_labels, bool):
            raise TypeError("with_labels must be a boolean")
        if not isinstance(self.L, int) or self.L < 0:
            raise TypeError("L must be a non-negative integer")
        if not isinstance(self.d, int) or self.d <= 0:
            raise TypeError("d must be a positive integer")

    # ------------------------------------------------------------------ #
    def _embed(self, A):
        """|top-d eigenvector| embedding, matching reference :135-151."""
        n = A.shape[0]
        if n > self.d + 1:
            from scipy.sparse import csr_matrix
            from scipy.sparse.linalg import eigs
            Lambda, U = eigs(csr_matrix(A, dtype=float), k=self.d,
                             ncv=10 * self.d)
            idx = Lambda.argsort()[::-1]
            U = U[:, idx]
        else:
            Lambda, U = np.linalg.eig(A)
            idx = Lambda.argsort()[::-1]
            U = U[:, idx][:, :self.d]
        return np.absolute(U)

    def parse_input(self, X):
        graphs = normalize_input(X)
        Us, Ls = [], []
        for g in graphs:
            A = g.get_adjacency_matrix()
            Us.append((g.n, self._embed(A)))
            if self.with_labels:
                labs = g.get_labels(label_type="vertex", return_none=True)
                if labs is None:
                    raise ValueError(
                        "PyramidMatch with_labels=True requires node labels")
                Ls.append(labs)
        if self.with_labels:
            if self._method_calling in (1, 2):
                self._labels = set()
                for L in Ls:
                    self._labels |= set(L.values())
                self._labels = {l: i for i, l in enumerate(self._labels)}
                labels = self._labels
            else:
                rest = set()
                for L in Ls:
                    rest |= set(L.values())
                rest -= set(self._labels.keys())
                labels = dict(chain(
                    self._labels.items(),
                    ((j, i) for i, j in enumerate(rest, len(self._labels)))))
            return self._histograms(Us, Ls, labels)
        return self._histograms(Us)

    def _histograms(self, Us, Ls=None, labels=None):
        """Vectorized per-graph per-level cell-count histograms."""
        num_labels = len(labels) if labels is not None else 1
        Hs = []
        for gi, (n, u) in enumerate(Us):
            u = u[:n]
            if Ls is not None:
                row_lab = np.array([labels[Ls[gi][p]] for p in range(n)],
                                   np.int64)
            du = []
            for j in range(self.L):
                k = 2 ** j
                T = np.floor(u * k).astype(np.int64)
                T[T == k] = k - 1
                D = np.zeros((self.d * num_labels, k))
                dims = np.broadcast_to(np.arange(u.shape[1]), T.shape)
                if Ls is not None:
                    rows = row_lab[:, None] * self.d + dims
                else:
                    rows = dims
                np.add.at(D, (rows.ravel(), T.ravel()), 1)
                du.append(D)
            Hs.append(du)
        return Hs

    # ------------------------------------------------------------------ #
    def _level_matrix(self, parsed, level, width):
        """Stack level-``level`` histograms flattened to ``width``."""
        n = len(parsed)
        out = np.zeros((n, width), np.float32)
        for i, du in enumerate(parsed):
            if len(du) == 0:
                continue
            flat = du[level].ravel()
            m = min(len(flat), width)
            out[i, :m] = flat[:m]
        return out

    def _intersections(self, px, py):
        """Per-level all-pairs intersections I_p[j] [len(py), len(px)].

        Row truncation to the smaller label count (reference :270-277) is
        equivalent to truncating the flattened feature width to the
        smaller of the two, because rows are label-major and each level's
        cell count is shared.
        """
        I = []
        for j in range(self.L):
            wx = next((d[j].size for d in px if len(d)), 0)
            wy = next((d[j].size for d in py if len(d)), 0)
            w = min(wx, wy) if (wx and wy) else 0
            if w == 0:
                I.append(np.zeros((len(py), len(px))))
                continue
            A = self._level_matrix(py, j, w)
            B = self._level_matrix(px, j, w)
            I.append(min_intersection_gram(A, B).astype(np.float64))
        return I

    def _combine(self, I):
        """Closed form of the reference's progressive accumulation."""
        L = self.L
        if L == 0:
            return np.zeros_like(I[0]) if I else 0.0
        k = I[L - 1].copy()
        for p in range(L - 1):
            w = 1.0 / (2 ** (L - p - 1))
            k += w * ((L - p) * I[p] - (L - p - 1) * I[p + 1])
        return k

    def _gram(self, px, py=None):
        if py is None:
            py = px
        I = self._intersections(px, py)
        return self._combine(I)

    def _diag(self, parsed):
        vals = np.zeros(len(parsed))
        for i, du in enumerate(parsed):
            if len(du) == 0:
                continue
            I = [np.sum(du[j]) for j in range(self.L)]
            L = self.L
            k = I[L - 1]
            for p in range(L - 1):
                w = 1.0 / (2 ** (L - p - 1))
                k += w * ((L - p) * I[p] - (L - p - 1) * I[p + 1])
            vals[i] = k
        return vals
