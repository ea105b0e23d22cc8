"""Weisfeiler-Lehman optimal assignment kernel (Kriege et al. 2016).

Reference semantics (grakel/kernels/weisfeiler_lehman_optimal_assignment.py):

* WL refinement with GLOBAL label ids shared across iterations
  (``n_iter + 1`` generations, :74); each new label is inserted into a
  hierarchy tree whose parent is the node's previous-generation label,
  with omega = 1 (:220-237);
* per-graph histogram over hierarchy nodes: each vertex's final label
  walks its ancestor chain adding omega at every node (:206-218);
* K = histogram intersection sum_l min(H_i[l], H_j[l]) (:270-288),
  transform truncating to the fit histogram width (:416-434);
* transform-time unseen credentials get fresh ids hung off 'root'
  (iteration 0) or their previous label (:353-399).

TPU split: the credential refinement + hierarchy stay on host (string
credentials with the reference's exact sorted global enumeration); the
O(N^2) histogram-intersection Gram — where the reference's double loop
spends its time — runs as the tiled device min-intersection
(ops/intersect.py).  Histogram accumulation is vectorized by
precomputing each label's ancestor chain once.
"""

from __future__ import annotations

import warnings

import numpy as np

from .base import Kernel, normalize_input
from ..ops.gram import normalize_gram
from ..ops.intersect import min_intersection_gram

__all__ = ["WeisfeilerLehmanOptimalAssignment"]


class WeisfeilerLehmanOptimalAssignment(Kernel):
    """WL-OA kernel."""

    def __init__(self, n_jobs=None, verbose=False, normalize=False,
                 n_iter=5, sparse=False):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.n_iter = n_iter
        self.sparse = sparse  # accepted for API parity; device path is dense

    def initialize(self):
        if not isinstance(self.n_iter, int) or self.n_iter <= 0:
            raise TypeError("'n_iter' must be a positive integer")
        self._n_iter = self.n_iter + 1

    # ------------------------------------------------------------------ #
    def _graphs_to_ed(self, X):
        graphs = normalize_input(X)
        eds, labels = [], []
        for g in graphs:
            ed = {v: set() for v in range(g.n)}
            for s, r in zip(g.senders, g.receivers):
                ed[int(s)].add(int(r))
            eds.append(ed)
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError("WL-OA requires node labels")
            labels.append(dict(labs))
        return eds, labels

    def _insert(self, label, previous_label):
        h = self._hierarchy
        h[label] = {"parent": previous_label, "children": [],
                    "w": h[previous_label]["w"] + 1, "omega": 1}
        h[previous_label]["children"].append(label)

    def _histograms(self, labels_per_graph, width):
        """Vectorized ancestor-chain accumulation."""
        # ancestor chains per label id (computed once per call)
        chains = {}

        def chain_of(l):
            c = chains.get(l)
            if c is None:
                c = []
                cur = l
                while self._hierarchy[cur]["parent"] is not None:
                    c.append((cur, self._hierarchy[cur]["omega"]))
                    cur = self._hierarchy[cur]["parent"]
                chains[l] = c
            return c

        H = np.zeros((len(labels_per_graph), width))
        for j, L in enumerate(labels_per_graph):
            for v, l in L.items():
                for node, omega in chain_of(l):
                    H[j, node] += omega
        return H

    # ------------------------------------------------------------------ #
    def fit(self, X, y=None):
        self._method_calling = 1
        self._is_transformed = False
        self.initialize()
        self.X = self._parse_fit(X)
        self._X_diag = None
        return self

    def _parse_fit(self, X):
        eds, L = self._graphs_to_ed(X)
        nx = len(eds)
        self._nx = nx
        self._hierarchy = {"root": {"parent": None, "children": [],
                                    "w": 0, "omega": 0}}
        distinct = set()
        for lab in L:
            distinct |= set(lab.values())
        WL_inv = {}
        label_count = 0
        try:
            ordered = sorted(distinct)
        except TypeError:
            ordered = sorted(distinct, key=str)
        for dv in ordered:
            WL_inv[dv] = label_count
            self._insert(label_count, "root")
            label_count += 1
        self._inv_labels = {0: WL_inv}
        L = [{v: WL_inv[lab[v]] for v in lab} for lab in L]
        for i in range(1, self._n_iter):
            new_set = set()
            L_temp = []
            for j in range(nx):
                cred = {}
                for v in eds[j]:
                    c = (str(L[j][v]) + ","
                         + str(sorted(L[j][n] for n in eds[j][v])))
                    cred[v] = c
                    new_set.add((c, L[j][v]))
                L_temp.append(cred)
            WL_inv = {}
            for dv, prev in sorted(new_set, key=lambda t: t[0]):
                WL_inv[dv] = label_count
                self._insert(label_count, prev)
                label_count += 1
            L = [{v: WL_inv[c[v]] for v in c} for c in L_temp]
            self._inv_labels[i] = WL_inv
        return self._histograms(L, len(self._hierarchy))

    def fit_transform(self, X, y=None):
        self._method_calling = 2
        self._is_transformed = False
        self.initialize()
        self.X = self._parse_fit(X)
        K = min_intersection_gram(self.X, self.X)
        self._X_diag = np.diagonal(K).copy()
        self._K_fit = K
        if self.normalize:
            K = normalize_gram(K, self._X_diag, self._X_diag)
        return np.asarray(K)

    def transform(self, X):
        self._method_calling = 3
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "X") or self.X is None:
            raise NotFittedError("call fit before transform")
        eds, L = self._graphs_to_ed(X)
        nx = len(eds)
        distinct = set()
        for lab in L:
            distinct |= set(v for v in lab.values()
                            if v not in self._inv_labels[0])
        label_count = sum(len(self._inv_labels[i])
                          for i in range(len(self._inv_labels)))
        WL_inv = {}
        try:
            ordered = sorted(distinct)
        except TypeError:
            ordered = sorted(distinct, key=str)
        for dv in ordered:
            WL_inv[dv] = label_count
            self._insert(label_count, "root")
            label_count += 1
        L = [{v: self._inv_labels[0].get(lab[v], WL_inv.get(lab[v]))
              for v in lab} for lab in L]
        for i in range(1, self._n_iter):
            new_set = set()
            L_temp = []
            for j in range(nx):
                cred = {}
                for v in eds[j]:
                    c = (str(L[j][v]) + ","
                         + str(sorted(L[j][n] for n in eds[j][v])))
                    cred[v] = c
                    if c not in self._inv_labels[i]:
                        new_set.add((c, L[j][v]))
                L_temp.append(cred)
            WL_inv = {}
            for dv, prev in sorted(new_set, key=lambda t: t[0]):
                WL_inv[dv] = label_count
                self._insert(label_count, prev)
                label_count += 1
            L = [{v: self._inv_labels[i].get(c[v], WL_inv.get(c[v]))
                  for v in c} for c in L_temp]
        Hs = self._histograms(L, len(self._hierarchy))
        self.Y = Hs
        K = min_intersection_gram(Hs[:, :self.X.shape[1]], self.X)
        self._is_transformed = True
        if self.normalize:
            X_diag, Y_diag = self.diagonal()
            K = normalize_gram(K, Y_diag, X_diag)
        return np.asarray(K)

    def diagonal(self):
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "X") or self.X is None:
            raise NotFittedError("call fit before diagonal")
        if self._X_diag is None:
            self._X_diag = self.X.sum(axis=1)
        if getattr(self, "_is_transformed", False):
            return self._X_diag, self.Y.sum(axis=1)
        return self._X_diag
