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
spends its time — uses the unary-threshold identity

    sum_l min(a_l, b_l) = sum_{(l, t): t <= max} [a_l >= t][b_l >= t]

so a histogram entry of count c becomes c sparse 0/1 features
``(l, 1..c)``.  The expanded stream's size is the TOTAL HISTOGRAM MASS
(= (n_iter+1) * total vertices — each vertex contributes one unit per
ancestor generation), NOT n_graphs * hierarchy_width: at NCI1 scale
that is ~7e5 COO entries instead of a 4110 x ~5e5 dense matrix, and
the Gram is the same chunked counts-GEMM every histogram kernel uses
(ops/gram.coo_counts_gram).  Expanded feature ids are compacted on host
with np.unique; at transform time mapping through the FIT enumeration
is exact (a transform feature (l, t) absent from fit means no fit graph
reaches count t at l, so its indicator column is all-zero on the fit
side and contributes nothing — the same argument covers the reference's
truncation to the fit histogram width).
"""

from __future__ import annotations

import warnings

import numpy as np

from .base import Kernel, normalize_input
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, fetch_gram,
                        normalize_gram)

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

    def _sparse_histograms(self, labels_per_graph):
        """Ancestor-chain histograms as an expanded unary COO stream.

        Returns ``(gids, ekeys, mass)``: for every (graph, hierarchy
        node) entry with count c, c int64 keys ``(hid << 32) | t``
        (t = 1..c — a fixed encoding so transform keys map through the
        fit enumeration); ``mass[j]`` = total histogram mass of graph j
        (= its intersection self-term sum_l min(h, h) = sum_l h)."""
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

        gl, hl = [], []
        for j, L in enumerate(labels_per_graph):
            for l in L.values():
                for node, omega in chain_of(l):
                    gl.extend((j,) * omega)
                    hl.extend((node,) * omega)
        n = len(labels_per_graph)
        gids = np.asarray(gl, np.int64)
        hids = np.asarray(hl, np.int64)
        if gids.size == 0:
            return gids, hids, np.zeros(n)
        # per-(graph, hid) counts -> unary expansion (hid, t=1..c)
        base = np.int64(len(self._hierarchy) + 1)
        pair = gids * base + hids
        upair, counts = np.unique(pair, return_counts=True)
        g_rep = np.repeat(upair // base, counts)
        h_rep = np.repeat(upair % base, counts)
        # t-index within each run of equal (graph, hid)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        t = np.arange(g_rep.size, dtype=np.int64) - np.repeat(offs, counts)
        ekeys = (h_rep << np.int64(32)) | (t + 1)
        mass = np.bincount(gids, minlength=n).astype(np.float64)
        return g_rep, ekeys, mass

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
        gids, ekeys, mass = self._sparse_histograms(L)
        # fit enumeration: sorted unique expanded keys; eids dense in it
        self._ekeys = np.unique(ekeys)
        eids = np.searchsorted(self._ekeys, ekeys)
        self._mass = mass
        return {"gids": gids, "eids": eids, "n": nx,
                "width": len(self._ekeys)}

    def fit_transform(self, X, y=None):
        self._method_calling = 2
        self._is_transformed = False
        self.initialize()
        self.X = self._parse_fit(X)
        n, w = self.X["n"], self.X["width"]
        ones = np.ones(self.X["gids"].shape[0], np.float32)
        valid = np.ones(self.X["gids"].shape[0], bool)
        K = fetch_gram(coo_counts_gram(self.X["gids"], self.X["eids"],
                                       ones, valid, n, max(w, 1)))[:n, :n]
        self._X_diag = self._mass.copy()
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
        gids, ekeys, mass = self._sparse_histograms(L)
        self._Y_mass = mass
        # map through the FIT enumeration; unseen (hid, t) keys have an
        # all-zero indicator column on the fit side -> contribute 0
        # (this also subsumes the reference's truncation to fit width)
        pos = np.searchsorted(self._ekeys, ekeys)
        pos_c = np.minimum(pos, max(len(self._ekeys) - 1, 0))
        hit = (self._ekeys[pos_c] == ekeys) if len(self._ekeys) else \
            np.zeros(ekeys.shape[0], bool)
        ones_y = np.ones(gids.shape[0], np.float32)
        ones_x = np.ones(self.X["gids"].shape[0], np.float32)
        valid_x = np.ones(self.X["gids"].shape[0], bool)
        K = fetch_gram(coo_counts_gram_rect(
            gids, pos_c, ones_y, hit,
            self.X["gids"], self.X["eids"], ones_x, valid_x,
            nx, self.X["n"], max(self.X["width"], 1)))
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
            self._X_diag = self._mass.copy()
        if getattr(self, "_is_transformed", False):
            return self._X_diag, self._Y_mass
        return self._X_diag
