"""Multiscale Laplacian kernel (Kondor & Pan 2016), randomized scheme.

Reference semantics (grakel/kernels/multiscale_laplacian.py:91-350):

* per graph: regularized Laplacian inverse (heta on the diagonal) and
  raw feature matrix phi (:180-192);
* level 0: sample n_samples (graph, vertex) pairs, eigendecompose their
  feature Gram, project all vertex features onto the top-P positive
  eigenspace (:216-239);
* levels 1..L: per sampled vertex the FLG matrix of its level-l
  neighborhood subgraph — S = U^T L^-1 U + gamma I — and a Nystroem-like
  projection through the sampled FLG Gram (:240-280); transform replays
  the stored per-level (C, Q) bases (:281-290);
* final per-graph S via the Laplacian inverse; pairwise FLG value
  k = exp((logdet((Sx^-1+Sy^-1)) * -1 - (logdet Sx + logdet Sy)/2)/2)
  computed in log space, clipped at exp(-30) (:302-329).

The scheme is intrinsically host-sequential (sampled RandomState
shuffles feed later stages); matrices are small (P x P, default 10), so
this runs as vectorized numpy with the O(N^2) pairwise FLG loop on host.
"""

from __future__ import annotations

import warnings
from math import exp
from numbers import Real

import numpy as np
from numpy.linalg import eig, eigvals, inv, multi_dot
from scipy.sparse.csgraph import laplacian
from sklearn.utils import check_random_state

from .base import Kernel, normalize_input

__all__ = ["MultiscaleLaplacian"]

positive_eigenvalue_limit = 1e-6


def _inc_diag(A, value):
    A[np.diag_indices_from(A)] += value


class MultiscaleLaplacian(Kernel):
    """Fast multiscale Laplacian kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 random_state=None, L=3, gamma=0.01, heta=0.01, P=10,
                 n_samples=50):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.random_state = random_state
        self.L = L
        self.gamma = gamma
        self.heta = heta
        self.P = P
        self.n_samples = n_samples

    def initialize(self):
        self.random_state_ = check_random_state(self.random_state)
        if not isinstance(self.gamma, Real):
            raise TypeError("gamma must be a real number")
        elif self.gamma == 0.0:
            warnings.warn("with zero gamma the calculation may crash")
        elif self.gamma < 0:
            raise TypeError("gamma must be positive")
        if not isinstance(self.heta, Real):
            raise TypeError("heta must be a real number")
        elif self.heta == 0.0:
            warnings.warn("with zero heta the calculation may crash")
        elif self.heta < 0:
            raise TypeError("heta must be positive")
        if not isinstance(self.L, int) or self.L < 0:
            raise TypeError("L must be a positive integer")
        if not isinstance(self.n_samples, int) or self.n_samples <= 0:
            raise TypeError("n_samples must be a positive integer")
        if not isinstance(self.P, int) or self.P <= 0:
            raise TypeError("P must be a positive integer")

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        graphs = normalize_input(X)
        ng = len(graphs)
        data = {}
        neighborhoods = {}
        for k, g in enumerate(graphs):
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError(
                    "MultiscaleLaplacian requires node attributes")
            A = g.get_adjacency_matrix()
            try:
                phi = np.array([list(labs[i]) for i in range(g.n)])
            except TypeError:
                raise TypeError("Features must be iterable and castable "
                                "in total to a numpy array.")
            Lap = laplacian(A).astype(float)
            _inc_diag(Lap, self.heta)
            data[k] = {0: A, 1: phi, 2: inv(Lap)}
            neighborhoods[k] = g

        def calculate_C(k, j, l):
            if not isinstance(neighborhoods[k], dict):
                neighborhoods[k] = neighborhoods[k].produce_neighborhoods(
                    r=self.L, sort_neighbors=False)
            indexes = list(neighborhoods[k][l][j])
            Lp = laplacian(
                data[k][0][indexes, :][:, indexes]).astype(float)
            _inc_diag(Lp, self.heta)
            U = data[k][1][indexes, :]
            S = multi_dot((U.T, inv(Lp), U))
            _inc_diag(S, self.gamma)
            return (inv(S), np.sum(np.log(np.real(eigvals(S)))))

        if self._method_calling == 1:
            V = [(k, j) for k in range(ng)
                 for j in range(data[k][0].shape[0])]
            ns = min(len(V), self.n_samples)
            self.random_state_.shuffle(V)
            vs = V[:ns]
            phi_k = np.array([data[k][1][j, :] for (k, j) in vs])
            K = phi_k.dot(phi_k.T)
            v, w = eig(K)
            v, w = np.real(v), np.real(w.T)
            vpos = np.argpartition(v, -self.P)[-self.P:] \
                if v.shape[0] > self.P else np.arange(v.shape[0])
            vpos = vpos[np.where(v[vpos] > positive_eigenvalue_limit)]
            ksi = w[vpos].dot(phi_k).T / np.sqrt(v[vpos])
            for j in range(ng):
                data[j][1] = data[j][1].dot(ksi)
            self._data_level = {0: ksi}
            for l in range(1, self.L + 1):
                self.random_state_.shuffle(V)
                vs = V[:ns]
                K_proj = {k: np.zeros((data[k][0].shape[0], ns))
                          for k in range(ng)}
                K, C = np.zeros((len(vs), len(vs))), {}
                for m, (k, j) in enumerate(vs):
                    C[m] = calculate_C(k, j, l)
                    K_proj[k][j, m] = K[m, m] = \
                        self.pairwise_operation(C[m], C[m])
                    for s, (k2, j2) in enumerate(vs):
                        if s < m:
                            K[s, m] = K[m, s] = K_proj[k2][j2, m] = \
                                K_proj[k][j, s] = \
                                self.pairwise_operation(C[s], C[m])
                        else:
                            break
                for (k, j) in V[ns:]:
                    for m in range(len(vs)):
                        K_proj[k][j, m] = self.pairwise_operation(
                            C[m], calculate_C(k, j, l))
                v, w = eig(K)
                v, w = np.real(v), np.real(w.T)
                vpos = np.argpartition(v, -self.P)[-self.P:] \
                    if v.shape[0] > self.P else np.arange(v.shape[0])
                vpos = vpos[np.where(v[vpos] > positive_eigenvalue_limit)]
                Q = w[vpos].T / np.sqrt(v[vpos])
                for j in range(ng):
                    data[j][1] = K_proj[j].dot(Q)
                self._data_level[l] = (C, Q)
        elif self._method_calling == 3:
            ksi = self._data_level[0]
            for j in range(ng):
                data[j][1] = data[j][1].dot(ksi)
            for l in range(1, self.L + 1):
                C, Q = self._data_level[l]
                for j in range(ng):
                    K_proj = np.zeros((data[j][0].shape[0], len(C)))
                    for n in range(data[j][0].shape[0]):
                        for m in range(len(C)):
                            K_proj[n, m] = self.pairwise_operation(
                                C[m], calculate_C(j, n, l))
                    data[j][1] = K_proj.dot(Q)

        out = []
        for k in range(ng):
            S = multi_dot((data[k][1].T, data[k][2], data[k][1]))
            _inc_diag(S, self.gamma)
            out.append((inv(S), np.sum(np.log(np.real(eigvals(S))))))
        return out

    def pairwise_operation(self, x, y):
        S_inv_x, log_det_x = x
        S_inv_y, log_det_y = y
        log_detS = -np.sum(np.log(np.real(eigvals(S_inv_x + S_inv_y))))
        logr = (log_detS - 0.5 * (log_det_x + log_det_y)) / 2.0
        if logr < -30:
            return 0.0
        return exp(logr)
