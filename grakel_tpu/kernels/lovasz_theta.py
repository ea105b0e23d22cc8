"""Lovász-theta kernel (Johansson et al. 2014).

Reference semantics (grakel/kernels/lovasz_theta.py):

* per graph: the Lovász SDP — min t s.t. S = t*I + M - J PSD with M
  supported on NON-edges — yields t and the PSD slack S (:282-332);
  orthonormal labelling U = (e_d 1^T + cholesky(S)) / sqrt(t), padded to
  d = max graph size + 1 rows (:335-378);
* for each sampled vertex subset (counts by ``distribute_samples``):
  the cosine of the minimum enclosing cone of the subset's labelling
  columns via Welzl's minidisk (:380-506); phi = per-subset-size mean;
* pairwise = metric(phi_x, phi_y), default full inner product (:509).

Where the reference requires cvxopt's interior-point solver (optional,
Windows-fragile), grakel_tpu solves the SDP ON DEVICE: Douglas-Rachford
splitting on the equivalent primal (one batched ``eigh`` per iteration)
over size-bucketed graph batches, with the dual slack recovered from
the fixed point (ops/lovasz_sdp.py).  Theta matches 12 closed-form
golden values to <= 1.5e-5 (tests/test_lovasz.py::test_theta_goldens),
far below the subset-sampling noise; no cvxopt needed.
"""

from __future__ import annotations

import warnings

import numpy as np
from numpy.linalg import LinAlgError, cholesky, norm, solve
from sklearn.utils import check_random_state

from .base import Kernel, normalize_input
from ..ops.lovasz_sdp import lovasz_theta_batch
from ..tools import distribute_samples

__all__ = ["LovaszTheta"]

angle_precision = 1e-6
tolerance = 1e-1
min_weight = 1e-10


def inner_product(x, y):
    return x.T.dot(y)


class LovaszTheta(Kernel):
    """Lovász-theta kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 random_state=None, n_samples=50, subsets_size_range=(2, 8),
                 max_dim=None, metric=inner_product):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.random_state = random_state
        self.n_samples = n_samples
        self.subsets_size_range = subsets_size_range
        self.max_dim = max_dim
        self.metric = metric

    def initialize(self):
        self.random_state_ = check_random_state(self.random_state)
        if not isinstance(self.n_samples, int) or self.n_samples <= 0:
            raise TypeError("n_samples must be a positive integer")
        if (not isinstance(self.subsets_size_range, tuple)
                or len(self.subsets_size_range) != 2
                or self.subsets_size_range[0] > self.subsets_size_range[1]
                or self.subsets_size_range[0] <= 0):
            raise TypeError("subsets_size_range must be an increasing "
                            "positive int pair")
        if not callable(self.metric):
            raise TypeError("metric must be callable")
        if self.max_dim is not None and (not isinstance(self.max_dim, int)
                                         or self.max_dim < 1):
            raise ValueError("max_dim if not None, should be an integer "
                             "bigger than 1")
        if self._method_calling in (0, 1, 2) or not hasattr(self, "d_"):
            self.d_ = None if self.max_dim is None else self.max_dim + 1

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        graphs = normalize_input(X)
        adjm = [g.get_adjacency_matrix() for g in graphs]
        max_dim = max(A.shape[0] for A in adjm)
        if self._method_calling in (1, 2):
            if self.d_ is None:
                self.d_ = max_dim + 1
        if self.d_ < max_dim + 1:
            if self.max_dim is None and self._method_calling == 3:
                raise ValueError(
                    "Maximum dimension of a graph in transform is bigger "
                    "than the one found in fit. To avoid that use max_dim "
                    "parameter.")
            raise ValueError("max_dim should correspond to the biggest "
                             "graph inside the dataset")

        # batched device SDP per size bucket
        buckets = {}
        for i, A in enumerate(adjm):
            V = max(4, 1 << (max(A.shape[0] - 1, 1)).bit_length())
            buckets.setdefault(V, []).append(i)
        thetas = [None] * len(adjm)
        slacks = [None] * len(adjm)
        for V, idxs in buckets.items():
            batch = np.zeros((len(idxs), V, V), np.float32)
            ns = []
            for b, gi in enumerate(idxs):
                n = adjm[gi].shape[0]
                batch[b, :n, :n] = (np.abs(adjm[gi]) > min_weight)
                ns.append(n)
            t, S = lovasz_theta_batch(batch, ns)
            for b, gi in enumerate(idxs):
                n = ns[b]
                thetas[gi] = float(t[b])
                slacks[gi] = np.asarray(S[b][:n, :n], np.float64)

        out = []
        for A, t, S in zip(adjm, thetas, slacks):
            if A.shape[0] == 1:
                U = np.ones((self.d_, 1))
            else:
                U = self._labelling(S, t, self.d_)
            out.append(self._mec_levels(U))
        return out

    @staticmethod
    def _labelling(S, t, d):
        """Cholesky labelling (reference :335-378)."""
        n = S.shape[0]
        try:
            V = cholesky(S + 1e-9 * np.eye(n))
        except LinAlgError:
            S = S + 2 * abs(float(np.linalg.eigvalsh(S)[0])) * np.eye(n)
            V = cholesky(S + 1e-9 * np.eye(n))
        V = np.pad(V, [(0, d - n), (0, 0)], mode="constant")
        c = np.zeros(d)
        c[-1] = 1
        C = np.outer(c, np.ones(n))
        return (C + V) / np.sqrt(t)

    def _mec_levels(self, U):
        n = U.shape[1]
        samples = distribute_samples(n, self.subsets_size_range,
                                     self.n_samples)
        lo, hi = self.subsets_size_range
        phi = np.zeros((hi - lo + 1, 1))
        for i, level in enumerate(range(lo, hi + 1)):
            v = samples.get(level)
            if v is not None:
                vals = []
                for _ in range(v):
                    if level <= n:
                        idx = self.random_state_.choice(n, level,
                                                        replace=False)
                    else:
                        idx = np.arange(n)
                    vals.append(self._minimum_cone(U[:, idx]))
                phi[i] = np.mean(vals)
        return phi

    # Welzl minidisk (reference :380-506) ------------------------------ #
    def _minimum_cone(self, U):
        n = U.shape[1]
        P = self.random_state_.permutation(n) - 1
        c, _ = self._b_minidisk(U, P, np.array([], dtype=int))
        with np.errstate(divide="ignore", invalid="ignore"):
            c = c / norm(c, 2)
        t = float(np.min(np.dot(U.T, c)))
        if 1.0 < t < 1.0 + angle_precision:
            t = 1.0
        elif -1.0 - angle_precision < t < -1.0:
            t = -1.0
        return t

    def _b_minidisk(self, A, P, R):
        d, nP, nR = A.shape[0], P.shape[0], R.shape[0]
        if nP == 0 or nR == d + 1:
            if nR == 0:
                return np.zeros(d), 0
            return self._fitball(A[:, R])
        p = P[self.random_state_.randint(0, nP)]
        P_prime = np.delete(P, np.where(P == p))
        c, r = self._b_minidisk(A, P_prime, R)
        if norm(A[:, p] - c, 2) - r > tolerance:
            if p not in R:
                R_prime = np.pad(R, [(0, 1)], mode="constant",
                                 constant_values=p)
                c, r = self._b_minidisk(A, P_prime, R_prime)
        return c, r

    @staticmethod
    def _fitball(A):
        d, n = A.shape
        if n == 1:
            return A[:, 0], 0
        Q = A - np.outer(A[:, 0], np.ones(n))
        B = 2 * np.dot(Q.T, Q)
        b = B.diagonal() / 2
        try:
            L = solve(B[1:, :][:, 1:], b[1:])
        except LinAlgError:
            L = np.linalg.lstsq(B[1:, :][:, 1:], b[1:], rcond=None)[0]
        L = np.pad(L, [(1, 0)], mode="constant")
        C = np.zeros(d)
        for i in range(1, n):
            C = C + L[i] * Q[:, i]
        r = np.sqrt(np.dot(C, C))
        return C + A[:, 1], r

    # ------------------------------------------------------------------ #
    def _feature_matrix(self, parsed):
        if self.metric is not inner_product:
            return None
        return np.concatenate([p.T for p in parsed], axis=0)

    def pairwise_operation(self, x, y):
        v = self.metric(x, y)
        return float(np.asarray(v).reshape(-1)[0])
