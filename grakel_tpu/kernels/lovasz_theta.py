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
from numpy.linalg import LinAlgError, cholesky
from sklearn.utils import check_random_state

from .base import Kernel, normalize_input
from ..ops.lovasz_sdp import lovasz_theta_batch
from ..tools import distribute_samples

__all__ = ["LovaszTheta"]

angle_precision = 1e-6
min_weight = 1e-10


def inner_product(x, y):
    return x.T.dot(y)


_MEC_JIT = {}


def _min_cone_jit(A, iters):
    """Badoiu-Clarkson minimum-enclosing-ball centers for a batch of
    subsets, fused on the XLA CPU backend (pinned off the — possibly
    tunneled — default device; the arrays are small and host-resident).
    A: [S, d, m] float32 -> cosine t [S_pad] (padded rows are garbage;
    caller slices).  S is padded to a power of two to bound compiles."""
    import jax
    import jax.numpy as jnp

    S, d, m = A.shape
    Sp = max(8, 1 << (max(S - 1, 1)).bit_length())
    if Sp != S:
        A = np.concatenate(
            [A, np.broadcast_to(A[:1], (Sp - S, d, m))], axis=0)
    key = (Sp, d, m, iters)
    fn = _MEC_JIT.get(key)
    if fn is None:
        cpu = jax.local_devices(backend="cpu")[0]

        def run(A):
            def body(k, c):
                d2 = jnp.sum((A - c[:, :, None]) ** 2, axis=1)  # [S, m]
                f = jnp.argmax(d2, axis=1)
                far = jnp.take_along_axis(
                    A, f[:, None, None], axis=2)[:, :, 0]
                return c + (far - c) / (k + 2).astype(jnp.float32)

            c = jax.lax.fori_loop(0, iters, body, A[:, :, 0])
            nc = jnp.linalg.norm(c, axis=1, keepdims=True)
            c = jnp.where(nc > 0, c / jnp.maximum(nc, 1e-30), 0.0)
            return jnp.min(jnp.einsum("sdm,sd->sm", A, c), axis=1)

        # committed CPU input pins the jit to the CPU backend (jit's
        # `device=` argument is deprecated)
        fn = (jax.jit(run), cpu)
        _MEC_JIT[key] = fn
    jit_fn, cpu = fn
    return jit_fn(jax.device_put(A, cpu))


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

        Us = []
        for A, t, S in zip(adjm, thetas, slacks):
            if A.shape[0] == 1:
                U = np.ones((self.d_, 1))
            else:
                U = self._labelling(S, t, self.d_)
            Us.append(U)
        return self._mec_levels_batch(Us)

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

    # minimum-enclosing-cone sampling ---------------------------------- #
    # The reference computes each sampled subset's minimum enclosing cone
    # with a recursive randomized Welzl minidisk (lovasz_theta.py:380-506,
    # containment slack `tolerance` = 1e-1) — thousands of deep Python
    # recursions per dataset, the measured hot spot of the whole kernel
    # (110 s of 110 s on MUTAG-scale input).  Since the cone axis is the
    # center of the subset columns' minimum enclosing BALL, all subsets
    # across all graphs are solved here TOGETHER by a vectorized
    # Badoiu-Clarkson iteration (c <- c + (farthest - c)/(k+2), the
    # Frank-Wolfe scheme on the MEB dual): one [S, d, m] numpy program
    # per subset size instead of S recursions.  _BC_ITERS = 400 leaves
    # the center far inside the reference's own 1e-1 containment slack,
    # and the downstream value is a Monte-Carlo mean over samples.

    _BC_ITERS = 400

    # Subsets are solved in fixed-size slices so peak memory stays
    # bounded independent of dataset size: each slice materializes at
    # most _MEC_CHUNK [d, hi] float32 panels (~_MEC_CHUNK*d*hi*4 bytes;
    # 4096*3000*8*4 = 390 MB at REDDIT-scale d) instead of one
    # dataset-wide [S, d, hi] stack.
    _MEC_CHUNK = 4096

    def _mec_levels_batch(self, Us):
        lo, hi = self.subsets_size_range
        n_levels = hi - lo + 1
        G = len(Us)
        sums = np.zeros((G, n_levels))
        cnts = np.zeros((G, n_levels), dtype=np.int64)
        keys, mats = [], []

        def flush():
            if not keys:
                return
            t = self._min_cone_batch(np.stack(mats).astype(np.float32))
            gi = np.asarray(keys, dtype=np.int64)
            np.add.at(sums, (gi[:, 0], gi[:, 1]), t)
            np.add.at(cnts, (gi[:, 0], gi[:, 1]), 1)
            keys.clear()
            mats.clear()

        for g, U in enumerate(Us):
            n = U.shape[1]
            samples = distribute_samples(n, self.subsets_size_range,
                                         self.n_samples)
            for i, level in enumerate(range(lo, hi + 1)):
                v = samples.get(level)
                if v is None:
                    continue
                for _ in range(v):
                    if level <= n:
                        idx = self.random_state_.choice(n, level,
                                                        replace=False)
                    else:
                        idx = np.arange(n)
                    if idx.size < hi:
                        # pad by repeating the first column — duplicate
                        # points do not move the enclosing ball, so every
                        # subset size shares ONE [S, d, hi] batch
                        idx = np.concatenate(
                            [idx, np.full(hi - idx.size, idx[0],
                                          dtype=np.int64)])
                    keys.append((g, i))
                    mats.append(np.asarray(U[:, idx], np.float32))
                    if len(keys) >= self._MEC_CHUNK:
                        flush()
        flush()
        phi = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        return [phi[g][:, None] for g in range(G)]

    @classmethod
    def _min_cone_batch(cls, A):
        """Min enclosing cone cosine per subset: A [S, d, m] -> t [S].

        One fused XLA-CPU program (jitted per padded shape): the
        Badoiu-Clarkson update runs in a fori_loop, so the [S, d, m]
        temporaries never round-trip through numpy."""
        S = A.shape[0]
        t = np.asarray(_min_cone_jit(A, cls._BC_ITERS),
                       np.float64)[:S]
        t = np.where((t > 1.0) & (t < 1.0 + angle_precision), 1.0, t)
        t = np.where((t < -1.0) & (t > -1.0 - angle_precision), -1.0, t)
        return t

    # ------------------------------------------------------------------ #
    def _feature_matrix(self, parsed):
        if self.metric is not inner_product:
            return None
        return np.concatenate([p.T for p in parsed], axis=0)

    def pairwise_operation(self, x, y):
        v = self.metric(x, y)
        return float(np.asarray(v).reshape(-1)[0])
