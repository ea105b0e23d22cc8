"""Batched one-class SVM dual solve over a whole graph dataset.

SvmTheta (reference grakel/kernels/svm_theta.py:208-235) needs, per
graph, the dual coefficients of ``OneClassSVM(kernel="precomputed")``
on the binarized adjacency: the solution of

    min_a  1/2 a^T K a   s.t.  0 <= a_i <= 1,  sum a = nu * n,

where K = (A > 1e-10) with zero diagonal, spectrally shifted to be PSD
(K <- K/(-lambda_min) + I when lambda_min < -1e-6, :222-229).  The
reference runs a dense float64 ``eigvalsh`` plus a libsvm SMO solve per
graph — tens of milliseconds each, the measured ~100 % of SvmTheta's
wall time at REDDIT scale.

Here the WHOLE dataset is one device program over the flattened vertex
vector (no per-graph dispatch, no size buckets):

* adjacency matvecs are COO gathers + a sorted ``segment_sum`` — the
  batch is a single edge list, so graph size variance costs nothing;
* per-graph extremal eigenvalues come from a batched Lanczos iteration
  (no reorthogonalization: only the spectrum ENDS are read, and ghost
  Ritz values duplicate converged extremes without moving them), with
  the [B, m, m] tridiagonal eigenproblem solved by one batched
  ``eigvalsh``;
* the QP is solved by FISTA with an exact per-graph projection onto
  {0 <= a <= 1, sum a = s} (bisection on the simplex shift, all graphs
  at once), warm-started at libsvm's own initial point (a_i = 1 for the
  first floor(nu*n) vertices, the fractional remainder next) so the
  zero-matrix degenerate case — where ANY feasible point is optimal and
  libsvm returns its initializer untouched — matches by construction.

The fixed 800 FISTA iterations converge to ~1e-11 in float64 prototype
runs on 430-vertex REDDIT-scale graphs (the float32 device path floors
at ~1e-6); libsvm itself stops at a 1e-3 KKT tolerance, so this path is
*more* accurate than the reference, differing from it by libsvm's own
solver error (~2e-3 in a).  tests/test_common.py
(test_svm_qp_matches_libsvm) pins the agreement and checks our
objective never exceeds libsvm's.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["one_class_alphas"]

_LANCZOS_M = 64
_FISTA_ITERS = 800
_BISECT_ITERS = 30
_MIN_WEIGHT = 1e-10
_EIG_TOL = 1e-6

_SOLVE_JIT = {}


def _pow2(x):
    return max(8, 1 << (max(int(x) - 1, 1)).bit_length())


def _build_solver(N_pad, E_pad, B_pad, m, fista_iters):
    def matvec(x, src, dst):
        return jax.ops.segment_sum(x[src], dst, num_segments=N_pad,
                                   indices_are_sorted=True)

    def seg(vals, gid):
        return jax.ops.segment_sum(vals, gid, num_segments=B_pad,
                                   indices_are_sorted=True)

    def solve(src, dst, gid, u, a0, s_target):
        # ---- batched Lanczos for per-graph (lambda_min, lambda_max) --- #
        idx = jnp.arange(N_pad, dtype=jnp.float32)
        v0 = jnp.cos(1.372954 * idx + 0.718281 * gid.astype(jnp.float32))
        v0 = v0 * u  # zero padded lanes
        nrm = jnp.sqrt(seg(v0 * v0, gid))
        v0 = v0 * jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)[gid]

        def lstep(j, carry):
            v_prev, v_cur, beta_prev, al, be = carry
            w = matvec(v_cur, src, dst)
            aj = seg(v_cur * w, gid)
            w = w - aj[gid] * v_cur - beta_prev[gid] * v_prev
            bj = jnp.sqrt(seg(w * w, gid))
            invb = jnp.where(bj > 1e-6, 1.0 / jnp.maximum(bj, 1e-30), 0.0)
            v_next = w * invb[gid]
            bj = jnp.where(bj > 1e-6, bj, 0.0)
            al = al.at[:, j].set(aj)
            be = be.at[:, j].set(bj)
            return v_cur, v_next, bj, al, be

        al = jnp.zeros((B_pad, m), jnp.float32)
        be = jnp.zeros((B_pad, m), jnp.float32)
        _, _, _, al, be = jax.lax.fori_loop(
            0, m, lstep, (jnp.zeros(N_pad, jnp.float32), v0,
                          jnp.zeros(B_pad, jnp.float32), al, be))
        r = jnp.arange(m)
        T = jnp.zeros((B_pad, m, m), jnp.float32)
        T = T.at[:, r, r].set(al)
        T = T.at[:, r[:-1], r[1:]].set(be[:, :m - 1])
        T = T.at[:, r[1:], r[:-1]].set(be[:, :m - 1])
        ev = jnp.linalg.eigvalsh(T)
        lmin, lmax = ev[:, 0], ev[:, -1]

        # ---- spectral shift (reference svm_theta.py:222-229) ---------- #
        cond = lmin < -_EIG_TOL
        scale = jnp.where(cond, -1.0 / jnp.where(cond, lmin, -1.0), 1.0)
        dadd = jnp.where(cond, 1.0, 0.0)
        # Lanczos lmax is a lower bound on the true one; 5% headroom
        # keeps the FISTA step 1/L safely inside the convergent range
        L = 1.05 * scale * jnp.maximum(lmax, 0.0) + dadd + 1e-3

        def Kx(x):
            return scale[gid] * matvec(x, src, dst) + dadd[gid] * x

        def project(v):
            # per-graph projection onto {0 <= a <= u, sum a = s_target}
            lo = jax.ops.segment_min(v, gid, num_segments=B_pad,
                                     indices_are_sorted=True) - 1.0
            hi = jax.ops.segment_max(v, gid, num_segments=B_pad,
                                     indices_are_sorted=True)

            def bstep(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                tot = seg(jnp.clip(v - mid[gid], 0.0, u), gid)
                over = tot > s_target
                return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

            lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bstep, (lo, hi))
            return jnp.clip(v - (0.5 * (lo + hi))[gid], 0.0, u)

        def fstep(_, carry):
            a, y, t = carry
            an = project(y - Kx(y) / L[gid])
            tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            yn = an + ((t - 1.0) / tn) * (an - a)
            return an, yn, tn

        a, _, _ = jax.lax.fori_loop(
            0, fista_iters, fstep, (a0, a0, jnp.float32(1.0)))
        return a, lmin

    return jax.jit(solve)


def one_class_alphas(adjm, nu=0.5, fista_iters=_FISTA_ITERS):
    """Dual coefficients for every graph's one-class SVM, batched.

    ``adjm``: list of [n, n] adjacency matrices (any weights; binarized
    at ``> 1e-10`` with the diagonal dropped, matching the reference).
    Returns a list of per-graph float alpha vectors in libsvm's scaling
    (0 <= a_i <= 1, sum = nu * n).
    """
    ns = [int(A.shape[0]) for A in adjm]
    B = len(adjm)
    N = int(np.sum(ns))
    offs = np.concatenate([[0], np.cumsum(ns)])
    srcs, dsts = [], []
    for g, A in enumerate(adjm):
        i, j = np.nonzero(np.asarray(A) > _MIN_WEIGHT)
        keep = i != j
        srcs.append((i[keep] + offs[g]).astype(np.int32))
        dsts.append((j[keep] + offs[g]).astype(np.int32))
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int32)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int32)
    o = np.argsort(dst, kind="stable")
    src, dst = src[o], dst[o]

    N_pad, E_pad, B_pad = _pow2(N + 1), _pow2(max(src.size, 1)), B + 1
    src = np.pad(src, (0, E_pad - src.size), constant_values=N)
    dst = np.pad(dst, (0, E_pad - dst.size), constant_values=N)
    gid = np.full(N_pad, B, np.int32)
    gid[:N] = np.repeat(np.arange(B, dtype=np.int32), ns)
    u = np.zeros(N_pad, np.float32)
    u[:N] = 1.0
    # libsvm's one-class initial point (svm.cpp solve_one_class): the
    # first floor(nu*n) alphas at the upper bound, the fractional
    # remainder on the next vertex, zero elsewhere
    a0 = np.zeros(N_pad, np.float32)
    for g, n in enumerate(ns):
        nl = nu * n
        w = int(nl)
        a0[offs[g]:offs[g] + w] = 1.0
        if w < n:
            a0[offs[g] + w] = nl - w
    s_target = np.zeros(B_pad, np.float32)
    s_target[:B] = nu * np.asarray(ns, np.float32)

    key = (N_pad, E_pad, B_pad, _LANCZOS_M, fista_iters)
    fn = _SOLVE_JIT.get(key)
    if fn is None:
        fn = _build_solver(N_pad, E_pad, B_pad, _LANCZOS_M, fista_iters)
        _SOLVE_JIT[key] = fn
    a, _ = fn(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(gid),
              jnp.asarray(u), jnp.asarray(a0), jnp.asarray(s_target))
    a = np.asarray(a, np.float64)
    return [a[offs[g]:offs[g] + n] for g, n in enumerate(ns)]
