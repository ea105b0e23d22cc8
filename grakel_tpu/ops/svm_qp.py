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

Design (all compute per size-bucket SLAB, one device program each):

* graphs bucket by padded size V, slabs capped so [S, V, V] stays under
  ~1 GB; the slab adjacency densifies ON DEVICE from one COO scatter
  (the only scatter in the whole path — measured on the v5e, per-element
  scatter/segment ops run ~30x slower than dense batched reductions, so
  the iteration loops below touch only dense [S, V] math on the MXU);
* per-graph extremal eigenvalues come from a batched Lanczos iteration
  (m = 64, no reorthogonalization: only the spectrum ENDS are read, and
  ghost Ritz values duplicate converged extremes without moving them),
  with the [S, m, m] tridiagonal eigenproblem one batched ``eigvalsh``;
* the QP is solved by FISTA — batched GEMV gradient + exact per-graph
  projection onto {0 <= a <= 1, sum a = s} (bisection on the simplex
  shift, dense axis-1 reductions) — warm-started at libsvm's own
  initial point a_i = clip(nu*n - i, 0, 1), so the zero-matrix
  degenerate case (where ANY feasible point is optimal and libsvm
  returns its initializer untouched) matches by construction.

The fixed 300 FISTA iterations converge to ~1e-7 in float64 prototype
runs on 430-vertex REDDIT-scale graphs (the float32 device path floors
near 1e-6); libsvm itself stops at a 1e-3 KKT tolerance, so this path
is *more* accurate than the reference, differing from it by libsvm's
own solver error (~2e-3 in a).  tests/test_common.py
(test_svm_qp_matches_libsvm) pins the agreement and checks our
objective never exceeds libsvm's.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["one_class_alphas"]

_LANCZOS_M = 64
_FISTA_ITERS = 300
_BISECT_ITERS = 30
_MIN_WEIGHT = 1e-10
_EIG_TOL = 1e-6
_SLAB_BYTES = 1 << 30

_SOLVE_JIT = {}


def _pow2(x):
    return max(8, 1 << (max(int(x) - 1, 1)).bit_length())


# the scatter-densify is its own (trivially compiled) jit because its
# shape key includes the per-slab edge count; the heavy solver below is
# keyed only by (S, V) and compiles once per bucket
_DENSIFY_JIT = {}


def _densify(eflat, ew, S, V):
    fn = _DENSIFY_JIT.get((S, V, eflat.size))
    if fn is None:
        fn = jax.jit(lambda f, w: jnp.zeros(
            (S * V * V,), jnp.float32).at[f].add(w).reshape(S, V, V))
        _DENSIFY_JIT[(S, V, eflat.size)] = fn
    return fn(jnp.asarray(eflat), jnp.asarray(ew))


def _build_solver(S, V, m, fista_iters):
    def solve(K, u, a0, s_target):
        def mv(x):  # batched GEMV on the MXU
            return jnp.einsum("svw,sw->sv", K, x,
                              preferred_element_type=jnp.float32)

        # ---- batched Lanczos for per-graph (lambda_min, lambda_max) --- #
        i_v = jnp.arange(V, dtype=jnp.float32)[None, :]
        g_v = jnp.arange(S, dtype=jnp.float32)[:, None]
        v0 = jnp.cos(1.372954 * i_v + 0.718281 * g_v) * u
        nrm = jnp.sqrt(jnp.sum(v0 * v0, axis=1, keepdims=True))
        v0 = v0 * jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)

        def lstep(j, carry):
            v_prev, v_cur, beta_prev, al, be = carry
            w = mv(v_cur)
            aj = jnp.sum(v_cur * w, axis=1)
            w = w - aj[:, None] * v_cur - beta_prev[:, None] * v_prev
            bj = jnp.sqrt(jnp.sum(w * w, axis=1))
            invb = jnp.where(bj > 1e-6, 1.0 / jnp.maximum(bj, 1e-30), 0.0)
            v_next = w * invb[:, None]
            bj = jnp.where(bj > 1e-6, bj, 0.0)
            return v_cur, v_next, bj, al.at[:, j].set(aj), be.at[:, j].set(bj)

        al = jnp.zeros((S, m), jnp.float32)
        be = jnp.zeros((S, m), jnp.float32)
        _, _, _, al, be = jax.lax.fori_loop(
            0, m, lstep, (jnp.zeros((S, V), jnp.float32), v0,
                          jnp.zeros(S, jnp.float32), al, be))
        r = jnp.arange(m)
        T = jnp.zeros((S, m, m), jnp.float32)
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
            return scale[:, None] * mv(x) + dadd[:, None] * x

        def project(v):
            lo = jnp.min(v, axis=1) - 1.0
            hi = jnp.max(v, axis=1)

            def bstep(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                tot = jnp.sum(jnp.clip(v - mid[:, None], 0.0, u), axis=1)
                over = tot > s_target
                return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

            lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bstep, (lo, hi))
            return jnp.clip(v - (0.5 * (lo + hi))[:, None], 0.0, u)

        def fstep(_, carry):
            a, y, t = carry
            an = project(y - Kx(y) / L[:, None])
            tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            yn = an + ((t - 1.0) / tn) * (an - a)
            return an, yn, tn

        a, _, _ = jax.lax.fori_loop(
            0, fista_iters, fstep, (a0, a0, jnp.float32(1.0)))
        return a

    return jax.jit(solve)


def one_class_alphas(adjm, nu=0.5, fista_iters=_FISTA_ITERS):
    """Dual coefficients for every graph's one-class SVM, batched.

    ``adjm``: list of [n, n] adjacency matrices (any weights; binarized
    at ``> 1e-10`` with the diagonal dropped, matching the reference).
    Returns a list of per-graph float alpha vectors in libsvm's scaling
    (0 <= a_i <= 1, sum = nu * n).
    """
    out = [None] * len(adjm)
    buckets = {}
    for gi, A in enumerate(adjm):
        V = _pow2(A.shape[0])
        buckets.setdefault(V, []).append(gi)
    for V, idxs in sorted(buckets.items()):
        s_cap = int(max(8, min(256, _SLAB_BYTES // (V * V * 4))))
        for s0 in range(0, len(idxs), s_cap):
            slab = idxs[s0:s0 + s_cap]
            S = len(slab)
            # multi-slab buckets pad every slab to s_cap so the heavy
            # solver program compiles once per (V,)
            S_pad = s_cap if len(idxs) > s_cap else _pow2(S)
            eflats, ews = [], []
            u = np.zeros((S_pad, V), np.float32)
            s_target = np.zeros(S_pad, np.float32)
            ns = np.zeros(S_pad, np.float32)
            for g, gi in enumerate(slab):
                A = np.asarray(adjm[gi])
                n = A.shape[0]
                i, j = np.nonzero(A > _MIN_WEIGHT)
                keep = i != j
                eflats.append((g * V * V + i[keep] * V
                               + j[keep]).astype(np.int64))
                ews.append(np.ones(int(keep.sum()), np.float32))
                u[g, :n] = 1.0
                s_target[g] = nu * n
                ns[g] = n
            eflat = (np.concatenate(eflats) if eflats
                     else np.zeros(0, np.int64))
            ew = np.concatenate(ews) if ews else np.zeros(0, np.float32)
            E_pad = _pow2(max(eflat.size, 1))
            eflat = np.pad(eflat, (0, E_pad - eflat.size))
            ew = np.pad(ew, (0, E_pad - ew.size))  # zero-weight pads
            # libsvm's one-class initial point (svm.cpp
            # solve_one_class): first floor(nu*n) alphas at the upper
            # bound, the fractional remainder next, zero elsewhere —
            # exactly clip(nu*n - i, 0, 1)
            a0 = np.clip(s_target[:, None] - np.arange(V)[None, :],
                         0.0, 1.0).astype(np.float32) * u

            K = _densify(eflat, ew, S_pad, V)
            key = (S_pad, V, _LANCZOS_M, fista_iters)
            fn = _SOLVE_JIT.get(key)
            if fn is None:
                fn = _build_solver(S_pad, V, _LANCZOS_M, fista_iters)
                _SOLVE_JIT[key] = fn
            a = np.asarray(fn(K, jnp.asarray(u), jnp.asarray(a0),
                              jnp.asarray(s_target)), np.float64)
            for g, gi in enumerate(slab):
                out[gi] = a[g, :adjm[gi].shape[0]]
    return out
