"""Batched top-d |eigenvector| embeddings for PyramidMatch.

The reference (grakel/kernels/pyramid_match.py:135-151) runs one ARPACK
``eigs(A, k=d, ncv=10d)`` per graph — ~12 ms per REDDIT-scale graph,
the measured 92 % of PyramidMatch's wall time.  ARPACK's default
``which='LM'`` returns the d eigenpairs of LARGEST MAGNITUDE, which the
reference then orders by descending (algebraic) eigenvalue; the
embedding is the element-wise absolute value, so eigenvector signs are
free and a symmetric solver is exact for the same spectrum.

Here graphs are size-bucketed, densified ON DEVICE from one COO edge
list (the H2D transfer is the integer edge list, not [B, V, V] floats),
and each slab runs one batched ``jnp.linalg.eigh``:

* zero padding adds eigenvalue-0 pairs, the smallest possible
  MAGNITUDE, so the (V - n) fake coordinates can never displace a true
  top-|lambda| eigenpair (they tie only when rank(A) < d, where the
  reference's ARPACK call errors too);
* per graph, the d largest-|lambda| eigenpairs are selected and then
  reordered by descending eigenvalue, matching the reference's
  ``which='LM'`` + ``argsort()[::-1]`` composition exactly.

Exact-magnitude TIES at the selection boundary (e.g. the +/-lambda
pairs of bipartite graphs) are resolved by index rather than by
ARPACK's iteration order — the reference's own choice there is
ARPACK-version-dependent.  tests/test_common.py
(test_pm_device_embeddings_match_scipy) pins agreement with the scipy
path on non-degenerate graphs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["batched_topd_abs_eigvecs"]

_SLAB = 128
_SLAB_BYTES = 1 << 28  # cap [S, V, V] f32 slab at 256 MB device bytes


def _slab_cap(V):
    """Slab size bounded by bytes AND by the int32 flat scatter index
    (jnp.asarray silently downcasts host int64 indices with x64 off)."""
    cap = int(max(1, min(_SLAB, _SLAB_BYTES // (V * V * 4))))
    while cap > 1 and cap * V * V > (1 << 31) - 1:
        cap //= 2
    return cap


_EMBED_JIT = {}


# The scatter-densify runs as its OWN jit: its compile is trivial but
# its shape key includes E_pad, which varies slab to slab; the heavy
# eigh program below is keyed only by (S, V, d) and compiles once.
def _densify_coo(src, dst, w, gnum, S, V):
    flat = gnum.astype(np.int64) * (V * V) + src.astype(np.int64) * V \
        + dst.astype(np.int64)
    fn = _DENSIFY_JIT.get((S, V, flat.size))
    if fn is None:
        fn = jax.jit(lambda f, w: jnp.zeros(
            (S * V * V,), jnp.float32).at[f].add(w).reshape(S, V, V))
        _DENSIFY_JIT[(S, V, flat.size)] = fn
    return fn(jnp.asarray(flat), jnp.asarray(w))


_DENSIFY_JIT = {}


_LANCZOS_M = 64


def _build(S, V, d):
    m = min(_LANCZOS_M, V)

    def run(A, v0):
        # Batched Lanczos with FULL reorthogonalization (ghost-free
        # Ritz vectors); a full-spectrum eigh here measures 3.7 s per
        # [128, 1024, 1024] slab on the v5e — ~100x the work needed for
        # d = 6 extremal pairs.  The reorth projects against the whole
        # [S, V, m] basis each step; unset columns are zero and
        # contribute nothing, so the loop index never enters the shapes.
        def mv(x):
            return jnp.einsum("svw,sw->sv", A, x,
                              preferred_element_type=jnp.float32)

        def step(j, carry):
            Q, v, v_prev, beta_prev, al, be = carry
            Q = Q.at[:, :, j].set(v)
            w = mv(v) - beta_prev[:, None] * v_prev
            aj = jnp.sum(v * w, axis=1)
            w = w - aj[:, None] * v
            proj = jnp.einsum("svm,sv->sm", Q, w)
            w = w - jnp.einsum("svm,sm->sv", Q, proj)
            bj = jnp.sqrt(jnp.sum(w * w, axis=1))
            invb = jnp.where(bj > 1e-6, 1.0 / jnp.maximum(bj, 1e-30), 0.0)
            v_next = w * invb[:, None]
            bj = jnp.where(bj > 1e-6, bj, 0.0)
            return (Q, v_next, v, bj, al.at[:, j].set(aj),
                    be.at[:, j].set(bj))

        nrm = jnp.sqrt(jnp.sum(v0 * v0, axis=1, keepdims=True))
        v0 = v0 * jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
        Q = jnp.zeros((S, V, m), jnp.float32)
        al = jnp.zeros((S, m), jnp.float32)
        be = jnp.zeros((S, m), jnp.float32)
        Q, _, _, _, al, be = jax.lax.fori_loop(
            0, m, step, (Q, v0, jnp.zeros((S, V), jnp.float32),
                         jnp.zeros(S, jnp.float32), al, be))
        r = jnp.arange(m)
        T = jnp.zeros((S, m, m), jnp.float32)
        T = T.at[:, r, r].set(al)
        T = T.at[:, r[:-1], r[1:]].set(be[:, :m - 1])
        T = T.at[:, r[1:], r[:-1]].set(be[:, :m - 1])
        theta, Y = jnp.linalg.eigh(T)                       # [S, m]
        # top-d by |lambda|, then descending lambda among them
        # (reference: ARPACK which='LM' then argsort()[::-1])
        order = jnp.argsort(-jnp.abs(theta), axis=1)[:, :d]  # [S, d]
        lam = jnp.take_along_axis(theta, order, axis=1)
        reord = jnp.argsort(-lam, axis=1)
        sel = jnp.take_along_axis(order, reord, axis=1)      # [S, d]
        Ysel = jnp.take_along_axis(Y, sel[:, None, :], axis=2)
        Usel = jnp.einsum("svm,smd->svd", Q, Ysel)
        return jnp.abs(Usel)

    return jax.jit(run)


def batched_topd_abs_eigvecs(items, d):
    """items: list of (key, n, src, dst, w) COO adjacencies (n >= 2).
    Returns {key: |U| [n, d] float64} via slab-batched device Lanczos.
    COO input avoids re-materializing dense [n, n] blocks on host — the
    Graph container already holds a lazy COO view."""
    out = {}
    buckets = {}
    for item in items:
        n = int(item[1])
        V = max(8, 1 << (n - 1).bit_length())
        buckets.setdefault(V, []).append(item)
    for V, group in sorted(buckets.items()):
        s_cap = _slab_cap(V)
        for s0 in range(0, len(group), s_cap):
            slab = group[s0:s0 + s_cap]
            S = len(slab)
            # a bucket bigger than one slab pads every slab to s_cap so
            # the heavy Lanczos program compiles once per (V, d)
            S_pad = s_cap if len(group) > s_cap \
                else min(s_cap, max(8, 1 << (S - 1).bit_length()))
            assert S_pad * V * V <= (1 << 31) - 1
            srcs, dsts, ws, gnums = [], [], [], []
            # deterministic start vector MASKED to real vertices: the
            # Krylov space then lives entirely in the real subspace, so
            # zero-padding never contaminates the Ritz vectors
            v0 = np.zeros((S_pad, V), np.float32)
            for g, (key, n, i, j, wg) in enumerate(slab):
                v0[g, :n] = np.cos(1.372954 * np.arange(n) + 0.718281 * g)
                srcs.append(i)
                dsts.append(j)
                ws.append(np.asarray(wg, np.float32))
                gnums.append(np.full(len(i), g, np.int32))
            src = np.concatenate(srcs).astype(np.int32)
            dst = np.concatenate(dsts).astype(np.int32)
            w = np.concatenate(ws)
            gnum = np.concatenate(gnums)
            E_pad = max(8, 1 << (max(src.size, 1) - 1).bit_length())
            src = np.pad(src, (0, E_pad - src.size))
            dst = np.pad(dst, (0, E_pad - dst.size))
            w = np.pad(w, (0, E_pad - w.size))  # zero-weight pad edges
            gnum = np.pad(gnum, (0, E_pad - gnum.size))

            A = _densify_coo(src, dst, w, gnum, S_pad, V)
            kkey = (S_pad, V, d)
            fn = _EMBED_JIT.get(kkey)
            if fn is None:
                fn = _build(S_pad, V, d)
                _EMBED_JIT[kkey] = fn
            Uabs = np.asarray(fn(A, jnp.asarray(v0)), np.float64)
            for g, (key, n, i, j, wg) in enumerate(slab):
                out[key] = Uabs[g, :n, :]
    return out
