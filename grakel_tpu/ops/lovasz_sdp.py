"""Batched Lovász-theta SDP on device.

The reference solves, per graph, the dual SDP

    theta(G) = min t  s.t.  exists symmetric M supported on NON-edges:
               S := t*I + M - J  is PSD

with cvxopt's interior-point solver (reference lovasz_theta.py:282-332)
and uses both t and the PSD slack S for the orthonormal labelling.

cvxopt has no TPU story; instead theta is computed by BISECTION on t
with a Dykstra alternating-projection feasibility test: S must be a PSD
matrix with S_ii = t - 1 and S_ij = -1 on edges (free on non-edges).
Both projections are trivial (entry clamping; eigenvalue clipping), and
everything runs as fixed-iteration ``lax`` loops vmapped over a padded
batch of graphs — one ``eigh`` per inner iteration on the MXU.

Accuracy is set by the bisection/projection budgets (~1e-3 on theta),
well inside the sampling noise of the kernel built on top.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["lovasz_theta_batch"]


def _project_affine(S, E, mask, t):
    """Clamp fixed entries: diag = t-1, edges = -1; keep free entries.
    E: 1 where edge (off-diagonal), mask: 1 on valid x valid block."""
    n = S.shape[-1]
    eye = jnp.eye(n, dtype=S.dtype)
    fixed = eye + E
    target = eye * (t - 1.0) + E * (-1.0)
    S = jnp.where(fixed > 0, target, S)
    # padded rows/cols: identity so PSD-ness is unaffected
    S = jnp.where(mask > 0, S, eye)
    return S


def _project_psd(S):
    w, V = jnp.linalg.eigh(S)
    w = jnp.maximum(w, 0.0)
    return (V * w[..., None, :]) @ jnp.swapaxes(V, -1, -2)


def _feasibility(E, mask, t, iters):
    """Dykstra projections; returns (residual, S).  Residual ~ 0 iff the
    affine ∩ PSD set is (numerically) nonempty at this t."""
    n = E.shape[-1]
    S0 = _project_affine(jnp.zeros_like(E), E, mask, t)

    def body(_, carry):
        S, P = carry
        Y = _project_psd(S + P)
        P = S + P - Y
        S = _project_affine(Y, E, mask, t)
        return S, P

    S, _ = jax.lax.fori_loop(0, iters, body,
                             (S0, jnp.zeros_like(S0)))
    # how far is the affine-feasible S from PSD?
    w = jnp.linalg.eigvalsh(S)
    return -jnp.minimum(w.min(axis=-1), 0.0), S


@functools.partial(jax.jit, static_argnums=(2, 3))
def _theta_impl(E, mask, bisect_iters, proj_iters):
    nvalid = jnp.sum(mask[..., 0, :] > 0, axis=-1).astype(E.dtype)
    lo = jnp.ones(E.shape[0], E.dtype)
    hi = jnp.maximum(nvalid, 1.0)
    tol = 1e-6

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        res, _ = _feasibility(E, mask, mid[:, None, None], proj_iters)
        ok = res <= tol
        lo = jnp.where(ok, lo, mid)
        hi = jnp.where(ok, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi))
    t = hi
    _, S = _feasibility(E, mask, t[:, None, None], 4 * proj_iters)
    return t, S


def lovasz_theta_batch(adjs, ns, bisect_iters=24, proj_iters=60):
    """theta + PSD slack S for a batch of graphs padded to equal size.

    adjs: [B, V, V] 0/1 adjacency (symmetric); ns: [B] true sizes.
    Returns (theta [B], S [B, V, V]) — S restricted to the valid block.
    """
    adjs = np.asarray(adjs)
    B, V, _ = adjs.shape
    E = (adjs > 0).astype(np.float32)
    for b in range(B):
        np.fill_diagonal(E[b], 0.0)
    mask = np.zeros((B, V, V), np.float32)
    for b, n in enumerate(ns):
        mask[b, :n, :n] = 1.0
    E = E * mask
    t, S = _theta_impl(jnp.asarray(E), jnp.asarray(mask),
                       bisect_iters, proj_iters)
    return np.asarray(t), np.asarray(S)
