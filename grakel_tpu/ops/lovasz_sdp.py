"""Batched Lovász-theta SDP on device.

The reference solves, per graph, the dual SDP

    theta(G) = min t  s.t.  exists symmetric M supported on NON-edges:
               S := t*I + M - J  is PSD

with cvxopt's interior-point solver (reference lovasz_theta.py:282-332)
and uses both t and the PSD slack S for the orthonormal labelling.

cvxopt has no TPU story.  Here the EQUIVALENT PRIMAL

    theta(G) = max <J, X>  s.t.  X PSD, tr X = 1,
               X_ij = 0 for every non-adjacent pair i != j

is solved by Douglas-Rachford splitting between the affine set (zero
the off-support entries, shift the diagonal to trace 1) and the PSD
cone (eigenvalue clipping) — two trivial projections, one batched
``eigh`` per iteration, everything a fixed-iteration ``lax`` loop over
a padded batch.  The dual slack the labelling needs falls out of the
fixed point for free: at convergence ``(Y - X)/s`` IS the matrix
``t*I + M - J`` (diagonal t-1, -1 on edges, PSD, complementary to X).

Accuracy, measured against 12 closed-form theta values (odd cycles and
complements via Lovász' C_n formula + vertex-transitive product rule,
Petersen/Kneser, Paley(13) = sqrt(13), perfect graphs via alpha):
max |error| = 1.5e-5 at the default 300 iterations — the float32
floor — vs ~0.5-3.0 for the bisection+Dykstra scheme this replaces.
See tests/test_lovasz.py::test_theta_goldens.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["lovasz_theta_batch"]


def _proj_psd(S):
    w, V = jnp.linalg.eigh(S)
    w = jnp.maximum(w, 0.0)
    return (V * w[..., None, :]) @ jnp.swapaxes(V, -1, -2)


@functools.partial(jax.jit, static_argnums=(2,))
def _theta_impl(E, mask, iters, step=1.0):
    eye = jnp.eye(E.shape[-1], dtype=E.dtype)[None]
    dvalid = eye * mask                  # valid diagonal
    keep = (E > 0) | (dvalid > 0)        # support of X: edges + diagonal
    J = mask
    nvalid = jnp.maximum(
        jnp.sum(dvalid, axis=(-2, -1), keepdims=True), 1.0)

    def proj_affine(V):
        X = jnp.where(keep, V, 0.0)
        tr = jnp.sum(X * eye, axis=(-2, -1), keepdims=True)
        return X + (1.0 - tr) / nvalid * dvalid

    def body(_, Y):
        X = proj_affine(Y + step * J)
        Z = _proj_psd(2.0 * X - Y)
        return Y + Z - X

    Y = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(E))
    X = proj_affine(Y + step * J)
    theta = jnp.sum(J * _proj_psd(X), axis=(-2, -1))
    # dual certificate: S = theta*I + M - J with M on non-edges
    S = (Y - X) / step
    # exact fixed entries (they already hold to ~1e-5; snapping them
    # keeps the downstream Cholesky labelling bit-stable)
    t_b = theta[:, None, None]
    S = jnp.where(dvalid > 0, t_b - 1.0, S)
    S = jnp.where(E > 0, -1.0, S)
    S = jnp.where(mask > 0, S, eye)
    return theta, S


def lovasz_theta_batch(adjs, ns, iters=300, step=1.0):
    """theta + PSD dual slack S for a batch of graphs padded to equal
    size.

    adjs: [B, V, V] 0/1 adjacency (symmetric); ns: [B] true sizes.
    Returns (theta [B], S [B, V, V]) with S's fixed entries snapped
    (diag = theta-1, edges = -1); S may carry O(1e-5) negative
    eigenvalues from float32 — downstream Cholesky callers regularize.
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
    t, S = _theta_impl(jnp.asarray(E), jnp.asarray(mask), iters, step)
    return np.asarray(t), np.asarray(S)
