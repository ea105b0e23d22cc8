"""Random-walk kernels (geometric / exponential / p-step).

Reference semantics (grakel/kernels/random_walk.py:181-272, 275-471):

* ``method_type='fast', kernel_type='geometric', p=None`` (default):
  conjugate-gradient solve of ``(I - lamda * (Ax (x) Ay)) x = 1`` with the
  matvec realized as ``x - lamda*vec(Ax @ X @ Ay)``, rtol=1e-6,
  maxiter=20; kernel = sum(x).
* ``fast`` + (``p`` or exponential): per-graph spectral data at parse —
  ``u = sum_rows(eigvecs)``, ``w = eigvals`` (reference ``sd``
  :478-483) — and k(i,j) = (u_i^2)^T f(lamda * w_i w_j^T) (u_j^2) with
  f = exp for exponential or the mu-series for p-step (:228-254).
* ``baseline``: dense Kronecker system; geometric = linear solve against
  the ones vector, exponential = ones^T expm(lamda*W) ones, p-step =
  iterated matvecs with the mu series (:204-227).

``RandomWalkLabeled`` (:275-471): same numerics on label-filtered
adjacencies; the CG matvec ``sum_k Ax_k @ X @ Ay_k`` over common ordered
label pairs is computed WITHOUT materializing the per-label-pair matrix
dict, via the mask identity

    sum_k Ax_k X Ay_k = sum_c Dx_c Ax (M ∘ (X Dy_c Ay))

(M[u,v] = [Lx[u] == Ly[v]]) which costs 2 GEMMs per common label.

TPU design: graphs are padded into size buckets; every pair function is
``vmap``-ped over flat chunks of (i, j) pairs so the MXU sees batched
[B, V, V] GEMMs.  CG runs a fixed ``maxiter`` loop with per-pair
convergence freezing (scipy-equivalent stopping).
"""

from __future__ import annotations

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .base import Kernel, normalize_input

__all__ = ["RandomWalk", "RandomWalkLabeled"]

_CHUNK = 512  # pairs per jitted vmap call


def _bucket(n):
    return max(8, 1 << (max(int(n) - 1, 1)).bit_length())


# --------------------------------------------------------------------- #
# pair numerics (all operate on padded [V1,V1] / [V2,V2] adjacencies)
# --------------------------------------------------------------------- #

def _cg_sum(matvec, b, iters, rtol):
    """CG on A x = b (x0=0); returns sum(x) after convergence/iters.

    ``b`` is any-shaped (matrix form); inner products contract all axes.
    Per-pair freezing mirrors scipy.sparse.linalg.cg's stopping rule
    ``||r|| <= rtol * ||b||``.
    """
    dot = lambda a, c: jnp.sum(a * c)
    bnorm = jnp.sqrt(dot(b, b))
    x = jnp.zeros_like(b)
    r = b
    p = b
    rs = dot(r, r)

    def step(_, carry):
        x, r, p, rs = carry
        done = jnp.sqrt(rs) <= rtol * bnorm
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = jnp.where(done | (denom == 0), 0.0, rs / jnp.where(denom == 0, 1.0, denom))
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot(r, r)
        beta = jnp.where(done | (rs == 0), 0.0, rs_new / jnp.where(rs == 0, 1.0, rs))
        p = jnp.where(done, p, r + beta * p)
        rs = jnp.where(done, rs, rs_new)
        return x, r, p, rs

    x, _, _, _ = jax.lax.fori_loop(0, iters, step, (x, r, p, rs))
    return jnp.sum(x)


def _pair_cg_geometric(Ax, Ay, bx, by, lamda, iters=20, rtol=1e-6):
    """Unlabeled fast-geometric pair kernel.  bx/by = valid-size masks."""
    b = bx[:, None] * by[None, :]
    mv = lambda X: X - lamda * (Ax @ X @ Ay)
    return _cg_sum(mv, b, iters, rtol)


def _pair_cg_labeled(Ax, Ay, Lx, Ly, bx, by, n_labels, lamda,
                     iters=20, rtol=1e-6):
    """Labeled fast-geometric pair kernel via the per-label mask identity."""
    b = bx[:, None] * by[None, :]
    M = (Lx[:, None] == Ly[None, :]) & (bx[:, None] > 0) & (by[None, :] > 0)
    M = M.astype(Ax.dtype)
    onehot_x = (Lx[:, None] == jnp.arange(n_labels)[None, :]) & (bx[:, None] > 0)
    onehot_y = (Ly[:, None] == jnp.arange(n_labels)[None, :]) & (by[:, None] > 0)
    onehot_x = onehot_x.astype(Ax.dtype)   # [V1, L]
    onehot_y = onehot_y.astype(Ax.dtype)   # [V2, L]

    def mv(X):
        def per_label(c, acc):
            dyc = onehot_y[:, c]
            dxc = onehot_x[:, c]
            W = M * ((X * dyc[None, :]) @ Ay)
            return acc + dxc[:, None] * (Ax @ W)
        y = jax.lax.fori_loop(0, n_labels, per_label,
                              jnp.zeros_like(X))
        return X - lamda * y

    return _cg_sum(mv, b, iters, rtol)


def _pair_spectral(ux, wx, uy, wy, lamda, mu, exponential):
    """fast + (exponential | p-step): k = (ux^2)^T f(wx wy^T) (uy^2)."""
    W = wx[:, None] * wy[None, :]
    if exponential:
        F = jnp.exp(lamda * W)
    else:
        F = jnp.full_like(W, mu[0])
        P = jnp.ones_like(W)
        for k in mu[1:]:
            P = P * W
            F = F + k * P
    return (ux ** 2) @ F @ (uy ** 2)


@functools.partial(jax.jit, static_argnames=("lamda",))
def _rw_spectral_tile(sx2, mx, sy2, my, lamda):
    """Exact geometric RW tile: K[a, b] = sum_ij sx2[a,i] sy2[b,j]
    / (1 - lamda mx[a,i] my[b,j]).

    The closed form of ``ones^T (I - lamda Ax (x) Ay)^{-1} ones`` in the
    joint eigenbasis (Ax symmetric, Ax = U diag(mu) U^T, s = U^T 1) —
    what the reference's 20-iteration CG approximates
    (random_walk.py:255-272).  Padded eigenpairs carry s = 0 and
    contribute nothing.  fori_loop over the row eigenindex keeps the
    broadcast buffer at [Bx, By, V2]."""
    Bx, V1 = mx.shape

    def body(i, acc):
        den = 1.0 - lamda * mx[:, i][:, None, None] * my[None, :, :]
        term = jnp.sum(sy2[None, :, :] / den, axis=2)    # [Bx, By]
        return acc + sx2[:, i][:, None] * term

    return jax.lax.fori_loop(
        0, V1, body, jnp.zeros((Bx, my.shape[0]), jnp.float32))


@jax.jit
def _rw_moment_gram(phi):
    return jnp.dot(phi, phi.T, preferred_element_type=jnp.float32)


def _kron(Ax, Ay):
    V1, V2 = Ax.shape[0], Ay.shape[0]
    return (Ax[:, None, :, None] * Ay[None, :, None, :]).reshape(V1 * V2,
                                                                 V1 * V2)


def _pair_baseline_geometric(Ax, Ay, bx, by, lamda):
    W = _kron(Ax, Ay)
    b = (bx[:, None] * by[None, :]).reshape(-1)
    n = W.shape[0]
    # sum(inv(I - lamda W)) over the valid block == b^T (I - lamda W)^-1 b
    # because padded rows/cols of W are zero (identity there) and b is the
    # valid indicator.
    A = jnp.eye(n, dtype=W.dtype) - lamda * W
    x = jnp.linalg.solve(A, b)
    return jnp.dot(b, x)


def _pair_baseline_exponential(Ax, Ay, bx, by, lamda):
    W = _kron(Ax, Ay)
    b = (bx[:, None] * by[None, :]).reshape(-1)
    S = jax.scipy.linalg.expm(lamda * W)
    return jnp.dot(b, S @ b)


def _pair_pstep(Ax, Ay, bx, by, mu):
    """p-step series: sum(S) = sum_k mu_k b^T W^k b via iterated matvecs.

    Matvec with W = Ax (x) Ay is vec(Ax V Ay^T); for the sum against the
    ones vector orientation does not matter for symmetric inputs, and the
    reference's own baseline uses the kron convention (random_walk.py:
    204-216) which this reproduces exactly.
    """
    V = bx[:, None] * by[None, :]
    total = mu[0] * jnp.sum(V * V)  # b^T I b = |valid|
    P = V
    for k in mu[1:]:
        P = Ax @ P @ Ay.T
        total = total + k * jnp.sum(V * P)
    return total


def _pair_pstep_labeled(Ax, Ay, Lx, Ly, bx, by, n_labels, mu):
    """Labeled p-step series (reference random_walk.py:427-446).

    sum_k kron(Ax_k, Ay_k) = D_s (Ax (x) Ay) D_s with
    s[(u,v)] = [Lx[u] == Ly[v]], so one series matvec in matrix form is
    V -> s ∘ (Ax @ (V ∘ s) @ Ay^T): a single Hadamard mask around the
    standard two-GEMM Kronecker matvec.
    """
    del n_labels
    V = bx[:, None] * by[None, :]
    s = ((Lx[:, None] == Ly[None, :]).astype(Ax.dtype) * V)
    total = mu[0] * jnp.sum(V * V)  # b^T I b over the valid block
    P = V
    for k in mu[1:]:
        P = s * (Ax @ (P * s) @ Ay.T)
        total = total + k * jnp.sum(V * P)
    return total


def _pair_baseline_labeled(Ax, Ay, Lx, Ly, bx, by, lamda, exponential):
    """Labeled baseline: product-graph weight
    W = D_s (Ax (x) Ay) D_s, s[(u,v)] = [Lx[u] == Ly[v]]."""
    s = ((Lx[:, None] == Ly[None, :]) &
         (bx[:, None] > 0) & (by[None, :] > 0)).astype(Ax.dtype).reshape(-1)
    W = _kron(Ax, Ay) * s[:, None] * s[None, :]
    b = (bx[:, None] * by[None, :]).reshape(-1)
    n = W.shape[0]
    if exponential:
        S = jax.scipy.linalg.expm(lamda * W)
        return jnp.dot(b, S @ b)
    A = jnp.eye(n, dtype=W.dtype) - lamda * W
    return jnp.dot(b, jnp.linalg.solve(A, b))


# --------------------------------------------------------------------- #

class RandomWalk(Kernel):
    """Unlabeled random-walk kernel."""

    _labeled = False

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 lamda=0.1, method_type="fast", kernel_type="geometric",
                 p=None):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.lamda = lamda
        self.method_type = method_type
        self.kernel_type = kernel_type
        self.p = p

    def initialize(self):
        if self.method_type not in ("baseline", "fast"):
            raise ValueError('unsupported method_type')
        if self.kernel_type not in ("geometric", "exponential"):
            raise ValueError('unsupported kernel type: either "geometric" '
                             'or "exponential"')
        if self.p is not None:
            if isinstance(self.p, int) and self.p > 0:
                if self.kernel_type == "exponential":
                    self.mu_ = [1.0]
                    fact = 1.0
                    power = 1.0
                    for k in range(1, self.p + 1):
                        fact *= k
                        power *= self.lamda
                        self.mu_.append(power / fact)
                else:
                    self.mu_ = [1.0]
                    power = 1.0
                    for k in range(1, self.p + 1):
                        power *= self.lamda
                        self.mu_.append(power)
            else:
                raise TypeError("p must be a positive integer or None")
        if self.lamda <= 0:
            raise TypeError("lambda must be positive")
        elif self.lamda > 0.5 and self.p is None:
            warnings.warn("random-walk series may fail to converge")

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        graphs = normalize_input(X)
        out = []
        for g in graphs:
            A = g.get_adjacency_matrix()
            item = {"A": np.asarray(A, np.float32), "n": g.n}
            if self._labeled:
                labs = g.get_labels(label_type="vertex", return_none=True)
                if labs is None:
                    raise ValueError(
                        "RandomWalkLabeled requires node labels")
                item["labels"] = [labs[v] for v in range(g.n)]
            if (self.method_type == "fast"
                    and not self._labeled
                    and (self.p is not None
                         or self.kernel_type == "exponential")):
                # spectral data, host-side like the reference (sd, :478)
                w, v = np.linalg.eig(A)
                item["u"] = np.real(np.sum(v, axis=0)).astype(np.float32)
                item["w"] = np.real(w).astype(np.float32)
            elif (self.method_type == "fast" and not self._labeled
                    and self.p is None and self.kernel_type == "geometric"
                    and item["A"].size
                    and np.array_equal(item["A"], item["A"].T)):
                # symmetric adjacency: the geometric kernel has the exact
                # closed form sum_ij s_i^2 t_j^2 / (1 - lamda mu_i nu_j)
                # — evaluated batched instead of one CG per pair
                if g.n <= self._EIG_MAX_N:
                    w, v = np.linalg.eigh(item["A"])
                    item["s2"] = (np.sum(v, axis=0) ** 2).astype(
                        np.float32)
                    item["mu"] = w.astype(np.float32)
                else:
                    # large graphs: moments m_k = 1^T A^k 1 come from
                    # iterated matvecs (eigh is O(n^3)); mu_max via
                    # power iteration gates series convergence
                    A = np.asarray(item["A"], np.float64)
                    v = np.ones(g.n) / np.sqrt(g.n)
                    mu = 0.0
                    for _ in range(40):
                        v = A @ v
                        nrm = np.linalg.norm(v)
                        if nrm == 0:
                            break
                        mu = nrm
                        v = v / nrm
                    item["mu_max"] = float(mu)
                    item["moments_only"] = True
            out.append(item)
        return out

    # above this size, spectral data comes from matvec moments instead
    # of a full eigendecomposition (parse_input)
    _EIG_MAX_N = 512

    # ------------------------------------------------------------------ #
    # graph tiles per device dispatch on the batched spectral path
    _SPEC_TILE = 256

    def _spectral_gram(self, rows, cols, symmetric):
        """Batched exact geometric Gram from per-graph (s2, mu).

        Two regimes by the worst-case series ratio
        rho = lamda * (max |mu|)^2:

        * rho <= 0.9 — moment features: k = sum_k lamda^k m_x[k] m_y[k]
          with m[k] = sum_i s_i^2 mu_i^k; ONE feature GEMM.
        * else — tiled rational evaluation (_rw_spectral_tile)."""
        def item_mu_max(it):
            if it.get("moments_only"):
                return it["mu_max"]
            return float(np.max(np.abs(it["mu"]))) if it["mu"].size \
                else 0.0
        mu_max = max(item_mu_max(it) for it in list(rows) + list(cols))
        rho = self.lamda * mu_max * mu_max
        any_big = any(it.get("moments_only")
                      for it in list(rows) + list(cols))
        if rho <= 0.9:
            K_terms = int(min(64, max(
                8, np.ceil(np.log(1e-9) / np.log(max(rho, 1e-9))))))
            sq = np.sqrt(self.lamda)

            def feats(items):
                # power (sqrt(lamda) * mu)^k, |.| <= sqrt(rho) < 1:
                # bounded for every k (raw mu^k overflows f32 by k~40)
                P = np.zeros((len(items), K_terms), np.float64)
                for a, it in enumerate(items):
                    if it.get("moments_only"):
                        # m_k = 1^T A^k 1 via iterated matvecs, with
                        # sqrt(lamda) folded in to keep magnitudes flat
                        A = np.asarray(it["A"], np.float64)
                        u = np.ones(it["n"])
                        for k in range(K_terms):
                            P[a, k] = u.sum()
                            u = sq * (A @ u)
                        continue
                    m = sq * np.asarray(it["mu"], np.float64)
                    s2 = np.asarray(it["s2"], np.float64)
                    mk = np.ones_like(m)
                    for k in range(K_terms):
                        P[a, k] = s2 @ mk
                        mk = mk * m
                return P
            Pr = feats(rows)
            Pc = Pr if symmetric else feats(cols)
            return np.asarray(Pr @ Pc.T)
        if any_big:
            # diverging series with moments-only graphs: no rational
            # evaluation possible without their spectra — pair CG path
            return None

        def grouped(items):
            g = {}
            for idx, it in enumerate(items):
                g.setdefault(_bucket(it["n"]), []).append(idx)
            return g
        gr, gc = grouped(rows), grouped(cols)
        K = np.zeros((len(rows), len(cols)), np.float64)

        def packed(items, idxs, V):
            s2 = np.zeros((len(idxs), V), np.float32)
            mu = np.zeros((len(idxs), V), np.float32)
            for a, i in enumerate(idxs):
                n = items[i]["n"]
                s2[a, :n] = items[i]["s2"]
                mu[a, :n] = items[i]["mu"]
            return s2, mu
        T = self._SPEC_TILE
        for V1, ridx in gr.items():
            for V2, cidx in gc.items():
                for r0 in range(0, len(ridx), T):
                    rs = ridx[r0:r0 + T]
                    s2r, mur = packed(rows, rs, V1)
                    for c0 in range(0, len(cidx), T):
                        cs = cidx[c0:c0 + T]
                        if (symmetric and V1 == V2
                                and cs[-1] < rs[0]):
                            continue  # mirror fills it
                        s2c, muc = packed(cols, cs, V2)
                        tile = np.asarray(_rw_spectral_tile(
                            s2r, mur, s2c, muc, float(self.lamda)))
                        K[np.ix_(rs, cs)] = tile
        if symmetric:
            # skipped same-bucket lower-triangle tiles fill by mirror
            iu = np.triu_indices(len(rows), 1)
            K[(iu[1], iu[0])] = K[iu]
        return K

    def _gram(self, px, py=None):
        symmetric = py is None
        rows = px if symmetric else py
        cols = px
        if (not self._labeled and self.method_type == "fast"
                and self.p is None and self.kernel_type == "geometric"
                and all("s2" in it or it.get("moments_only")
                        for it in list(rows) + list(cols))):
            K = self._spectral_gram(rows, cols, symmetric)
            if K is not None:
                return K
        if self._labeled:
            enum = {}
            for it in list(rows) + ([] if symmetric else list(cols)):
                for lab in it["labels"]:
                    if lab not in enum:
                        enum[lab] = len(enum)
            n_labels = max(len(enum), 1)
        K = np.zeros((len(rows), len(cols)), np.float64)
        pairs = []
        for i in range(len(rows)):
            for j in range(len(cols)):
                if symmetric and j < i:
                    continue
                pairs.append((i, j))
        # group by padded size pair for static shapes
        groups = {}
        for i, j in pairs:
            key = (_bucket(rows[i]["n"]), _bucket(cols[j]["n"]))
            groups.setdefault(key, []).append((i, j))
        for (V1, V2), ps in groups.items():
            for lo in range(0, len(ps), _CHUNK):
                chunk = ps[lo:lo + _CHUNK]
                vals = self._pair_chunk(rows, cols, chunk, V1, V2,
                                        enum if self._labeled else None,
                                        n_labels if self._labeled else 0)
                for (i, j), v in zip(chunk, vals):
                    K[i, j] = v
                    if symmetric:
                        K[j, i] = v
        return K

    def _pair_chunk(self, rows, cols, chunk, V1, V2, enum, n_labels):
        B = len(chunk)

        def pad_A(item, V):
            n = item["n"]
            A = np.zeros((V, V), np.float32)
            A[:n, :n] = item["A"]
            m = np.zeros(V, np.float32)
            m[:n] = 1.0
            return A, m

        Ax = np.zeros((B, V1, V1), np.float32)
        Ay = np.zeros((B, V2, V2), np.float32)
        bx = np.zeros((B, V1), np.float32)
        by = np.zeros((B, V2), np.float32)
        for b, (i, j) in enumerate(chunk):
            Ax[b], bx[b] = pad_A(rows[i], V1)
            Ay[b], by[b] = pad_A(cols[j], V2)

        fast = self.method_type == "fast"
        if self._labeled:
            Lx = np.full((B, V1), -1, np.int32)
            Ly = np.full((B, V2), -2, np.int32)
            for b, (i, j) in enumerate(chunk):
                Lx[b, :rows[i]["n"]] = [enum[l] for l in rows[i]["labels"]]
                Ly[b, :cols[j]["n"]] = [enum[l] for l in cols[j]["labels"]]
            if self.p is not None:
                fn = jax.jit(jax.vmap(functools.partial(
                    _pair_pstep_labeled, n_labels=n_labels,
                    mu=tuple(self.mu_))))
                return np.asarray(fn(Ax, Ay, Lx, Ly, bx, by))
            if fast and self.kernel_type == "geometric":
                fn = jax.jit(jax.vmap(functools.partial(
                    _pair_cg_labeled, n_labels=n_labels, lamda=self.lamda)))
                return np.asarray(fn(Ax, Ay, Lx, Ly, bx, by))
            fn = jax.jit(jax.vmap(functools.partial(
                _pair_baseline_labeled, lamda=self.lamda,
                exponential=self.kernel_type == "exponential")))
            return np.asarray(fn(Ax, Ay, Lx, Ly, bx, by))

        if fast and self.p is None and self.kernel_type == "geometric":
            fn = jax.jit(jax.vmap(functools.partial(
                _pair_cg_geometric, lamda=self.lamda)))
            return np.asarray(fn(Ax, Ay, bx, by))
        if fast:  # spectral: p-step or exponential
            ux = np.zeros((B, V1), np.float32)
            wx = np.zeros((B, V1), np.float32)
            uy = np.zeros((B, V2), np.float32)
            wy = np.zeros((B, V2), np.float32)
            for b, (i, j) in enumerate(chunk):
                n1, n2 = rows[i]["n"], cols[j]["n"]
                ux[b, :n1] = rows[i]["u"]
                wx[b, :n1] = rows[i]["w"]
                uy[b, :n2] = cols[j]["u"]
                wy[b, :n2] = cols[j]["w"]
            fn = jax.jit(jax.vmap(functools.partial(
                _pair_spectral, lamda=self.lamda,
                mu=tuple(getattr(self, "mu_", [1.0])),
                exponential=(self.p is None
                             and self.kernel_type == "exponential"))))
            return np.asarray(fn(ux, wx, uy, wy))
        # baseline
        if self.p is not None:
            fn = jax.jit(jax.vmap(functools.partial(
                _pair_pstep, mu=tuple(self.mu_))))
            return np.asarray(fn(Ax, Ay, bx, by))
        if self.kernel_type == "geometric":
            fn = jax.jit(jax.vmap(functools.partial(
                _pair_baseline_geometric, lamda=self.lamda)))
            return np.asarray(fn(Ax, Ay, bx, by))
        fn = jax.jit(jax.vmap(functools.partial(
            _pair_baseline_exponential, lamda=self.lamda)))
        return np.asarray(fn(Ax, Ay, bx, by))


class RandomWalkLabeled(RandomWalk):
    """Label-filtered random-walk kernel (reference random_walk.py:275)."""

    _labeled = True
