"""Pyramid match kernel (Nikolentzos et al. 2017).

Reference semantics (grakel/kernels/pyramid_match.py):

* per graph: d-dim vertex embedding U = |top-d adjacency eigenvectors|
  (scipy ``eigs`` when n > d+1 with ncv=10d, dense ``eig`` otherwise,
  eigenvalues sorted descending) (:135-151);
* histograms at levels j = 0..L-1 with 2^j cells per dimension; labeled
  graphs count per (label*d + dim, cell) row (:181-253); transform-time
  unseen labels extend the label enumeration (:160-176);
* pairwise value: the reference's pairwise loop (:255-288) fills the
  per-level intersection array progressively while re-adding partial
  weighted differences each iteration; its closed form over the final
  per-level intersections I_p is

      k = I_{L-1} + sum_{p=0}^{L-2} 2^{-(L-p-1)} ((L-p) I_p
                                                  - (L-p-1) I_{p+1})

  which this implementation reproduces exactly.

TPU design: embeddings stay on host (iterative ARPACK / LAPACK eig,
matching the reference's numerics); histogram scatters are vectorized
numpy; the per-level all-pairs intersections I_p — the O(N^2) cost —
run as tiled min-intersection Grams on device (ops/intersect.py).

Large label universes (WL-relabeled graphs under the WL-PM framework,
where generations mint thousands of labels) would make the dense
[d * num_labels, 2^j] per-graph histograms and their stacked level
matrices explode (measured: 130x overhead vs plain PM on ENZYMES), so
past ``_DENSE_MAX_W`` the kernel switches to a SPARSE path: histogram
entries become unary-expanded 0/1 features ((level, row, cell, t),
t = 1..count — min(a, b) = sum_t [a>=t][b>=t]), the per-level
intersections fuse into ONE chunked counts-GEMM because the closed-form
level combination k = sum_p c_p I_p has all-positive coefficients
(entries weighted sqrt(c_p)), and the diagonal is the closed form
n_vertices * dims * sum_p c_p (a graph's self-intersection at every
level is its total histogram mass).  Transform maps expanded keys
through the fit enumeration — exact, because a key absent from either
side has min(a, 0) = 0, which also subsumes the reference's truncation
to the common feature width.
"""

from __future__ import annotations

import warnings
from itertools import chain

import numpy as np

from .base import Kernel, normalize_input
from ..ops.gram import coo_counts_gram, coo_counts_gram_rect, fetch_gram
from ..ops.intersect import min_intersection_gram

__all__ = ["PyramidMatch"]


class PyramidMatch(Kernel):
    """Pyramid match kernel."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 with_labels=True, L=4, d=6):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.with_labels = with_labels
        self.L = L
        self.d = d

    def initialize(self):
        if not isinstance(self.with_labels, bool):
            raise TypeError("with_labels must be a boolean")
        if not isinstance(self.L, int) or self.L < 0:
            raise TypeError("L must be a non-negative integer")
        if not isinstance(self.d, int) or self.d <= 0:
            raise TypeError("d must be a positive integer")

    # ------------------------------------------------------------------ #
    def _embed(self, A):
        """|top-d eigenvector| embedding, matching reference :135-151."""
        n = A.shape[0]
        if n > self.d + 1:
            from scipy.sparse import csr_matrix
            from scipy.sparse.linalg import eigs, ArpackError
            try:
                Lambda, U = eigs(csr_matrix(A, dtype=float), k=self.d,
                                 ncv=10 * self.d)
            except ArpackError:
                # edgeless / degenerate adjacency (ARPACK -9: zero
                # starting vector) — the dense solver handles it
                Lambda, U = np.linalg.eig(A)
                Lambda, U = Lambda[:self.d], U[:, :self.d]
            idx = Lambda.argsort()[::-1]
            U = U[:, idx]
        else:
            Lambda, U = np.linalg.eig(A)
            idx = Lambda.argsort()[::-1]
            U = U[:, idx][:, :self.d]
        return np.absolute(U)

    # graphs at least this large embed through the slab-batched device
    # eigh (ops/spectral.py) instead of per-graph ARPACK: identical math
    # (|top-d-by-magnitude eigenvectors|, descending), ~92 % of REDDIT
    # wall time moved off the host.  Smaller graphs keep the scipy path,
    # where ARPACK is cheap and the parity suite compares bit-for-bit.
    _DEVICE_EMBED_MIN_N = 128

    def parse_input(self, X):
        graphs = normalize_input(X)
        # embeddings are STRUCTURE-only (|top-d adjacency eigenvectors|),
        # so they live in the graph's structural cache — shared across
        # WL/CoreFramework generations, which relabel but keep structure
        # (the WL-PM profile showed 6x redundant ARPACK without this)
        ck = f"pm_embed_{self.d}"
        big = []
        for i, g in enumerate(graphs):
            if ck not in g._cache and g.n >= self._DEVICE_EMBED_MIN_N:
                # feed the graph's lazy COO straight to the device path
                # — no dense [n, n] materialization on host
                big.append((i, g.n, g.senders, g.receivers, g.weights))
        dev_U = {}
        if big:
            from ..ops.spectral import batched_topd_abs_eigvecs
            dev_U = batched_topd_abs_eigvecs(big, self.d)
        Us, Ls = [], []
        for i, g in enumerate(graphs):
            if ck not in g._cache:
                U = dev_U.get(i)
                if U is None:
                    U = self._embed(g.get_adjacency_matrix())
                g._cache[ck] = U
            Us.append((g.n, g._cache[ck]))
            if self.with_labels:
                labs = g.get_labels(label_type="vertex", return_none=True)
                if labs is None:
                    raise ValueError(
                        "PyramidMatch with_labels=True requires node labels")
                Ls.append(labs)
        if self.with_labels:
            if self._method_calling in (1, 2):
                self._labels = set()
                for L in Ls:
                    self._labels |= set(L.values())
                self._labels = {l: i for i, l in enumerate(self._labels)}
                labels = self._labels
            else:
                rest = set()
                for L in Ls:
                    rest |= set(L.values())
                rest -= set(self._labels.keys())
                labels = dict(chain(
                    self._labels.items(),
                    ((j, i) for i, j in enumerate(rest, len(self._labels)))))
        else:
            Ls, labels = None, None
        num_labels = len(labels) if labels is not None else 1
        if self._method_calling in (1, 2):
            self._sparse_mode = (num_labels * self.d * (1 << max(
                self.L - 1, 0)) > self._DENSE_MAX_W)
        if self._sparse_mode:
            return self._sparse_entries(Us, Ls, labels)
        return self._histograms(Us, Ls, labels)

    # densest-level width past which the sparse unary path takes over
    _DENSE_MAX_W = 4096

    def _level_coeffs(self):
        """k = sum_p c_p I_p — closed-form positive level weights
        (the expansion of :meth:`_combine`; all c_p > 0)."""
        L = self.L
        c = np.zeros(max(L, 1))
        if L == 0:
            return c
        c[L - 1] = 1.0
        for p in range(L - 1):
            w = 1.0 / 2 ** (L - p - 1)
            c[p] += w * (L - p)
            c[p + 1] -= w * (L - p - 1)
        return c

    def _sparse_entries(self, Us, Ls, labels):
        """Unary-expanded COO features for the sparse Gram path.

        Returns {"sparse", "n", "gids", "ekeys", "mass"}:
        per occurrence t = 1..count of histogram cell (level, row, cell),
        one int64 key (lvl << 60 | row << 30 | cell << 20 | t) — a fixed
        layout so transform keys map through the fit enumeration."""
        d = self.d
        if self.L > 8:
            # lvl occupies bits 60..62 of the int64 key
            raise ValueError("sparse PyramidMatch path supports L <= 8")
        gl, rl, cl, ll = [], [], [], []
        mass = np.zeros(len(Us))
        for gi, (n, u) in enumerate(Us):
            u = u[:n]
            if n == 0:
                continue
            du = u.shape[1]
            mass[gi] = n * du
            if Ls is not None:
                row_lab = np.fromiter(
                    (labels[Ls[gi][p]] for p in range(n)), np.int64, n)
                rows = (row_lab[:, None] * d
                        + np.arange(du)[None, :]).ravel()
            else:
                rows = np.broadcast_to(np.arange(du), (n, du)).ravel()
            for j in range(self.L):
                k = 1 << j
                T = np.floor(u * k).astype(np.int64)
                T[T == k] = k - 1
                gl.append(np.full(rows.size, gi, np.int64))
                rl.append(rows)
                cl.append(T.ravel())
                ll.append(np.full(rows.size, j, np.int64))
        if not gl:
            return {"sparse": True, "n": len(Us),
                    "gids": np.zeros(0, np.int64),
                    "ekeys": np.zeros(0, np.int64), "mass": mass}
        gids = np.concatenate(gl)
        rows = np.concatenate(rl)
        cells = np.concatenate(cl)
        lvls = np.concatenate(ll)
        if rows.size and (int(rows.max()) >= 1 << 30
                          or len(Us) >= 1 << 19):
            raise ValueError("sparse PyramidMatch key space exceeded")
        # per-(gid, lvl, row, cell) counts -> unary expansion t = 1..c
        ckey = ((((gids << 4) | lvls) << 30 | rows) << 10) | cells
        uk, counts = np.unique(ckey, return_counts=True)
        if counts.size and int(counts.max()) >= 1 << 20:
            raise ValueError("sparse PyramidMatch count space exceeded")
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        t = (np.arange(int(counts.sum()), dtype=np.int64)
             - np.repeat(offs, counts) + 1)
        g_rep = np.repeat(uk >> 44, counts)
        lvl_rep = np.repeat((uk >> 40) & 0xF, counts)
        row_rep = np.repeat((uk >> 10) & ((1 << 30) - 1), counts)
        cell_rep = np.repeat(uk & ((1 << 10) - 1), counts)
        ekeys = (lvl_rep << 60) | (row_rep << 30) | (cell_rep << 20) | t
        return {"sparse": True, "n": len(Us), "gids": g_rep,
                "ekeys": ekeys, "mass": mass}

    def _histograms(self, Us, Ls=None, labels=None):
        """Per-graph per-level cell-count histograms, scattered for ALL
        graphs at once (one ``np.add.at`` per level instead of one per
        (graph, level) — the per-call overhead dominated REDDIT-scale
        parse)."""
        num_labels = len(labels) if labels is not None else 1
        G = len(Us)
        vals, gid_l, row_l = [], [], []
        for gi, (n, u) in enumerate(Us):
            u = u[:n]
            if n == 0 or u.size == 0:
                continue
            du = u.shape[1]
            dims = np.broadcast_to(np.arange(du), (n, du))
            if Ls is not None:
                row_lab = np.fromiter(
                    (labels[Ls[gi][p]] for p in range(n)), np.int64, n)
                rows = row_lab[:, None] * self.d + dims
            else:
                rows = dims
            vals.append(u.ravel())
            row_l.append(rows.ravel())
            gid_l.append(np.full(n * du, gi, np.int64))
        R = self.d * num_labels
        levels = []
        if vals:
            v = np.concatenate(vals)
            rr = np.concatenate(row_l)
            gg = np.concatenate(gid_l)
        for j in range(self.L):
            k = 2 ** j
            D = np.zeros((G, R, k))
            if vals:
                T = np.floor(v * k).astype(np.int64)
                T[T == k] = k - 1
                np.add.at(D, (gg, rr, T), 1)
            levels.append(D)
        return [[levels[j][gi] for j in range(self.L)] for gi in range(G)]

    # ------------------------------------------------------------------ #
    def _level_matrix(self, parsed, level, width):
        """Stack level-``level`` histograms flattened to ``width``."""
        n = len(parsed)
        out = np.zeros((n, width), np.float32)
        for i, du in enumerate(parsed):
            if len(du) == 0:
                continue
            flat = du[level].ravel()
            m = min(len(flat), width)
            out[i, :m] = flat[:m]
        return out

    def _intersections(self, px, py):
        """Per-level all-pairs intersections I_p[j] [len(py), len(px)].

        Row truncation to the smaller label count (reference :270-277) is
        equivalent to truncating the flattened feature width to the
        smaller of the two, because rows are label-major and each level's
        cell count is shared.
        """
        I = []
        for j in range(self.L):
            wx = next((d[j].size for d in px if len(d)), 0)
            wy = next((d[j].size for d in py if len(d)), 0)
            w = min(wx, wy) if (wx and wy) else 0
            if w == 0:
                I.append(np.zeros((len(py), len(px))))
                continue
            A = self._level_matrix(py, j, w)
            B = self._level_matrix(px, j, w)
            I.append(min_intersection_gram(A, B).astype(np.float64))
        return I

    def _combine(self, I):
        """Closed form of the reference's progressive accumulation."""
        L = self.L
        if L == 0:
            return np.zeros_like(I[0]) if I else 0.0
        k = I[L - 1].copy()
        for p in range(L - 1):
            w = 1.0 / (2 ** (L - p - 1))
            k += w * ((L - p) * I[p] - (L - p - 1) * I[p + 1])
        return k

    # expanded-key width beyond which the sparse Gram assembles on host
    # (WL-PM generations mint ~1 unique key per item — >97% singleton
    # columns measured on ENZYMES h=5 — so the chunked device GEMM is
    # >99% padding FLOPs; a scipy CSR product is ~100x cheaper there)
    _SPARSE_HOST_MIN_W = 4096

    def _sparse_gram(self, px, py=None):
        """Fused all-level weighted counts-GEMM (see module docstring)."""
        sqrt_c = np.sqrt(self._level_coeffs())

        def weights(p, dtype=np.float32):
            return sqrt_c[(p["ekeys"] >> 60).astype(np.int64)].astype(
                dtype) if p["ekeys"].size else np.zeros(0, dtype)

        from ..ops.gram import active_mesh
        keys = np.unique(px["ekeys"])
        W = max(len(keys), 1)
        host = W >= self._SPARSE_HOST_MIN_W and active_mesh() is None
        if py is None:
            eids = np.searchsorted(keys, px["ekeys"])
            if host:
                import scipy.sparse as sp
                C = sp.csr_matrix(
                    (weights(px, np.float64), (px["gids"], eids)),
                    shape=(px["n"], W))
                return np.asarray((C @ C.T).toarray())
            valid = np.ones(eids.shape[0], bool)
            K = fetch_gram(coo_counts_gram(
                px["gids"], eids, weights(px), valid, px["n"], W))
            return np.asarray(K, np.float64)
        # rect: enumerate over the FIT side; unseen keys drop (exact —
        # min(a, 0) = 0, and this subsumes the reference's width
        # truncation)
        eids_x = np.searchsorted(keys, px["ekeys"])
        pos = np.searchsorted(keys, py["ekeys"])
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos_c] == py["ekeys"]) if len(keys) else \
            np.zeros(py["ekeys"].shape[0], bool)
        if host:
            import scipy.sparse as sp
            Cx = sp.csr_matrix(
                (weights(px, np.float64), (px["gids"], eids_x)),
                shape=(px["n"], W))
            wy = weights(py, np.float64)[hit]
            Cy = sp.csr_matrix(
                (wy, (py["gids"][hit], pos_c[hit])), shape=(py["n"], W))
            return np.asarray((Cy @ Cx.T).toarray())
        valid_x = np.ones(eids_x.shape[0], bool)
        K = fetch_gram(coo_counts_gram_rect(
            py["gids"], pos_c, weights(py), hit,
            px["gids"], eids_x, weights(px), valid_x,
            py["n"], px["n"], W))
        return np.asarray(K, np.float64)

    def _gram(self, px, py=None):
        if isinstance(px, dict) and px.get("sparse"):
            return self._sparse_gram(px, py)
        if py is None:
            py = px
        K = self._combined_gram(px, py)
        if K is not None:
            return K
        I = self._intersections(px, py)
        return self._combine(I)

    def _combined_gram(self, px, py):
        """Dense-path Gram with the level combination fused ON DEVICE.

        k = sum_p c_p I_p has dyadic-rational c_p; scaling by 2^(L-1)
        makes every weight an exact integer, so the combined matrix is
        integer-valued and fetches as compressed byte planes (ONE D2H
        instead of L full f32 Grams — the fetches were half the
        REDDIT-B Gram stage).  Returns None when a level's counts
        exceed the threshold-GEMM range (caller falls back to the
        per-level path)."""
        import jax.numpy as jnp
        from ..ops.intersect import _min_gram_gemm, _GEMM_MAX_T
        if self.L == 0:
            return np.zeros((len(py), len(px)))
        cs = self._level_coeffs()
        scale = float(2 ** max(self.L - 1, 0))
        Kacc = None
        for j in range(self.L):
            wx = next((d[j].size for d in px if len(d)), 0)
            wy = next((d[j].size for d in py if len(d)), 0)
            w = min(wx, wy) if (wx and wy) else 0
            cj = float(round(cs[j] * scale))
            if w == 0 or cj == 0.0:
                continue
            A = self._level_matrix(py, j, w)
            B = self._level_matrix(px, j, w)
            mx = max(float(A.max(initial=0.0)), float(B.max(initial=0.0)))
            if mx > _GEMM_MAX_T:
                return None
            T = max(1, 1 << (max(int(mx), 1) - 1).bit_length())
            Kj = _min_gram_gemm(jnp.asarray(A), jnp.asarray(B), T)
            Kacc = cj * Kj if Kacc is None else Kacc + cj * Kj
        if Kacc is None:
            return np.zeros((len(py), len(px)))
        return np.asarray(fetch_gram(Kacc), np.float64) / scale

    def _diag(self, parsed):
        if isinstance(parsed, dict) and parsed.get("sparse"):
            # self-intersection at every level is the full histogram
            # mass n * dims, so diag = mass * sum_p c_p in closed form
            return parsed["mass"] * float(self._level_coeffs().sum())
        vals = np.zeros(len(parsed))
        for i, du in enumerate(parsed):
            if len(du) == 0:
                continue
            I = [np.sum(du[j]) for j in range(self.L)]
            L = self.L
            k = I[L - 1]
            for p in range(L - 1):
                w = 1.0 / (2 ** (L - p - 1))
                k += w * ((L - p) * I[p] - (L - p - 1) * I[p + 1])
            vals[i] = k
        return vals
