"""Shortest-path kernels.

``ShortestPath`` — reference semantics (grakel/kernels/shortest_path.py:
413-500): per graph compute APSP; features count triplets
``(label_u, label_v, d(u, v))`` (labeled) or distances ``d(u, v)``
(unlabeled), skipping ``u == v`` and unreachable pairs; Gram is the dot
product of those count vectors, with transform-time features unseen at
fit contributing nothing (enum-extension semantics, :477-487).

TPU design: APSP = batched Floyd-Warshall over V-size-bucketed dense
batches (ops/floyd_warshall.py).  Two feature paths:

* **direct-index** (unit edge weights, the TU-dataset norm): distances
  are exact small integers, so the triplet id
  ``(l_u * L + l_v) * D + d`` is computed ON DEVICE — no per-pair
  stream ever crosses the device link (the id-compaction alternative
  moves ~9 bytes per vertex pair, ~150 MB at NCI1 scale).  All buckets
  concatenate into one chunked counts-GEMM; the integer Gram is fetched
  via lossless byte planes (ops/gram.fetch_gram).
* **hash-compaction fallback** (weighted graphs, or feature spaces past
  ``_DIRECT_MAX_WIDTH``): per-pair (distance-bits, label-pair) uint32
  hashes are compacted to dense ids by host np.unique (the on-device
  variadic sort is unstable/slow to compile at tens of millions of pairs) — exact float distance equality matches the reference's
  dict-key equality.

``ShortestPathAttr`` — reference computes an O(n^4) Python loop
(shortest_path.py:131-165).  Here each pair kernel is reformulated per
distinct distance value d:  k(x, y) = sum_d sum(M * (X_d @ M @ Y_d))
with M[i,k] = metric(attr_x_i, attr_y_k), X_d = [S_x == d],
Y_d = [S_y == d] — two MXU GEMMs per distance instead of a quadruple
loop (derivation: grouping index pairs by equal distance).
"""

from __future__ import annotations

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .base import Kernel, normalize_input
from ..batch import bucket_size
from ..ops.floyd_warshall import batched_floyd_warshall, INF
from ..ops.wl import host_compact, host_compact_counts, split_singletons
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag,
                        sparse_counts_gram,
                        fetch_gram, normalize_gram)

__all__ = ["ShortestPath", "ShortestPathAttr"]


def _size_buckets(graphs):
    """Group graph indices by padded vertex-count bucket (multiples of 8,
    the f32 sublane) — pair counts grow with V^2, so fine buckets cut the
    padded-pair volume ~2x vs power-of-two buckets at a bounded number of
    compiled shapes."""
    out = {}
    for i, g in enumerate(graphs):
        v = max(8, -(-g.n // 8) * 8)
        out.setdefault(v, []).append(i)
    return out


@jax.jit
def _triplet_hashes(S, labels, mask):
    """Per (u, v) pair: (h1, h2) uint32 feature keys + validity.

    h1 = bit pattern of the f32 distance, h2 = label pair (or 0 when the
    caller zeroed labels for the unlabeled variant).
    """
    V = S.shape[1]
    valid = (mask[:, :, None] & mask[:, None, :]
             & ~jnp.eye(V, dtype=bool)[None] & (S < INF / 2))
    h1 = jax.lax.bitcast_convert_type(S, jnp.uint32)
    lu = labels[:, :, None].astype(jnp.uint32)
    lv = labels[:, None, :].astype(jnp.uint32)
    h2 = lu * jnp.uint32(0x10001) + lv
    # zero invalid lanes: the (compressing) tunneled transport then
    # moves only the ~20-25% valid fraction of the padded pair grid
    h1 = jnp.where(valid, h1, jnp.uint32(0))
    h2 = jnp.where(valid, h2, jnp.uint32(0))
    return (h1.reshape(-1), h2.reshape(-1), valid.reshape(-1))


@jax.jit
def _fw_and_maxdist(adj, mask):
    """FW for one bucket + the bucket's max finite distance (to size the
    direct feature width by the OBSERVED distance range, not V)."""
    S = batched_floyd_warshall(adj, mask)
    V = S.shape[1]
    valid = (mask[:, :, None] & mask[:, None, :]
             & ~jnp.eye(V, dtype=bool)[None] & (S < INF / 2))
    dmax = jnp.max(jnp.where(valid, S, 0.0))
    return S, valid, dmax


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _sp_fused_gram(As, Ls, Ms, gidxs, n, L, D, n_chunks, chunk):
    """The whole symmetric direct path in ONE dispatch: per bucket
    Floyd-Warshall -> triplet ids -> chunked counts-GEMM accumulation
    into a single [n, n] Gram.  The bucket loop unrolls at trace time
    (one compiled program per bucket-shape set, persistently cached);
    no per-bucket host round trips remain — on a tunneled backend each
    dispatch costs ~26 ms and the old path paid 2 per bucket plus a
    blocking scalar fetch for the observed max distance."""
    from ..ops.gram import chunked_counts_gram_raw
    # ONE gram over the concatenated streams (cross-bucket products!)
    ids, gids, flat_valid = _fused_stream(As, Ls, Ms, gidxs, L, D)
    ones = jnp.ones(ids.shape[0], jnp.float32)
    return chunked_counts_gram_raw(gids, ids, ones, flat_valid, n,
                                   n_chunks, chunk)


def _fused_stream(As, Ls, Ms, gidxs, L, D):
    """Traceable: per-bucket FW -> flat (ids, gids, valid) streams,
    concatenated across buckets."""
    ids_l, gids_l, val_l = [], [], []
    for A, Lb, M, idxs in zip(As, Ls, Ms, gidxs):
        S = batched_floyd_warshall(A, M)
        V = S.shape[1]
        valid = (M[:, :, None] & M[:, None, :]
                 & ~jnp.eye(V, dtype=bool)[None] & (S < INF / 2))
        d = jnp.clip(S.astype(jnp.int32), 0, D - 1)
        lu = Lb[:, :, None].astype(jnp.int32)
        lv = Lb[:, None, :].astype(jnp.int32)
        ids_l.append(((lu * L + lv) * D + d).reshape(-1))
        gids_l.append(jnp.broadcast_to(
            idxs[:, None, None], (A.shape[0], V, V)).reshape(-1))
        val_l.append(valid.reshape(-1))
    return (jnp.concatenate(ids_l), jnp.concatenate(gids_l),
            jnp.concatenate(val_l))


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
def _sp_fused_rect(Ax, Ay, Lx, Ly, Mx, My, gx, gy,
                   nx, ny, L, D, W):
    """Transform-time direct path in ONE dispatch: FW + ids for BOTH
    sides, the rectangular counts-GEMM (rows = Y), and Y's diagonal."""
    from ..ops.gram import chunk_plan, _coo_gram_rect_impl, \
        _counts_diag_impl
    xi, xg, xv = _fused_stream(Ax, Lx, Mx, gx, L, D)
    yi, yg, yv = _fused_stream(Ay, Ly, My, gy, L, D)
    ones_x = jnp.ones(xi.shape[0], jnp.float32)
    ones_y = jnp.ones(yi.shape[0], jnp.float32)
    nc, ch = chunk_plan(W)
    K = _coo_gram_rect_impl(yg, yi, ones_y, yv, xg, xi, ones_x, xv,
                            ny, nx, nc, ch)
    ydiag = _counts_diag_impl(yg, yi, ones_y, yv, ny, nc, ch)
    return K, ydiag


@functools.partial(jax.jit, static_argnums=(4, 5))
def _direct_ids(S, labels, valid, gid_base, L, D):
    """Direct triplet ids for one bucket (unit-weight path).

    Returns flat (ids int32, gids int32, valid bool), each [nb * V * V].
    """
    V = S.shape[1]
    d = jnp.clip(S.astype(jnp.int32), 0, D - 1)
    lu = labels[:, :, None].astype(jnp.int32)
    lv = labels[:, None, :].astype(jnp.int32)
    ids = (lu * L + lv) * D + d
    gids = jnp.broadcast_to(gid_base[:, None, None],
                            (S.shape[0], V, V))
    return ids.reshape(-1), gids.reshape(-1), valid.reshape(-1)


# ---- streaming direct path (datasets too big to ship dense) --------- #
_SP_DENSIFY_JIT = {}


def _sp_densify(eflat, ew, S, V):
    """COO -> [S, V, V] on device; its own tiny jit so the heavy slab
    program below never keys its compile cache on the edge count."""
    fn = _SP_DENSIFY_JIT.get((S, V, eflat.size))
    if fn is None:
        fn = jax.jit(lambda f, w: jnp.zeros(
            (S * V * V,), jnp.float32).at[f].add(w).reshape(S, V, V))
        _SP_DENSIFY_JIT[(S, V, eflat.size)] = fn
    return fn(jnp.asarray(eflat), jnp.asarray(ew))


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(4,))
def _sp_slab_counts(A, Lb, M, gidx, C, L, D):
    """One slab of the streaming direct path: FW -> triplet ids ->
    per-graph counts accumulated into the device matrix
    C [n_graphs + 1, L*L*D] (the extra row parks invalid items).  The
    Gram follows as ONE feature GEMM after all slabs — counts are
    additive across slabs, so per-slab partial GEMMs (which would drop
    cross-slab products) never happen."""
    S = batched_floyd_warshall(A, M)
    V = S.shape[1]
    valid = (M[:, :, None] & M[:, None, :]
             & ~jnp.eye(V, dtype=bool)[None] & (S < INF / 2))
    ids, gids, val = _direct_ids(S, Lb, valid, gidx, L, D)
    width = L * L * D
    park = C.shape[0] - 1
    g = jnp.where(val, gids, park)
    # int32 suffices: callers guard (n_graphs + 1) * width < 2^31
    seg = g * jnp.int32(width) + jnp.where(val, ids, 0)
    upd = jax.ops.segment_sum(
        val.astype(jnp.float32), seg, num_segments=C.shape[0] * width)
    return C + upd.reshape(C.shape)


@jax.jit
def _gemm_sym_f32(C):
    return jnp.dot(C, C.T, preferred_element_type=jnp.float32)


@jax.jit
def _gemm_rect_f32(Cy, Cx):
    return jnp.dot(Cy, Cx.T, preferred_element_type=jnp.float32)


class ShortestPath(Kernel):
    """Labeled/unlabeled shortest-path kernel."""

    # direct-index feature-space cap: L^2 * D label-distance cells
    # (= 64 GEMM chunks of 4096); larger spaces use hash compaction
    _DIRECT_MAX_WIDTH = 1 << 18
    # total dense-bucket bytes past which parse keeps COO only and the
    # Gram streams slab-by-slab through _sp_slab_counts (REDDIT-M-12K's
    # dense buckets are ~13 GB host + a ~2.5-minute tunnel upload, and
    # were measured driving the host toward OOM via transfer staging)
    _STREAM_BYTES = 1 << 28
    # device bytes per densified slab in the streaming path
    _STREAM_SLAB_BYTES = 1 << 28
    # repeated-triplet-id count past which the symmetric Gram assembles
    # on host (sparse_counts_gram) instead of the chunked device GEMM
    _SPARSE_GRAM_MIN_REP = 1 << 16

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 algorithm_type="auto", with_labels=True):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        # algorithm_type accepted for reference API parity; the device
        # path always runs batched Floyd-Warshall.
        self.algorithm_type = algorithm_type
        self.with_labels = with_labels

    def __getstate__(self):
        # drop cached DEVICE count matrices (stream mode) — rebuilt
        # lazily after unpickling
        st = self.__dict__.copy()
        for attr in ("X", "_Y"):
            p = st.get(attr)
            if isinstance(p, dict) and p.get("counts"):
                p = dict(p)
                p["counts"] = {}
                st[attr] = p
        return st

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        """-> per-bucket dense host arrays + label metadata; all per-pair
        work stays on device inside ``_gram``/``_diag``."""
        graphs = normalize_input(X)
        if self._method_calling in (1, 2):
            self._enum = {}
        elif not hasattr(self, "_enum"):
            raise ValueError("fit before transform")
        from ..batch import enumerate_labels
        sizes = sorted(_size_buckets(graphs).items())
        total_dense = sum(len(idxs) * V * V * 4 for V, idxs in sizes)
        stream = total_dense > self._STREAM_BYTES
        if stream:
            # coarsen to power-of-two buckets: the fine multiple-of-8
            # granularity means ~75 distinct FW-program compiles at
            # REDDIT-M-12K (~30-60 s each over the tunnel); pow2 pays
            # ~2x padded FW compute for ~5 compiles total
            coarse = {}
            for V, idxs in sizes:
                Vp = max(8, 1 << (V - 1).bit_length())
                coarse.setdefault(Vp, []).extend(idxs)
            sizes = sorted(coarse.items())
        buckets = []
        unit = True
        for V, idxs in sizes:
            nb = len(idxs)
            A = None if stream else np.zeros((nb, V, V), dtype=np.float32)
            coo = [] if stream else None
            L = np.zeros((nb, V), dtype=np.int32)
            M = np.zeros((nb, V), dtype=bool)
            for bi, gi in enumerate(idxs):
                g = graphs[gi]
                if stream:
                    coo.append((g.senders, g.receivers, g.weights))
                    if unit and len(g.weights) and \
                            not np.all(g.weights == 1.0):
                        unit = False
                elif len(g.senders):
                    # COO scatter — never materializes the per-graph
                    # dense adjacency a second time
                    A[bi, g.senders, g.receivers] = g.weights
                M[bi, :g.n] = True
                if self.with_labels:
                    labs = g.get_labels(label_type="vertex",
                                        return_none=True)
                    if labs is None:
                        raise ValueError(
                            "ShortestPath with_labels=True requires "
                            "node-labeled graphs")
                    L[bi, :g.n] = enumerate_labels(
                        [labs[v] for v in range(g.n)], self._enum)
            if not stream and unit:
                w = A[A != 0]
                if w.size and not np.all(w == 1.0):
                    unit = False
            buckets.append((np.asarray(idxs, np.int32),
                            coo if stream else A, L, M))
        return {"n": len(graphs), "buckets": buckets, "unit": unit,
                "stream": stream, "counts": {},
                "max_V": max((b[3].shape[1] for b in buckets), default=1)}

    def fit(self, X, y=None):
        self._method_calling = 1
        self._is_transformed = False
        if hasattr(self, "_enum"):
            del self._enum
        self.initialize()
        self.X = self.parse_input(X)
        self._X_diag = None
        return self

    # ------------------------------------------------------------------ #
    def _direct_eligible(self, *parsed):
        """(eligible, L) — the distance range D is determined on device
        after FW (see ``_direct_stream``); eligibility is re-checked
        against the final width there via the pessimistic bound
        L^2 * max_V."""
        L = max(len(self._enum), 1) if self.with_labels else 1
        ok = all(p["unit"] for p in parsed)
        return ok, L

    def _fw_all(self, parsed):
        """Run FW for every bucket; returns ([(S, valid, idxs, Lb)...],
        max finite distance over all buckets)."""
        per = []
        dmax = 0.0
        for idxs, A, Lb, M in parsed["buckets"]:
            S, valid, dm = _fw_and_maxdist(jnp.asarray(A), jnp.asarray(M))
            per.append((S, valid, idxs, Lb))
            dmax = max(dmax, float(dm))
        return per, dmax

    @staticmethod
    def _direct_stream(fw_buckets, L, D):
        """Concatenated on-device (ids, gids, valid) over FW buckets."""
        ids_l, gids_l, val_l = [], [], []
        for S, valid, idxs, Lb in fw_buckets:
            i, g, v = _direct_ids(S, jnp.asarray(Lb), valid,
                                  jnp.asarray(idxs), L, D)
            ids_l.append(i)
            gids_l.append(g)
            val_l.append(v)
        if len(ids_l) == 1:
            return ids_l[0], gids_l[0], val_l[0]
        return (jnp.concatenate(ids_l), jnp.concatenate(gids_l),
                jnp.concatenate(val_l))

    def _hash_stream(self, parsed, gid_offset=0):
        """Fallback: flat host (h1, h2, gids, valid) arrays over all
        ordered vertex pairs (exact float distances as hash keys)."""
        h1s, h2s, gids, valids = [], [], [], []
        for idxs, A, Lb, M in parsed["buckets"]:
            V = A.shape[1]
            S = batched_floyd_warshall(jnp.asarray(A), jnp.asarray(M))
            h1, h2, valid = _triplet_hashes(
                S, jnp.asarray(Lb), jnp.asarray(M))
            h1s.append(np.asarray(h1))
            h2s.append(np.asarray(h2))
            valids.append(np.asarray(valid))
            gids.append(np.repeat(idxs + np.int32(gid_offset), V * V))
        return {
            "n": parsed["n"],
            "h1": np.concatenate(h1s),
            "h2": np.concatenate(h2s),
            "gids": np.concatenate(gids),
            "valid": np.concatenate(valids),
        }

    @staticmethod
    def _pad_stream(st):
        n_items = len(st["h1"])
        pad = bucket_size(max(n_items, 1))
        out = {}
        for k in ("h1", "h2"):
            a = np.zeros(pad, dtype=np.uint32)
            a[:n_items] = st[k]
            out[k] = a
        g = np.zeros(pad, dtype=np.int32)
        g[:n_items] = st["gids"]
        out["gids"] = g
        v = np.zeros(pad, dtype=bool)
        v[:n_items] = st["valid"]
        out["valid"] = v
        out["n"] = st["n"]
        return out

    # ------------------------------------------------------------------ #
    def _materialize(self, p):
        """Convert a stream-mode parse to dense buckets in place (the
        non-unit-weight / too-wide fallbacks need host dense arrays)."""
        if not p.get("stream"):
            return p
        warnings.warn("ShortestPath streaming fallback: materializing "
                      "dense buckets on host (weighted or very wide "
                      "label space at large scale)")
        buckets = []
        for idxs, coo, Lb, M in p["buckets"]:
            V = M.shape[1]
            A = np.zeros((len(idxs), V, V), np.float32)
            for bi, (s, r, w) in enumerate(coo):
                if len(s):
                    A[bi, s, r] = w
            buckets.append((idxs, A, Lb, M))
        p["buckets"] = buckets
        p["stream"] = False
        return p

    @staticmethod
    def _counts_ok(width, *ps):
        """True iff the int32 segment encoding g*width+id used by
        _sp_slab_counts cannot overflow for any involved parse."""
        n = max(p["n"] for p in ps)
        return (n + 1) * width <= (1 << 31) - 1

    def _dense_counts(self, p, L, D):
        """Counts matrix via the same slab program for a DENSE-mode
        parse (small side of a mixed rect transform)."""
        key = (L, D)
        C = p.setdefault("counts", {}).get(key)
        if C is not None:
            return C
        n = p["n"]
        width = L * L * D
        if (n + 1) * width > (1 << 31) - 1:
            # _sp_slab_counts segments with int32 g*width+id; callers
            # (_gram/_diag) route away from the counts path before this
            raise ValueError("SP counts feature space too wide")
        C = jnp.zeros((n + 1, width), jnp.float32)
        for idxs, A, Lb, M in p["buckets"]:
            V = M.shape[1]
            s_cap = int(max(8, min(512, self._STREAM_SLAB_BYTES
                                   // (V * V * 4))))
            for s0 in range(0, len(idxs), s_cap):
                sl = slice(s0, min(s0 + s_cap, len(idxs)))
                nb = sl.stop - s0
                S_pad = s_cap if len(idxs) > s_cap else \
                    max(8, 1 << (nb - 1).bit_length())
                A_s = np.zeros((S_pad, V, V), np.float32)
                A_s[:nb] = A[sl]
                Lb_s = np.zeros((S_pad, V), np.int32)
                Lb_s[:nb] = Lb[sl]
                M_s = np.zeros((S_pad, V), bool)
                M_s[:nb] = M[sl]
                gidx = np.zeros(S_pad, np.int32)
                gidx[:nb] = idxs[sl]
                C = _sp_slab_counts(jnp.asarray(A_s), jnp.asarray(Lb_s),
                                    jnp.asarray(M_s), jnp.asarray(gidx),
                                    C, L, D)
        p["counts"][key] = C
        return C

    def _stream_counts(self, p, L, D):
        """Device [n + 1, L*L*D] triplet-count matrix for a stream-mode
        parse, built slab by slab (bounded memory, COO-only uploads)."""
        key = (L, D)
        C = p["counts"].get(key)
        if C is not None:
            return C
        n = p["n"]
        width = L * L * D
        if (n + 1) * width > (1 << 31) - 1:
            # unreachable via _gram/_diag (they check _counts_ok first)
            raise ValueError("streaming SP feature space too wide")
        C = jnp.zeros((n + 1, width), jnp.float32)
        for idxs, coo, Lb, M in p["buckets"]:
            V = M.shape[1]
            s_cap = int(max(8, min(512, self._STREAM_SLAB_BYTES
                                   // (V * V * 4))))
            for s0 in range(0, len(idxs), s_cap):
                sl = slice(s0, min(s0 + s_cap, len(idxs)))
                nb = sl.stop - s0
                S_pad = s_cap if len(idxs) > s_cap else \
                    max(8, 1 << (nb - 1).bit_length())
                eflats, ews = [], []
                for bi in range(nb):
                    s, r, w = coo[s0 + bi]
                    eflats.append(bi * V * V + s.astype(np.int64) * V
                                  + r.astype(np.int64))
                    ews.append(np.asarray(w, np.float32))
                eflat = (np.concatenate(eflats) if eflats
                         else np.zeros(0, np.int64))
                ew = np.concatenate(ews) if ews else np.zeros(0,
                                                              np.float32)
                E_pad = max(8, 1 << (max(eflat.size, 1) - 1).bit_length())
                eflat = np.pad(eflat, (0, E_pad - eflat.size))
                ew = np.pad(ew, (0, E_pad - ew.size))  # zero-weight pads
                A = _sp_densify(eflat, ew, S_pad, V)
                Lb_s = np.zeros((S_pad, V), np.int32)
                Lb_s[:nb] = Lb[sl]
                M_s = np.zeros((S_pad, V), bool)
                M_s[:nb] = M[sl]
                gidx = np.zeros(S_pad, np.int32)
                gidx[:nb] = idxs[sl]
                C = _sp_slab_counts(A, jnp.asarray(Lb_s),
                                    jnp.asarray(M_s), jnp.asarray(gidx),
                                    C, L, D)
        p["counts"][key] = C
        return C

    # ------------------------------------------------------------------ #
    def _bfs_counts_coo(self, p, L, D):
        """Host COO triplet-count stream via the native batched-BFS
        engine (native/src/sp_bfs.cpp) — unit-weight graphs only; ids in
        the device encoding (lu*L+lv)*D+d.  Returns (gids, ids, counts)
        or None without the native library."""
        from ..native import sp_bfs_counts_native, have_native
        if not have_native():
            return None
        key = (L, D)
        cached = p.setdefault("bfs_coo", {}).get(key)
        if cached is not None:
            return cached
        n = p["n"]
        per = [None] * n
        for idxs, Ab, Lb, M in p["buckets"]:
            for bi, gi in enumerate(idxs):
                m = int(M[bi].sum())
                if p.get("stream"):
                    s, r, _w = Ab[bi]
                else:
                    s, r = np.nonzero(Ab[bi])
                per[int(gi)] = (m, s, r, Lb[bi, :m])
        node_off = np.zeros(n + 1, np.int64)
        node_off[1:] = np.cumsum([it[0] for it in per])
        N = int(node_off[-1])
        deg_off = np.zeros(N + 1, np.int64)
        adjs = []
        labs = np.zeros(N, np.int32)
        for gi, (m, s, r, lb) in enumerate(per):
            lo = int(node_off[gi])
            if m:
                labs[lo:lo + m] = lb
            cnt = np.bincount(np.asarray(s, np.int64), minlength=m)
            deg_off[lo + 1:lo + m + 1] = cnt
            order = np.argsort(s, kind="stable")
            adjs.append(np.asarray(r, np.int32)[order])
        adj_off = np.cumsum(deg_off)
        adj = (np.concatenate(adjs) if adjs else np.zeros(0, np.int32))
        out = sp_bfs_counts_native(node_off, adj_off, adj, labs, L, D)
        if out is not None:
            p["bfs_coo"][key] = out
        return out

    # observed-key width beyond which the BFS-count Gram assembles on
    # host: WL-SP generations mint ~1 key per reachable pair (hundreds
    # of millions on hub graphs) and shipping the padded stream to the
    # device both wastes >99.9% of the chunked GEMM and can exceed HBM
    _BFS_DEVICE_MAX_W = 1 << 20

    def _bfs_gram(self, px, py, L, D):
        """Symmetric/rect Gram from native BFS count streams with host
        key compaction (the sparse observed-key space replaces the
        full L*L*D width); None when the native engine is absent."""
        cx = self._bfs_counts_coo(px, L, D)
        if cx is None:
            return None
        gx, kx, wx = cx
        keys = np.unique(kx)
        W = max(len(keys), 1)
        host = W > self._BFS_DEVICE_MAX_W
        if py is None:
            ids = np.searchsorted(keys, kx)
            if host:
                K = sparse_counts_gram(gx, ids, px["n"],
                                       weights=wx.astype(np.float64))
                # drop the huge stream cache: WL-SP holds one fitted SP
                # kernel per generation, and ~7e8-item streams x 6
                # generations exhaust host memory.  transform recomputes
                # it lazily (one more BFS pass).
                px["bfs_coo"].clear()
                return K
            ones = np.ones(len(gx), bool)
            K = fetch_gram(coo_counts_gram(
                gx, ids.astype(np.int32), wx.astype(np.float32), ones,
                px["n"], W))
            return np.asarray(K)
        cy = self._bfs_counts_coo(py, L, D)
        if cy is None:
            return None
        gy, ky, wy = cy
        # fit-side key space; transform-only keys drop (no fit column)
        ids_x = np.searchsorted(keys, kx)
        pos = np.searchsorted(keys, ky)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos_c] == ky) if len(keys) else \
            np.zeros(len(ky), bool)
        self._Y_diag_cache = self._bfs_diag(py, L, D)
        if host:
            import scipy.sparse as sp
            Cx = sp.csr_matrix(
                (wx.astype(np.float64), (gx, ids_x)),
                shape=(px["n"], W))
            Cy = sp.csr_matrix(
                (wy[hit].astype(np.float64), (gy[hit], pos_c[hit])),
                shape=(py["n"], W))
            return np.asarray((Cy @ Cx.T).toarray())
        K = fetch_gram(coo_counts_gram_rect(
            gy, pos_c.astype(np.int32), wy.astype(np.float32), hit,
            gx, ids_x.astype(np.int32), wx.astype(np.float32),
            np.ones(len(gx), bool), py["n"], px["n"], W))
        return np.asarray(K)

    def _bfs_diag(self, p, L, D):
        c = self._bfs_counts_coo(p, L, D)
        if c is None:
            return None
        g, _k, w = c
        return np.bincount(g, weights=w.astype(np.float64) ** 2,
                           minlength=p["n"])[:p["n"]]

    # total vertex-pair slots below which the WHOLE Gram (FW, triplet
    # stream, counts-GEMM) runs on the XLA-CPU backend instead of the
    # accelerator: small cells are dominated by per-dispatch round
    # trips over the device link (~26 ms each), not compute — measured
    # WL-SP/PTC-MR 18.7 s device vs ~1 s XLA-CPU for the same programs
    _CPU_CELL_PAIRS = 1 << 21

    @staticmethod
    def _pair_slots(p):
        # b[3] is the [nb, V] vertex mask in both dense and stream
        # parses, so nb * V^2 counts padded pair slots uniformly
        return sum(len(b[0]) * b[3].shape[1] ** 2 for b in p["buckets"])

    def _small_cell(self, px, py=None):
        from ..ops.gram import active_mesh
        if active_mesh() is not None:
            # the caller asked for multi-device sharding; honor it
            return False
        work = self._pair_slots(px)
        if py is not None:
            work += self._pair_slots(py)
        return work <= self._CPU_CELL_PAIRS

    def _gram(self, px, py=None):
        if self._small_cell(px, py):
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return self._gram_impl(px, py)
        return self._gram_impl(px, py)

    def _gram_impl(self, px, py=None):
        from ..ops.gram import chunk_plan
        if px.get("stream") or (py is not None and py.get("stream")):
            ok, L = self._direct_eligible(
                *([px] if py is None else [px, py]))
            D = int(px["max_V"] if py is None
                    else max(px["max_V"], py["max_V"]))
            if ok:
                K = self._bfs_gram(px, py, L, D)
                if K is not None:
                    return K
            if (ok and L * L * D <= self._DIRECT_MAX_WIDTH
                    and self._counts_ok(L * L * D, px,
                                        *([] if py is None else [py]))):
                if py is None:
                    Cx = self._stream_counts(px, L, D)
                    K = _gemm_sym_f32(Cx[:px["n"]])
                    return fetch_gram(K)
                # rect: both sides as count matrices in the SAME (L, D)
                # encoding (unseen labels extend L, so fit-side counts
                # rebuild under the new key and are cached per (L, D))
                Cxx = (self._stream_counts(px, L, D) if px.get("stream")
                       else self._dense_counts(px, L, D))
                Cyy = (self._stream_counts(py, L, D) if py.get("stream")
                       else self._dense_counts(py, L, D))
                K = _gemm_rect_f32(Cyy[:py["n"]], Cxx[:px["n"]])
                return fetch_gram(K)
            # weighted or too-wide: fall back to the dense-bucket paths
            self._materialize(px)
            if py is not None:
                self._materialize(py)
        if py is None:
            ok, L = self._direct_eligible(px)
            if ok:
                # pessimistic distance bound: D <= max bucket V.  When
                # the implied width fits the cap, the WHOLE Gram runs in
                # one fused dispatch with no device->host sync; only
                # wider label spaces pay the observed-dmax round trip.
                D = px["max_V"]
                if L * L * D <= self._DIRECT_MAX_WIDTH:
                    As = tuple(jnp.asarray(b[1]) for b in px["buckets"])
                    Ls = tuple(jnp.asarray(b[2]) for b in px["buckets"])
                    Ms = tuple(jnp.asarray(b[3]) for b in px["buckets"])
                    gs = tuple(jnp.asarray(b[0]) for b in px["buckets"])
                    nc, ch = chunk_plan(bucket_size(L * L * D))
                    return fetch_gram(_sp_fused_gram(
                        As, Ls, Ms, gs, px["n"], L, D, nc, ch))
                fw, dmax = self._fw_all(px)
                D = int(dmax) + 1
                width = L * L * D
                ok = width <= self._DIRECT_MAX_WIDTH
            if ok:
                ids, gids, valid = self._direct_stream(fw, L, D)
                ones = jnp.ones(ids.shape[0], jnp.float32)
                return fetch_gram(coo_counts_gram(
                    gids, ids, ones, valid, px["n"], bucket_size(width)))
            st = self._pad_stream(self._hash_stream(px))
            ids, nu, counts = host_compact_counts(
                st["h1"], st["h2"], st["valid"])
            # triplets occurring once only touch the diagonal; GEMM over
            # the repeated ones (late WL-SP generations have millions of
            # mostly-singleton triplets — the full-width chunked gram
            # there is pathological)
            gl, gv, n_rep, dcorr = split_singletons(
                ids, counts, st["valid"], st["gids"], st["n"])
            if n_rep > self._SPARSE_GRAM_MIN_REP:
                # still-wide repeated-id space: the chunked device GEMM
                # is >99% padding FLOPs — host multiplicity-split
                # assembly instead (measured: WL-SP/NCI1 generations)
                K = sparse_counts_gram(st["gids"][gv], gl[gv], st["n"])
            else:
                Lw = bucket_size(max(n_rep, 1))
                ones = np.ones(len(st["gids"]), np.float32)
                K = fetch_gram(coo_counts_gram(
                    st["gids"], gl, ones, gv, st["n"], Lw))
            if dcorr.any():
                if not getattr(K.flags, "writeable", False):
                    K = np.array(K)
                n = st["n"]
                K[np.arange(n), np.arange(n)] += dcorr.astype(K.dtype)
            return K

        # transform: rows = Y graphs, cols = X (fit) graphs
        ok, L = self._direct_eligible(px, py)
        nx, ny = px["n"], py["n"]
        if ok:
            D = max(px["max_V"], py["max_V"])
            if L * L * D <= self._DIRECT_MAX_WIDTH:
                # fused one-dispatch rect path (static distance bound)
                def parts(p):
                    return (tuple(jnp.asarray(b[1]) for b in p["buckets"]),
                            tuple(jnp.asarray(b[2]) for b in p["buckets"]),
                            tuple(jnp.asarray(b[3]) for b in p["buckets"]),
                            tuple(jnp.asarray(b[0]) for b in p["buckets"]))
                Ax, Lx, Mx, gx = parts(px)
                Ay, Ly, My, gy = parts(py)
                K, ydiag = _sp_fused_rect(
                    Ax, Ay, Lx, Ly, Mx, My, gx, gy, nx, ny, L, D,
                    bucket_size(L * L * D))
                self._Y_diag_cache = np.asarray(ydiag)
                return fetch_gram(K)
            fwx, dmx = self._fw_all(px)
            fwy, dmy = self._fw_all(py)
            D = int(max(dmx, dmy)) + 1
            width = L * L * D
            ok = width <= self._DIRECT_MAX_WIDTH
        if ok:
            xi, xg, xv = self._direct_stream(fwx, L, D)
            yi, yg, yv = self._direct_stream(fwy, L, D)
            ones_x = jnp.ones(xi.shape[0], jnp.float32)
            ones_y = jnp.ones(yi.shape[0], jnp.float32)
            W = bucket_size(width)
            K = fetch_gram(coo_counts_gram_rect(
                yg, yi, ones_y, yv, xg, xi, ones_x, xv, ny, nx, W))
            self._Y_diag_cache = np.asarray(
                counts_diag(yg, yi, ones_y, yv, ny, W))
            return K
        # joint hash stream: consistent feature ids across X and Y
        sx = self._hash_stream(px)
        sy = self._hash_stream(py, gid_offset=nx)
        joint = {
            "n": nx + ny,
            "h1": np.concatenate([sx["h1"], sy["h1"]]),
            "h2": np.concatenate([sx["h2"], sy["h2"]]),
            "gids": np.concatenate([sx["gids"], sy["gids"]]),
            "valid": np.concatenate([sx["valid"], sy["valid"]]),
        }
        st = self._pad_stream(joint)
        ids, nu, counts = host_compact_counts(
            st["h1"], st["h2"], st["valid"])
        # singleton triplets appear on one side only: zero contribution
        # to the rectangular block; they re-enter the Y diagonal below
        gl, gv, n_rep, dcorr_joint = split_singletons(
            ids, counts, st["valid"], st["gids"], nx + ny)
        Lw = bucket_size(max(n_rep, 1))
        gids = st["gids"]
        is_y = gids >= nx
        vy = gv & is_y
        vx = gv & ~is_y
        gy = np.where(is_y, gids - nx, 0).astype(np.int32)
        gx = np.where(is_y, 0, gids).astype(np.int32)
        ones = np.ones(len(gids), np.float32)
        K = fetch_gram(coo_counts_gram_rect(
            gy, gl, ones, vy, gx, gl, ones, vx, ny, nx, Lw))
        self._Y_diag_cache = (np.asarray(counts_diag(
            gy, gl, ones, vy, ny, Lw), np.float64)
            + dcorr_joint[nx:nx + ny])
        return K

    def _diag(self, parsed):
        if (getattr(self, "_is_transformed", False)
                and parsed is getattr(self, "_Y", None)
                and hasattr(self, "_Y_diag_cache")):
            return self._Y_diag_cache
        if self._small_cell(parsed):
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return self._diag_impl(parsed)
        return self._diag_impl(parsed)

    def _diag_impl(self, parsed):
        if parsed.get("stream"):
            ok, L = self._direct_eligible(parsed)
            D = int(parsed["max_V"])
            if ok:
                d = self._bfs_diag(parsed, L, D)
                if d is not None:
                    return d
            if (ok and L * L * D <= self._DIRECT_MAX_WIDTH
                    and self._counts_ok(L * L * D, parsed)):
                # sum_f c^2 is encoding-invariant: any cached (L, D)
                # counts matrix gives the same diagonal
                cached = next(iter(parsed["counts"].values()), None)
                C = cached if cached is not None \
                    else self._stream_counts(parsed, L, D)
                n = parsed["n"]
                return np.asarray(jnp.sum(C[:n] * C[:n], axis=1))
            self._materialize(parsed)
        ok, L = self._direct_eligible(parsed)
        if ok:
            fw, dmax = self._fw_all(parsed)
            D = int(dmax) + 1
            width = L * L * D
            ok = width <= self._DIRECT_MAX_WIDTH
        if ok:
            ids, gids, valid = self._direct_stream(fw, L, D)
            ones = jnp.ones(ids.shape[0], jnp.float32)
            return np.asarray(counts_diag(
                gids, ids, ones, valid, parsed["n"], bucket_size(width)))
        st = self._pad_stream(self._hash_stream(parsed))
        ids, nu, counts = host_compact_counts(
            st["h1"], st["h2"], st["valid"])
        gl, gv, n_rep, dcorr = split_singletons(
            ids, counts, st["valid"], st["gids"], st["n"])
        Lw = bucket_size(max(n_rep, 1))
        ones = np.ones(len(st["gids"]), np.float32)
        return np.asarray(counts_diag(
            st["gids"], gl, ones, gv, st["n"], Lw),
            np.float64) + dcorr


class ShortestPathAttr(Kernel):
    """Attributed shortest-path kernel (reference
    shortest_path.py:131-165), reformulated as per-distance GEMMs."""

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 algorithm_type="auto", metric=np.dot):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.algorithm_type = algorithm_type
        self.metric = metric

    def parse_input(self, X):
        graphs = normalize_input(X)
        out = []
        for g in graphs:
            S, _ = g.build_shortest_path_matrix()
            labs = g.get_labels(label_type="vertex", return_none=True)
            if labs is None:
                raise ValueError("ShortestPathAttr requires node attributes")
            attrs = np.asarray([np.asarray(labs[v], dtype=np.float64)
                                for v in range(g.n)])
            out.append((S, attrs))
        return out

    def pairwise_operation(self, x, y):
        Sx, Ax = x
        Sy, Ay = y
        if self.metric is np.dot:
            M = Ax @ Ay.T
        else:
            M = np.asarray([[self.metric(a, b) for b in Ay] for a in Ax])
        dx = Sx[np.isfinite(Sx)]
        dy = Sy[np.isfinite(Sy)]
        common = np.intersect1d(np.unique(dx), np.unique(dy))
        total = 0.0
        for d in common:
            if d == 0:
                # u==v pairs excluded in the reference loop (i != j)
                Xd = (Sx == 0) & ~np.eye(Sx.shape[0], dtype=bool)
                Yd = (Sy == 0) & ~np.eye(Sy.shape[0], dtype=bool)
            else:
                Xd = Sx == d
                Yd = Sy == d
            if not Xd.any() or not Yd.any():
                continue
            total += float(np.sum(M * (Xd.astype(np.float64) @ M
                                       @ Yd.astype(np.float64))))
        return total
