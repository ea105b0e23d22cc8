"""Gram-matrix assembly ops.

Every feature-map ("F-style") kernel in the reference reduces to
"feature extraction -> Phi @ Phi^T" (e.g. vertex_histogram.py:179-187).
Here that product is a single (or chunked) MXU GEMM.  The histogram
kernels never materialize a dense [n_graphs, n_labels] matrix when the
label universe is large: `coo_counts_gram` streams label-chunks through
a densify -> GEMM-accumulate loop under jit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["gram_gemm", "gram_rect", "normalize_gram",
           "coo_counts_gram", "coo_counts_gram_rect", "coo_counts_gram_acc",
           "counts_diag", "chunked_counts_gram_raw", "chunk_plan",
           "fetch_gram", "cpu_gemm", "sparse_counts_gram",
           "use_mesh", "active_mesh"]


# --------------------------------------------------------------------- #
# active device mesh: every counts-GEMM below reroutes through the
# ring-sharded programs in grakel_tpu.parallel while a mesh is active.
# This is THE multi-device entry point for kernel frontends: the base
# Kernel wraps fit_transform/transform in use_mesh(self.mesh), so every
# F-style kernel (histograms, SP, WL, WL-OA, PM, PK, ODD, NSPD, ...)
# funnels its Gram through the mesh without kernel-specific wiring —
# the distributed analog of the reference applying its one parallelism
# to all kernels in the base class (reference kernel.py:236-246).
# --------------------------------------------------------------------- #

_MESH = None


class _MeshCtx:
    def __init__(self, mesh, prev):
        self.mesh = mesh
        self.prev = prev

    def __enter__(self):
        return self.mesh

    def __exit__(self, *exc):
        global _MESH
        _MESH = self.prev
        return False


def use_mesh(mesh):
    """Context manager: route eligible Gram assembly over ``mesh``
    (a 1-D ``jax.sharding.Mesh``; None/1-device meshes are no-ops).
    Plain module state, deliberately not thread-local: framework base
    kernels dispatched on worker threads (parallel_sum) inherit the
    outer kernel's mesh."""
    global _MESH
    ctx = _MeshCtx(mesh, _MESH)
    _MESH = mesh if (mesh is not None and mesh.size > 1) else None
    return ctx


def active_mesh():
    """The mesh installed by :func:`use_mesh`, or None."""
    return _MESH


def _as_f32(x):
    if hasattr(x, "toarray"):  # scipy sparse
        x = x.toarray()
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


@jax.jit
def _gemm_sym(phi):
    return jnp.dot(phi, phi.T, preferred_element_type=jnp.float32)


@jax.jit
def _gemm_rect(a, b):
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def _needs_f64(x):
    """float64 feature matrices keep full precision through the GEMM:
    GraphHopper weight features on attributed data produce Gram entries
    ~1e8+ where an f32 product yields small negative eigenvalues (PSD
    violation).  The float64 feature kernels (GraphHopper, LovaszTheta,
    SvmTheta) all have narrow feature widths, so the host f64 GEMM is
    cheap; count/histogram features arrive as f32/int and stay on the
    device path."""
    return (isinstance(x, np.ndarray) and x.dtype == np.float64
            and x.size > 0)


def gram_gemm(phi):
    """K = Phi @ Phi^T (symmetric Gram); ring-sharded over the active
    mesh when one is installed (f32 path only — the f64 feature kernels
    are host-bound by design)."""
    if _needs_f64(phi):
        return phi @ phi.T
    a = _as_f32(phi)
    mesh = active_mesh()
    if mesh is not None:
        from ..parallel.gram import ring_gram
        axis = mesh.axis_names[0]
        P = mesh.shape[axis]
        n = a.shape[0]
        rows = -(-n // P)
        pad = P * rows - n
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        K = ring_gram(mesh, a, axis_name=axis)
        return np.asarray(K)[:n, :n]
    return np.asarray(_gemm_sym(a))


def gram_rect(phi_rows, phi_cols):
    """K[i, j] = <phi_rows[i], phi_cols[j]>, truncating/padding the row
    features to the column feature width (transform semantics: columns =
    fit graphs; features unseen at fit contribute nothing, reference
    vertex_histogram.py:182-187)."""
    if _needs_f64(phi_rows) or _needs_f64(phi_cols):
        def dense64(x):
            if hasattr(x, "toarray"):  # scipy sparse
                x = x.toarray()
            return np.asarray(x, np.float64)
        a = dense64(phi_rows)
        b = dense64(phi_cols)
        d = b.shape[1]
        if a.shape[1] > d:
            a = a[:, :d]
        elif a.shape[1] < d:
            a = np.pad(a, ((0, 0), (0, d - a.shape[1])))
        return a @ b.T
    a = _as_f32(phi_rows)
    b = _as_f32(phi_cols)
    d = b.shape[1]
    if a.shape[1] > d:
        a = a[:, :d]
    elif a.shape[1] < d:
        a = jnp.pad(a, ((0, 0), (0, d - a.shape[1])))
    mesh = active_mesh()
    if mesh is not None:
        from ..parallel.gram import ring_rect_gram
        axis = mesh.axis_names[0]
        P = mesh.shape[axis]
        ny, nx = a.shape[0], b.shape[0]
        ry, rx = -(-ny // P), -(-nx // P)
        if P * ry - ny:
            a = jnp.pad(a, ((0, P * ry - ny), (0, 0)))
        if P * rx - nx:
            b = jnp.pad(b, ((0, P * rx - nx), (0, 0)))
        K = ring_rect_gram(mesh, a, b, axis_name=axis)
        return np.asarray(K)[:ny, :nx]
    return np.asarray(_gemm_rect(a, b))


_CPU_GEMM = {}


def cpu_gemm(a, b=None):
    """``a @ a.T`` (or ``a @ b.T``) on the XLA **CPU** backend, returned
    as numpy.  ~30x the installed BLAS on constrained hosts, and keeps
    small host-side Gram assembly off the (possibly tunneled) device
    link.  Jitted once per process per arity."""
    key = "sym" if b is None else "rect"
    fn = _CPU_GEMM.get(key)
    if fn is None:
        # local_devices: under jax.distributed, jax.devices() is the
        # GLOBAL list and device 0 may belong to another process
        cpu = jax.local_devices(backend="cpu")[0]
        # placement comes from device_put below (committed inputs pin the
        # computation); jit's `device=` argument is deprecated
        if b is None:
            base = jax.jit(lambda x: jnp.dot(
                x, x.T, preferred_element_type=jnp.float32))
        else:
            base = jax.jit(lambda x, y: jnp.dot(
                x, y.T, preferred_element_type=jnp.float32))
        _CPU_GEMM[key] = fn = (base, cpu)
    base, cpu = fn
    if b is None:
        out = base(jax.device_put(np.asarray(a, np.float32), cpu))
    else:
        out = base(jax.device_put(np.asarray(a, np.float32), cpu),
                   jax.device_put(np.asarray(b, np.float32), cpu))
    return np.array(out)


@jax.jit
def _byte_planes(K):
    """(3 u8 byte planes of uint32(K), #planes needed, packable?).

    ``packable`` is true iff every entry is an exact non-negative
    integer < 2^24 (the f32 exact-integer range) — then
    ``p0 + 256*p1 + 65536*p2`` reconstructs K losslessly.  ``nplanes``
    is 2 when max < 2^16 (plane 2 all-zero) else 3.
    """
    ok = jnp.all((K >= 0) & (K < 16777216.0)
                 & (K == jnp.round(K)))
    u = K.astype(jnp.uint32)
    nplanes = jnp.where(jnp.max(u) < (1 << 16), 2, 3)
    return ((u & 0xFF).astype(jnp.uint8),
            ((u >> 8) & 0xFF).astype(jnp.uint8),
            ((u >> 16) & 0xFF).astype(jnp.uint8),
            nplanes, ok)


def fetch_gram(Kd, min_elems=1 << 21):
    """Device->host fetch of a Gram matrix with the cheapest lossless
    encoding.

    The tunneled TPU backend moves ~20-45 MB/s and compresses, so for
    large integer-valued count Grams (every unweighted F-style kernel)
    uint8 byte planes beat one f32 fetch ~2x: the high planes are
    low-entropy and compress away in transit.  Small matrices skip the
    extra dispatch round trips and fetch directly.  Non-integer or
    >= 2^24 values fall back to the plain f32 fetch (checked on device).
    """
    if (getattr(Kd, "size", 0) < min_elems
            or getattr(Kd, "dtype", None) != jnp.float32):
        return np.asarray(Kd)
    p0, p1, p2, nplanes, ok = _byte_planes(Kd)
    if not bool(ok):
        return np.asarray(Kd)
    out = np.asarray(p0).astype(np.float32)
    out += np.asarray(p1).astype(np.float32) * np.float32(256.0)
    if int(nplanes) > 2:
        out += np.asarray(p2).astype(np.float32) * np.float32(65536.0)
    return out


def normalize_gram(K, diag_rows, diag_cols):
    """K / sqrt(outer(diag_rows, diag_cols)) with nan guard
    (reference kernel.py:166-168, weisfeiler_lehman.py:300-305)."""
    K = np.asarray(K, dtype=np.float64)
    dr = np.asarray(diag_rows, dtype=np.float64)
    dc = np.asarray(diag_cols, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = K / np.sqrt(np.outer(dr, dc))
    return np.nan_to_num(out)


# --------------------------------------------------------------------- #
# chunked COO-count Gram: K[g, g'] = sum_l c[g, l] * c[g', l]
# --------------------------------------------------------------------- #

def chunked_counts_gram_raw(gids, labels, weights, valid, n_graphs,
                            n_chunks, chunk, K0=None):
    """Traceable symmetric counts-Gram accumulation (callable inside
    other jitted programs).  Labels are processed in `n_chunks` static
    chunks of width `chunk`; each chunk densifies counts to
    [n_graphs, chunk] via segment_sum and accumulates one GEMM.  Items
    with valid=False or label out of the current chunk contribute
    nothing.  ``K0`` is the starting accumulator (zeros if None)."""
    gids = jnp.where(valid, gids, n_graphs)  # park invalid in pad row

    def body(c, K):
        lo = c * chunk
        rel = labels - lo
        in_chunk = valid & (rel >= 0) & (rel < chunk)
        g = jnp.where(in_chunk, gids, n_graphs)
        r = jnp.where(in_chunk, rel, 0)
        seg = g * chunk + r
        counts = jax.ops.segment_sum(
            jnp.where(in_chunk, weights, 0.0), seg,
            num_segments=(n_graphs + 1) * chunk)
        counts = counts.reshape(n_graphs + 1, chunk)[:n_graphs]
        return K + jnp.dot(counts, counts.T,
                           preferred_element_type=jnp.float32)

    if K0 is None:
        K0 = jnp.zeros((n_graphs, n_graphs), dtype=jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, K0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _coo_gram_impl(gids, labels, weights, valid, n_graphs, n_chunks, chunk):
    return chunked_counts_gram_raw(gids, labels, weights, valid,
                                   n_graphs, n_chunks, chunk)


@functools.partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(7,))
def _coo_gram_acc_impl(gids, labels, weights, valid, n_graphs, n_chunks,
                       chunk, K0):
    return chunked_counts_gram_raw(gids, labels, weights, valid,
                                   n_graphs, n_chunks, chunk, K0=K0)


def coo_counts_gram_acc(gids, labels, weights, valid, n_graphs, n_labels,
                        K0, chunk=4096):
    """Like :func:`coo_counts_gram` but accumulates INTO device array
    ``K0`` (donated) — callers summing Grams across WL generations keep
    the accumulator on device and fetch once at the end."""
    chunk = min(chunk, max(128, 1 << (int(n_labels) - 1).bit_length()))
    nc = _chunks_for(n_labels, chunk)
    return _coo_gram_acc_impl(jnp.asarray(gids), jnp.asarray(labels),
                              jnp.asarray(weights, dtype=jnp.float32),
                              jnp.asarray(valid), int(n_graphs), nc,
                              chunk, K0)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def _coo_gram_rect_impl(gids_a, labels_a, weights_a, valid_a,
                        gids_b, labels_b, weights_b, valid_b,
                        n_a, n_b, n_chunks, chunk):
    def densify(gids, labels, weights, valid, n, lo):
        rel = labels - lo
        in_chunk = valid & (rel >= 0) & (rel < chunk)
        g = jnp.where(in_chunk, gids, n)
        r = jnp.where(in_chunk, rel, 0)
        seg = g * chunk + r
        counts = jax.ops.segment_sum(
            jnp.where(in_chunk, weights, 0.0), seg,
            num_segments=(n + 1) * chunk)
        return counts.reshape(n + 1, chunk)[:n]

    def body(c, K):
        lo = c * chunk
        ca = densify(gids_a, labels_a, weights_a, valid_a, n_a, lo)
        cb = densify(gids_b, labels_b, weights_b, valid_b, n_b, lo)
        return K + jnp.dot(ca, cb.T, preferred_element_type=jnp.float32)

    K0 = jnp.zeros((n_a, n_b), dtype=jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, K0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _counts_diag_impl(gids, labels, weights, valid, n_graphs, n_chunks, chunk):
    def body(c, d):
        lo = c * chunk
        rel = labels - lo
        in_chunk = valid & (rel >= 0) & (rel < chunk)
        g = jnp.where(in_chunk, gids, n_graphs)
        r = jnp.where(in_chunk, rel, 0)
        seg = g * chunk + r
        counts = jax.ops.segment_sum(
            jnp.where(in_chunk, weights, 0.0), seg,
            num_segments=(n_graphs + 1) * chunk)
        counts = counts.reshape(n_graphs + 1, chunk)[:n_graphs]
        return d + jnp.sum(counts * counts, axis=1)

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros(n_graphs, jnp.float32))


def _chunks_for(n_labels, chunk):
    return max(1, -(-int(n_labels) // chunk))


def chunk_plan(n_labels, chunk=4096):
    """(n_chunks, chunk_width) used by the chunked counts-Grams."""
    chunk = min(chunk, max(128, 1 << (int(n_labels) - 1).bit_length()))
    return _chunks_for(n_labels, chunk), chunk


def _signed_labels(labels):
    labels = np.asarray(labels)
    if labels.dtype.kind == "u":
        labels = labels.astype(np.int64)
    return labels


def _put_items(mesh, axis, items):
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec(axis, None))
    return tuple(jax.device_put(a, sh) for a in items)


def _mesh_counts_gram(mesh, gids, labels, weights, valid, n_graphs,
                      n_labels, chunk):
    from ..parallel.gram import shard_batch, sharded_counts_gram
    axis = mesh.axis_names[0]
    P = mesh.shape[axis]
    lg, lb, lw, lv, rows = shard_batch(
        np.asarray(gids), _signed_labels(labels), np.asarray(weights),
        np.asarray(valid), int(n_graphs), P)
    items = _put_items(mesh, axis, (lg, lb, lw, lv))
    K = sharded_counts_gram(mesh, *items, rows, int(n_labels),
                            axis_name=axis, chunk=chunk)
    n = int(n_graphs)
    return K[:n, :n]


def _mesh_counts_gram_rect(mesh, ga, la, wa, va, gb, lb, wb, vb,
                           n_a, n_b, n_labels, chunk):
    from ..parallel.gram import shard_batch, sharded_counts_gram_rect
    axis = mesh.axis_names[0]
    P = mesh.shape[axis]
    *ya, rows_a = shard_batch(np.asarray(ga), _signed_labels(la),
                              np.asarray(wa), np.asarray(va),
                              int(n_a), P)
    *xb, rows_b = shard_batch(np.asarray(gb), _signed_labels(lb),
                              np.asarray(wb), np.asarray(vb),
                              int(n_b), P)
    K = sharded_counts_gram_rect(
        mesh, _put_items(mesh, axis, ya), _put_items(mesh, axis, xb),
        rows_a, rows_b, int(n_labels), axis_name=axis, chunk=chunk)
    return K[:int(n_a), :int(n_b)]


def coo_counts_gram(gids, labels, weights, valid, n_graphs, n_labels,
                    chunk=4096):
    """K[g,g'] = sum_l (sum_{i: gid=g, lab=l} w_i) * (same for g').

    Under an active :func:`use_mesh` mesh the Gram assembles as
    ring-tiled row blocks across the devices (parallel.gram)."""
    mesh = active_mesh()
    if mesh is not None:
        return _mesh_counts_gram(mesh, gids, labels, weights, valid,
                                 n_graphs, n_labels, chunk)
    chunk = min(chunk, max(128, 1 << (int(n_labels) - 1).bit_length()))
    nc = _chunks_for(n_labels, chunk)
    return _coo_gram_impl(jnp.asarray(gids), jnp.asarray(labels),
                          jnp.asarray(weights, dtype=jnp.float32),
                          jnp.asarray(valid), int(n_graphs), nc, chunk)


def coo_counts_gram_rect(ga, la, wa, va, gb, lb, wb, vb,
                         n_a, n_b, n_labels, chunk=4096):
    mesh = active_mesh()
    if mesh is not None:
        return _mesh_counts_gram_rect(mesh, ga, la, wa, va, gb, lb, wb,
                                      vb, n_a, n_b, n_labels, chunk)
    chunk = min(chunk, max(128, 1 << (int(n_labels) - 1).bit_length()))
    nc = _chunks_for(n_labels, chunk)
    return _coo_gram_rect_impl(
        jnp.asarray(ga), jnp.asarray(la),
        jnp.asarray(wa, dtype=jnp.float32), jnp.asarray(va),
        jnp.asarray(gb), jnp.asarray(lb),
        jnp.asarray(wb, dtype=jnp.float32), jnp.asarray(vb),
        int(n_a), int(n_b), nc, chunk)


def sparse_counts_gram(gids, labels, n_graphs, weights=None,
                       dense_col_mult=64):
    """K[g, g'] = sum_l c[g, l] c[g', l] assembled ON HOST for extremely
    sparse, very wide count matrices (late WL-SP generations mint
    millions of mostly-singleton triplet columns; the chunked device
    GEMM there is >99.9% wasted FLOPs and minutes of MXU time).

    The multiplicity-split scheme (same as NSPD's Gram,
    kernels/nspd.py fit_transform): after one label-major sort,

    * columns touching <= ``dense_col_mult`` graphs contribute their
      in-column pair products through ONE global bincount scatter
      (cost = sum over those columns of nnz_col^2);
    * denser columns gather into a single [n, n_hot] dense block
      multiplied on the XLA-CPU backend (:func:`cpu_gemm`).

    ``gids``/``labels`` are per-item arrays; duplicates are allowed and
    their weights (default 1) sum.  Returns float64 [n, n]."""
    gids = np.asarray(gids, np.int64)
    labels = np.asarray(labels, np.int64)
    n = int(n_graphs)
    K = np.zeros((n, n))
    if gids.size == 0:
        return K
    w = (np.ones(gids.size) if weights is None
         else np.asarray(weights, np.float64))
    key = labels * n + gids
    uk, inv = np.unique(key, return_inverse=True)
    cw = np.bincount(inv, weights=w)
    cols = uk // n
    rows = uk % n
    starts = np.flatnonzero(np.r_[True, cols[1:] != cols[:-1]])
    sizes = np.diff(np.r_[starts, len(cols)])
    singles = sizes == 1
    if singles.any():
        r1 = rows[starts[singles]]
        np.add.at(K, (r1, r1), cw[starts[singles]] ** 2)
    pair_idx, pair_w, pending = [], [], 0
    for s in np.unique(sizes):
        if s < 2 or s > dense_col_mult:
            continue
        gs = starts[sizes == s]
        idx = gs[:, None] + np.arange(s)
        R = rows[idx]
        W = cw[idx]
        flat = (R[:, :, None] * n + R[:, None, :]).ravel()
        pw = (W[:, :, None] * W[:, None, :]).ravel()
        pair_idx.append(flat)
        pair_w.append(pw)
        pending += flat.size
        if pending > 20_000_000:   # bound temporaries ACROSS groups
            K += np.bincount(np.concatenate(pair_idx),
                             weights=np.concatenate(pair_w),
                             minlength=n * n).reshape(n, n)
            pair_idx, pair_w, pending = [], [], 0
    if pair_idx:
        K += np.bincount(np.concatenate(pair_idx),
                         weights=np.concatenate(pair_w),
                         minlength=n * n).reshape(n, n)
    hot = sizes > dense_col_mult
    if hot.any():
        ent = np.repeat(hot, sizes)
        gcol = np.cumsum(hot) - 1
        D = np.zeros((n, int(hot.sum())), np.float32)
        D[rows[ent], np.repeat(gcol[hot], sizes[hot])] = cw[ent]
        K += cpu_gemm(D).astype(np.float64)
    return K


def counts_diag(gids, labels, weights, valid, n_graphs, n_labels,
                chunk=4096):
    """diag of coo_counts_gram without forming K."""
    chunk = min(chunk, max(128, 1 << (int(n_labels) - 1).bit_length()))
    nc = _chunks_for(n_labels, chunk)
    return _counts_diag_impl(jnp.asarray(gids), jnp.asarray(labels),
                             jnp.asarray(weights, dtype=jnp.float32),
                             jnp.asarray(valid), int(n_graphs), nc, chunk)
