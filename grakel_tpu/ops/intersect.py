"""Histogram-intersection Gram: K[i, j] = sum_l min(A[i, l], B[j, l]).

Used by NeighborhoodHash (label-multiset Jaccard numerator,
reference neighborhood_hash.py:534-573), WeisfeilerLehmanOptimalAssignment
(hierarchy-histogram intersection, reference
weisfeiler_lehman_optimal_assignment.py:270-288) and PyramidMatch levels.

min() has no MXU mapping, so this runs on the VPU as a pair-tiled
broadcast-min-reduce under jit: tiles of TI x TJ pairs at a time keep the
[TI, TJ, L] intermediate in registers/VMEM.  Label axis is chunked so L
can be large.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["min_intersection_gram", "min_intersection_gram_rounds",
           "jaccard_gram_rounds"]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _min_gram_impl(A, B, TI, TJ):
    n, L = A.shape
    m = B.shape[0]
    ni = n // TI
    nj = m // TJ

    def tile(ij, K):
        i = ij // nj
        j = ij % nj
        a = jax.lax.dynamic_slice(A, (i * TI, 0), (TI, L))
        b = jax.lax.dynamic_slice(B, (j * TJ, 0), (TJ, L))
        t = jnp.sum(jnp.minimum(a[:, None, :], b[None, :, :]), axis=-1)
        return jax.lax.dynamic_update_slice(K, t, (i * TI, j * TJ))

    K0 = jnp.zeros((n, m), jnp.float32)
    return jax.lax.fori_loop(0, ni * nj, tile, K0)


# ------------------------------------------------------------------ #
# Pallas TPU kernel: grid over (row-tile, col-tile, label-chunk) with a
# VMEM-resident [TI, TJ, TL] broadcast-min-reduce per step, accumulating
# into the revisited output tile.  Avoids any HBM-side [n, m, L]
# intermediate.
# ------------------------------------------------------------------ #

_TI, _TJ, _TL = 8, 128, 512


def _min_gram_kernel(a_ref, b_ref, out_ref):
    from jax.experimental import pallas as pl

    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:]                    # [TI, TL]
    b = b_ref[:]                    # [TJ, TL]
    m = jnp.minimum(a[:, None, :], b[None, :, :])   # [TI, TJ, TL] in VMEM
    out_ref[:] += jnp.sum(m, axis=-1)


def _pallas_min_gram(A, B, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, L = A.shape
    m = B.shape[0]
    grid = (n // _TI, m // _TJ, L // _TL)
    return pl.pallas_call(
        _min_gram_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TI, _TL), lambda i, j, l: (i, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TJ, _TL), lambda i, j, l: (j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TI, _TJ), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, B)


@functools.partial(jax.jit, static_argnums=(2,))
def _min_gram_pallas(A, B, interpret):
    return _pallas_min_gram(A, B, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _min_gram_rounds_impl(A, B, use_pallas, interpret, TI, TJ):
    """[R, n, L] x [R, m, L] -> [R, n, m], the R kernels in ONE
    dispatch (the static round loop unrolls at trace time)."""
    outs = []
    for r in range(A.shape[0]):
        if use_pallas:
            outs.append(_pallas_min_gram(A[r], B[r], interpret))
        else:
            outs.append(_min_gram_impl(A[r], B[r], TI, TJ))
    return jnp.stack(outs)


def _pad_to(x, rows, cols):
    r, c = x.shape
    if r != rows or c != cols:
        x = jnp.pad(x, ((0, rows - r), (0, cols - c)))
    return x


def min_intersection_gram_rounds(A, B=None, tile=64, force_pallas=None):
    """Stacked variant: A [R, n, L], B [R, m, L] -> DEVICE array
    [R, n, m] of per-round intersection counts, computed in one
    dispatch.  Callers fetch it themselves — for integer-valued
    histograms (NeighborhoodHash) that means lossless byte planes
    (ops/gram.fetch_gram) instead of R full f32 Gram transfers."""
    A = jnp.asarray(np.asarray(A), jnp.float32)
    B = A if B is None else jnp.asarray(np.asarray(B), jnp.float32)
    R, n, L = A.shape
    m = B.shape[1]
    backend = jax.default_backend()
    use_pallas = (backend not in ("cpu",)) if force_pallas is None \
        else force_pallas
    if use_pallas:
        Lp = -(-L // _TL) * _TL
        npad = -(-n // _TI) * _TI
        mpad = -(-m // _TJ) * _TJ
        TI = TJ = 0
    else:
        TI = min(tile, max(8, n))
        TJ = min(tile, max(8, m))
        npad = -(-n // TI) * TI
        mpad = -(-m // TJ) * TJ
        Lp = L
    if (npad, Lp) != (n, L):
        A = jnp.pad(A, ((0, 0), (0, npad - n), (0, Lp - L)))
    if (mpad, Lp) != (m, L):
        B = jnp.pad(B, ((0, 0), (0, mpad - m), (0, Lp - L)))
    # return the PADDED device array (pad rows/cols are zeros): slicing
    # here would queue another device op, and callers want to fetch the
    # whole stack in one (byte-plane) transfer and slice on host
    return _min_gram_rounds_impl(A, B, use_pallas, backend == "cpu",
                                 TI, TJ)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _jaccard_rounds_impl(A, B, va, vb, symmetrize, T):
    """K = mean_r where(denom > 0, c_r / denom, 0) with
    denom = va[:,None] + vb[None,:] - c_r, entirely on device.

    The min-intersection uses the threshold-indicator identity
    ``sum_l min(a_l, b_l) = sum_{t=1..T} sum_l [a_l>=t][b_l>=t]`` so
    each term is ONE MXU GEMM of 0/1 bf16 indicator matrices (exact in
    f32 accumulation).  This keeps the hot loop on the systolic array
    and — unlike a Pallas kernel — compiles in seconds on a tunneled
    backend (measured: ~80 s per Pallas program compile vs ~2 s here).
    ``T`` is the (bucketed) max histogram entry.
    """
    R = A.shape[0]
    n, m = A.shape[1], B.shape[1]
    acc = jnp.zeros((n, m), jnp.float32)
    for r in range(R):
        a, b = A[r], B[r]

        def term(t, c):
            at = (a >= t).astype(jnp.bfloat16)
            bt = (b >= t).astype(jnp.bfloat16)
            return c + jnp.dot(at, bt.T,
                               preferred_element_type=jnp.float32)

        c = jax.lax.fori_loop(1, T + 1, term,
                              jnp.zeros((n, m), jnp.float32))
        denom = va[:, None] + vb[None, :] - c
        acc = acc + jnp.where(denom > 0, c / denom, 0.0)
    acc = acc / R
    if symmetrize:
        acc = (acc + acc.T) * 0.5
    return acc


def jaccard_gram_rounds(A, B=None, va=None, vb=None, symmetrize=None,
                        max_count=None):
    """Multiset-Jaccard Gram averaged over rounds (the NeighborhoodHash
    comparison, reference neighborhood_hash.py:534-573):

    ``K[i, j] = mean_r c_r[i, j] / (va[i] + vb[j] - c_r[i, j])`` with
    ``c_r = sum_l min(A[r, i, l], B[r, j, l])`` and 0/0 (empty graph)
    mapped to 0.

    A: [R, n, L] per-round integer histograms, va: [n] vertex counts
    (likewise B [R, m, L] / vb [m]; both default to the A side).  Runs
    as ONE jit on the default backend — the per-round threshold-GEMM
    min-intersections (see :func:`_jaccard_rounds_impl`), the division,
    the round mean and the symmetrization all fuse, so a single [n, m]
    f32 leaves the device instead of an [R, n, m] count stack (the NH
    bottleneck on a tunneled backend).  ``max_count`` (the largest
    histogram entry) is computed on host when not given and bucketed to
    a power of two to bound recompilation.  Returns the PADDED device
    array; callers slice ``[:n, :m]`` after fetching.
    """
    same = B is None or B is A        # avoid uploading one array twice
    sym = same if symmetrize is None else symmetrize
    A_host = np.asarray(A)
    B_host = A_host if same else np.asarray(B)
    if max_count is None:
        max_count = max(float(A_host.max(initial=0.0)),
                        float(B_host.max(initial=0.0)))
    T = max(1, 1 << (max(int(max_count), 1) - 1).bit_length())
    A = jnp.asarray(A_host, jnp.float32)
    B = A if same else jnp.asarray(B_host, jnp.float32)
    R, n, L = A.shape
    m = B.shape[1]
    va = (jnp.full(n, 1.0, jnp.float32) if va is None
          else jnp.asarray(np.asarray(va), jnp.float32))
    if vb is va or (vb is None and same):
        vb = va
    else:
        vb = (jnp.full(m, 1.0, jnp.float32) if vb is None
              else jnp.asarray(np.asarray(vb), jnp.float32))
    Lp = -(-L // 128) * 128
    npad = -(-n // 8) * 8
    mpad = -(-m // 128) * 128
    if sym:   # symmetrization needs square pads
        npad = mpad = max(-(-n // 128) * 128, mpad)
    if (npad, Lp) != (n, L):
        A = jnp.pad(A, ((0, 0), (0, npad - n), (0, Lp - L)))
    if (mpad, Lp) != (m, L):
        B = jnp.pad(B, ((0, 0), (0, mpad - m), (0, Lp - L)))
    if npad != n:
        va = jnp.pad(va, (0, npad - n))
    if mpad != m:
        vb = jnp.pad(vb, (0, mpad - m))
    return _jaccard_rounds_impl(A, B, va, vb, sym, T)


@functools.partial(jax.jit, static_argnums=(2,))
def _min_gram_gemm(A, B, T):
    """Threshold-indicator decomposition on the MXU:
    ``sum_l min(a_l, b_l) = sum_{t=1..T} <[a>=t], [b>=t]>`` — exact for
    integer histograms (0/1 bf16 operands, f32 accumulation), and the
    whole program is T fused GEMMs that XLA compiles in seconds where a
    Pallas kernel costs ~80 s per program on a tunneled backend."""
    def term(t, c):
        at = (A >= t).astype(jnp.bfloat16)
        bt = (B >= t).astype(jnp.bfloat16)
        return c + jnp.dot(at, bt.T, preferred_element_type=jnp.float32)

    K0 = jnp.zeros((A.shape[0], B.shape[0]), jnp.float32)
    return jax.lax.fori_loop(1, T + 1, term, K0)


# integer histograms with max entry up to this take the GEMM path
_GEMM_MAX_T = 2048


def min_intersection_gram(A, B=None, tile=64, force_pallas=None):
    """K[i, j] = sum_l min(A[i, l], B[j, l]); B defaults to A.

    A: [n, L], B: [m, L] (numpy or jax).  Integer-valued inputs (every
    histogram-intersection caller: WL-OA hierarchy histograms,
    PyramidMatch cell counts, NH label multisets) run as threshold-
    indicator GEMMs on the MXU (:func:`_min_gram_gemm`).  Real-valued
    inputs fall back to the broadcast-min path: the Pallas kernel on
    TPU backends, jnp dynamic-slice tiling elsewhere.
    ``force_pallas=True`` runs the Pallas kernel in interpreter mode on
    non-TPU backends (tests); ``force_pallas=False`` forces the tiling.
    """
    A_host = np.asarray(A)
    B_host = A_host if B is None else np.asarray(B)
    if force_pallas is None and A_host.size and B_host.size:
        mx = max(float(A_host.max(initial=0.0)),
                 float(B_host.max(initial=0.0)))
        if (0.0 <= mx <= _GEMM_MAX_T
                and float(A_host.min(initial=0.0)) >= 0.0
                and float(B_host.min(initial=0.0)) >= 0.0
                and not np.any(A_host != np.floor(A_host))
                and not np.any(B_host != np.floor(B_host))):
            T = max(1, 1 << (max(int(mx), 1) - 1).bit_length())
            Af = jnp.asarray(A_host, jnp.float32)
            Bf = Af if B_host is A_host else jnp.asarray(B_host,
                                                        jnp.float32)
            return np.asarray(_min_gram_gemm(Af, Bf, T))
    A = jnp.asarray(A_host, jnp.float32)
    B = A if B_host is A_host else jnp.asarray(B_host, jnp.float32)
    n, m = A.shape[0], B.shape[0]
    backend = jax.default_backend()
    use_pallas = (backend not in ("cpu",)) if force_pallas is None \
        else force_pallas
    if use_pallas:
        L = A.shape[1]
        Lp = -(-L // _TL) * _TL
        npad = -(-n // _TI) * _TI
        mpad = -(-m // _TJ) * _TJ
        K = _min_gram_pallas(_pad_to(A, npad, Lp), _pad_to(B, mpad, Lp),
                             backend == "cpu")
        return np.asarray(K[:n, :m])
    TI = min(tile, max(8, n))
    TJ = min(tile, max(8, m))
    npad = -(-n // TI) * TI
    mpad = -(-m // TJ) * TJ
    if npad != n:
        A = jnp.pad(A, ((0, npad - n), (0, 0)))
    if mpad != m:
        B = jnp.pad(B, ((0, mpad - m), (0, 0)))
    K = _min_gram_impl(A, B, TI, TJ)
    return np.asarray(K[:n, :m])
