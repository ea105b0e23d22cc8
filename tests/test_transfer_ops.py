"""Unit tests for the transfer/assembly ops behind the fast paths:
byte-plane Gram fetch, singleton splitting, host/device hash identity,
and the ShortestPath direct-index vs hash-fallback equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from grakel_tpu.ops.gram import fetch_gram, cpu_gemm
from grakel_tpu.ops import wl as wl_ops
from grakel_tpu.datasets import generate_dataset
from grakel_tpu.kernels import ShortestPath


def test_fetch_gram_two_planes_lossless():
    rng = np.random.default_rng(0)
    K = rng.integers(0, 65536, size=(2048, 1024)).astype(np.float32)
    out = fetch_gram(jnp.asarray(K))
    np.testing.assert_array_equal(out, K)


def test_fetch_gram_three_planes_lossless():
    rng = np.random.default_rng(1)
    K = rng.integers(0, 1 << 24, size=(2048, 1024)).astype(np.float32)
    out = fetch_gram(jnp.asarray(K))
    np.testing.assert_array_equal(out, K)


def test_fetch_gram_noninteger_falls_back():
    rng = np.random.default_rng(2)
    K = rng.random((2048, 1024)).astype(np.float32) * 10
    out = fetch_gram(jnp.asarray(K))
    np.testing.assert_array_equal(out, K)


def test_fetch_gram_small_matrix_passthrough():
    K = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(fetch_gram(jnp.asarray(K)), K)


def test_cpu_gemm_matches_numpy():
    rng = np.random.default_rng(3)
    a = rng.random((50, 7)).astype(np.float32)
    b = rng.random((20, 7)).astype(np.float32)
    np.testing.assert_allclose(cpu_gemm(a), a @ a.T, rtol=1e-5)
    np.testing.assert_allclose(cpu_gemm(a, b), a @ b.T, rtol=1e-5)


def test_split_singletons_reconstructs_gram():
    """Repeated-only GEMM + singleton diagonal == full counts Gram."""
    rng = np.random.default_rng(4)
    n_items, n_graphs = 500, 12
    ids = rng.integers(0, 300, n_items).astype(np.int32)
    gids = rng.integers(0, n_graphs, n_items).astype(np.int32)
    valid = rng.random(n_items) < 0.8
    uniq, inv, counts = np.unique(
        np.where(valid, ids, -1), return_inverse=True, return_counts=True)
    # full Gram on host for the oracle
    C = np.zeros((n_graphs, 300))
    np.add.at(C, (gids[valid], ids[valid]), 1.0)
    K_full = C @ C.T

    gl, gv, n_rep, diag = wl_ops.split_singletons(
        inv.astype(np.int32), counts, valid, gids, n_graphs)
    Cr = np.zeros((n_graphs, max(n_rep, 1)))
    np.add.at(Cr, (gids[gv], gl[gv]), 1.0)
    K_rec = Cr @ Cr.T
    K_rec[np.arange(n_graphs), np.arange(n_graphs)] += diag
    np.testing.assert_allclose(K_rec, K_full)


def test_host_hash_refine_matches_device():
    rng = np.random.default_rng(5)
    N, E = 500, 1700
    labels = rng.integers(0, 20, N).astype(np.int32)
    s = rng.integers(0, N, E).astype(np.int32)
    r = rng.integers(0, N, E).astype(np.int32)
    ev = rng.random(E) < 0.9
    h1d, h2d = wl_ops.wl_hash_refine(
        jnp.asarray(labels), jnp.asarray(s), jnp.asarray(r),
        jnp.asarray(ev))
    h1h, h2h = wl_ops.host_hash_refine(labels, s, r, ev)
    np.testing.assert_array_equal(np.asarray(h1d), h1h)
    np.testing.assert_array_equal(np.asarray(h2d), h2h)


def _dataset(seed, weighted=False):
    train, _ = generate_dataset(
        n_graphs=25, n_graphs_test=4, r_vertices=(4, 12),
        r_connectivity=(0.25, 0.5), random_state=seed,
        r_weight_edges=(0.5, 2.0) if weighted else (1, 1),
        features=("nl", 4))
    return train


def test_sp_direct_matches_hash_fallback():
    """The unit-weight direct-index path and the generic hash path
    produce identical Grams."""
    data = _dataset(0)
    k1 = ShortestPath()
    K_direct = k1.fit_transform(data)

    k2 = ShortestPath()
    k2._DIRECT_MAX_WIDTH = 0  # force the hash-compaction fallback
    K_hash = k2.fit_transform(data)
    np.testing.assert_allclose(np.asarray(K_direct), np.asarray(K_hash),
                               rtol=1e-6)
    # transform block too
    test = _dataset(1)
    T1 = k1.transform(test)
    T2 = k2.transform(test)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), rtol=1e-6)
    d1 = k1.diagonal()
    d2 = k2.diagonal()
    np.testing.assert_allclose(np.asarray(d1[1]), np.asarray(d2[1]),
                               rtol=1e-6)


def test_sp_weighted_uses_fallback_and_is_finite():
    data = _dataset(2, weighted=True)
    k = ShortestPath()
    K = k.fit_transform(data)
    assert np.isfinite(K).all()
    ok, _ = k._direct_eligible(k.X)
    assert not ok  # weighted graphs are not direct-eligible
