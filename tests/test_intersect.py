"""min-intersection Gram: jnp tiling vs Pallas kernel (interpret mode on
the CPU test backend) vs numpy reference."""

import numpy as np
import pytest

from grakel_tpu.ops.intersect import min_intersection_gram


@pytest.mark.parametrize("n,m,L", [(10, 7, 30), (64, 32, 600), (8, 128, 512)])
def test_matches_numpy(n, m, L):
    rng = np.random.RandomState(0)
    A = rng.randint(0, 5, (n, L)).astype(np.float32)
    B = rng.randint(0, 5, (m, L)).astype(np.float32)
    expected = np.minimum(A[:, None, :], B[None, :, :]).sum(-1)
    got = min_intersection_gram(A, B)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pallas_interpret_matches():
    rng = np.random.RandomState(1)
    A = rng.rand(20, 700).astype(np.float32)
    B = rng.rand(33, 700).astype(np.float32)
    expected = np.minimum(A[:, None, :], B[None, :, :]).sum(-1)
    got = min_intersection_gram(A, B, force_pallas=True)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def _jaccard_np(A, B, va, vb):
    R = A.shape[0]
    out = np.zeros((A.shape[1], B.shape[1]))
    for r in range(R):
        c = np.minimum(A[r][:, None, :], B[r][None, :, :]).sum(-1)
        denom = va[:, None] + vb[None, :] - c
        with np.errstate(divide="ignore", invalid="ignore"):
            out += np.where(denom > 0, c / denom, 0.0)
    return out / R


@pytest.mark.parametrize("maxval", [2, 4, 9])
def test_jaccard_rounds(maxval):
    from grakel_tpu.ops.intersect import jaccard_gram_rounds
    rng = np.random.RandomState(2)
    A = rng.randint(0, maxval, (3, 12, 40)).astype(np.float32)
    B = rng.randint(0, maxval, (3, 9, 40)).astype(np.float32)
    va = A.sum(axis=(0, 2)) / 3.0 + 1.0
    vb = B.sum(axis=(0, 2)) / 3.0 + 1.0
    got = np.asarray(jaccard_gram_rounds(A, B, va=va, vb=vb))[:12, :9]
    np.testing.assert_allclose(got, _jaccard_np(A, B, va, vb),
                               rtol=1e-5, atol=1e-5)


def test_jaccard_rounds_symmetric_with_empty():
    from grakel_tpu.ops.intersect import jaccard_gram_rounds
    rng = np.random.RandomState(3)
    A = rng.randint(0, 4, (2, 6, 16)).astype(np.float32)
    A[:, 4] = 0  # empty graph -> 0/0 handled as 0
    va = np.array([5, 5, 5, 5, 0, 5], np.float32)
    got = np.asarray(jaccard_gram_rounds(A, va=va))[:6, :6]
    exp = _jaccard_np(A, A, va, va)
    exp = (exp + exp.T) / 2
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)
    assert got[4, 4] == 0.0


def test_pyramid_match_sparse_matches_dense():
    """The unary-expansion sparse PM path (used when WL-PM relabeling
    mints wide label universes) must equal the dense per-level path."""
    from grakel_tpu.kernels.pyramid_match import PyramidMatch
    rng = np.random.RandomState(5)
    graphs = []
    for i in range(24):
        n = rng.randint(4, 14)
        A = (rng.rand(n, n) < 0.35).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        nl = {v: int(rng.randint(0, 6)) for v in range(n)}
        graphs.append([A, nl, {}])
    for kw in ({}, {"normalize": True}, {"with_labels": False}):
        kd = PyramidMatch(**kw)
        Kd = kd.fit_transform(graphs[:16])
        Td = kd.transform(graphs[16:])
        ks = PyramidMatch(**kw)
        ks._DENSE_MAX_W = 0  # force the sparse path
        assert ks.fit(graphs[:16])._sparse_mode
        ks2 = PyramidMatch(**kw)
        ks2._DENSE_MAX_W = 0
        Ks = ks2.fit_transform(graphs[:16])
        Ts = ks2.transform(graphs[16:])
        np.testing.assert_allclose(Kd, Ks, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Td, Ts, rtol=1e-4, atol=1e-4)
        # host CSR assembly branch (wide singleton-dominated key spaces,
        # the WL-PM regime) must agree with the device counts-GEMM
        kh = PyramidMatch(**kw)
        kh._DENSE_MAX_W = 0
        kh._SPARSE_HOST_MIN_W = 0
        Kh = kh.fit_transform(graphs[:16])
        Th = kh.transform(graphs[16:])
        np.testing.assert_allclose(Kh, Ks, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Th, Ts, rtol=1e-4, atol=1e-4)
