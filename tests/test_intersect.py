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
