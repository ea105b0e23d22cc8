"""LovaszTheta: device SDP correctness on known theta values + kernel
pipeline sanity (no reference parity possible — the reference requires
cvxopt, absent from this environment)."""

import numpy as np
import pytest

from grakel_tpu.ops.lovasz_sdp import lovasz_theta_batch


def test_theta_known_values():
    # the reference's program (M on NON-edges): empty graph -> 1,
    # complete graph -> n, C5 -> sqrt(5)
    n = 5
    empty = np.zeros((1, 8, 8), np.float32)
    comp = np.zeros((1, 8, 8), np.float32)
    comp[0, :n, :n] = 1 - np.eye(n)
    c5 = np.zeros((1, 8, 8), np.float32)
    for i in range(5):
        c5[0, i, (i + 1) % 5] = c5[0, (i + 1) % 5, i] = 1
    t_e, _ = lovasz_theta_batch(empty, [n])
    t_c, _ = lovasz_theta_batch(comp, [n])
    t_5, _ = lovasz_theta_batch(c5, [n])
    assert abs(t_e[0] - 1.0) < 2e-2
    assert abs(t_c[0] - n) < 5e-2
    assert abs(t_5[0] - np.sqrt(5)) < 5e-2


def test_slack_feasible():
    rng = np.random.RandomState(0)
    A = (rng.rand(1, 8, 8) < 0.4).astype(np.float32)
    A = np.triu(A, 1); A = A + np.transpose(A, (0, 2, 1))
    t, S = lovasz_theta_batch(A, [8])
    Sb = S[0]
    w = np.linalg.eigvalsh(Sb)
    assert w.min() > -1e-3
    # fixed entries respected
    assert np.allclose(np.diag(Sb), t[0] - 1, atol=1e-2)
    ii, jj = np.nonzero(A[0])
    assert np.allclose(Sb[ii, jj], -1, atol=1e-2)


def test_kernel_pipeline():
    from grakel_tpu.kernels import LovaszTheta
    rng = np.random.RandomState(3)
    graphs = []
    for i in range(12):
        n = rng.randint(4, 9)
        A = (rng.rand(n, n) < 0.4).astype(float)
        A = np.triu(A, 1); A = A + A.T
        graphs.append([A, {v: 0 for v in range(n)}, {}])
    k = LovaszTheta(random_state=0, n_samples=20)
    K = k.fit_transform(graphs[:9])
    Kt = k.transform(graphs[9:])
    assert K.shape == (9, 9) and Kt.shape == (3, 9)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-5
    assert np.isfinite(K).all() and np.isfinite(Kt).all()
