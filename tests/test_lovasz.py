"""LovaszTheta: device SDP accuracy against closed-form goldens +
kernel pipeline sanity (no reference parity possible — the reference
requires cvxopt, absent from this environment).

Golden values (program convention: empty -> 1, complete -> n, i.e. the
reference's dual with M on non-edges):
* Lovász 1979: theta(C_n) = n cos(pi/n) / (1 + cos(pi/n)) for odd n,
  and theta(G) theta(Gbar) = n for vertex-transitive G;
* perfect graphs: theta = independence number of the complement;
* Paley graphs are self-complementary vertex-transitive -> sqrt(n);
* Petersen = Kneser K(5,2): theta = 4 (complement 10/4).
"""

import numpy as np
import pytest

from grakel_tpu.ops.lovasz_sdp import lovasz_theta_batch


def _cyc(n):
    A = np.zeros((n, n), np.float32)
    for i in range(n):
        A[i, (i + 1) % n] = A[(i + 1) % n, i] = 1
    return A


def _comp(A):
    n = A.shape[0]
    return (1 - A - np.eye(n)).astype(np.float32)


def _petersen():
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6), (2, 7),
         (3, 8), (4, 9), (5, 7), (7, 9), (9, 6), (6, 8), (8, 5)]
    A = np.zeros((10, 10), np.float32)
    for a, b in E:
        A[a, b] = A[b, a] = 1
    return A


def _paley13():
    qr = {(x * x) % 13 for x in range(1, 13)}
    A = np.zeros((13, 13), np.float32)
    for i in range(13):
        for j in range(13):
            if i != j and (i - j) % 13 in qr:
                A[i, j] = 1
    return A


def _kab(a, b):
    A = np.zeros((a + b, a + b), np.float32)
    A[:a, a:] = 1
    A[a:, :a] = 1
    return A


def _path(n):
    A = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        A[i, i + 1] = A[i + 1, i] = 1
    return A


_C7 = np.cos(np.pi / 7)
_C9 = np.cos(np.pi / 9)

GOLDENS = [
    ("empty6", np.zeros((6, 6), np.float32), 1.0),
    ("K6", _comp(np.zeros((6, 6), np.float32)), 6.0),
    ("C5", _cyc(5), np.sqrt(5)),
    ("C7", _cyc(7), (1 + _C7) / _C7),
    ("C7_complement", _comp(_cyc(7)), 7 * _C7 / (1 + _C7)),
    ("petersen", _petersen(), 2.5),
    ("petersen_complement", _comp(_petersen()), 4.0),
    ("K_3_4", _kab(3, 4), 2.0),
    ("P4", _path(4), 2.0),
    ("paley13", _paley13(), np.sqrt(13)),
    ("C9", _cyc(9), (1 + _C9) / _C9),
    ("C9_complement", _comp(_cyc(9)), 9 * _C9 / (1 + _C9)),
]


def test_theta_goldens():
    """All 12 closed-form theta values to 1e-4 at default budgets
    (measured max error 1.5e-5 — the float32 eigh floor)."""
    V = max(A.shape[0] for _, A, _ in GOLDENS)
    B = np.zeros((len(GOLDENS), V, V), np.float32)
    ns = []
    for k, (_, A, _) in enumerate(GOLDENS):
        n = A.shape[0]
        B[k, :n, :n] = A
        ns.append(n)
    t, S = lovasz_theta_batch(B, ns)
    for k, (name, A, golden) in enumerate(GOLDENS):
        assert abs(t[k] - golden) < 1e-4, (name, t[k], golden)


def test_slack_feasible():
    rng = np.random.RandomState(0)
    A = (rng.rand(1, 8, 8) < 0.4).astype(np.float32)
    A = np.triu(A, 1)
    A = A + np.transpose(A, (0, 2, 1))
    t, S = lovasz_theta_batch(A, [8])
    Sb = S[0]
    w = np.linalg.eigvalsh(Sb)
    assert w.min() > -1e-3
    # fixed entries respected
    assert np.allclose(np.diag(Sb), t[0] - 1, atol=1e-4)
    ii, jj = np.nonzero(A[0])
    assert np.allclose(Sb[ii, jj], -1, atol=1e-4)
    # complementary slackness certificate quality: theta from the dual
    # (lmax of J - M) must match theta from the primal
    J = np.ones((8, 8), np.float32)
    M = Sb + J - t[0] * np.eye(8)
    lm = np.linalg.eigvalsh(J - M)[-1]
    assert abs(lm - t[0]) < 5e-3


def test_kernel_pipeline():
    from grakel_tpu.kernels import LovaszTheta
    rng = np.random.RandomState(3)
    graphs = []
    for i in range(12):
        n = rng.randint(4, 9)
        A = (rng.rand(n, n) < 0.4).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        graphs.append([A, {v: 0 for v in range(n)}, {}])
    k = LovaszTheta(random_state=0, n_samples=20)
    K = k.fit_transform(graphs[:9])
    Kt = k.transform(graphs[9:])
    assert K.shape == (9, 9) and Kt.shape == (3, 9)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-5
    assert np.isfinite(K).all() and np.isfinite(Kt).all()


def test_min_cone_batch_goldens():
    """Badoiu-Clarkson cone cosines vs exact minimum enclosing cones.

    Configurations with a closed-form answer: (a) unit vectors spread
    evenly at polar angle alpha around the z-axis -> MEB center on the
    axis, cosine = cos(alpha); (b) two unit vectors at angle theta ->
    axis is the bisector, cosine = cos(theta/2).  Guards the fused
    _min_cone_jit numerics (a regression here would silently skew every
    LovaszTheta feature)."""
    from grakel_tpu.kernels.lovasz_theta import LovaszTheta

    d = 5
    mats, want = [], []
    for alpha in (0.3, 0.9, 1.4):
        ph = np.linspace(0, 2 * np.pi, 4, endpoint=False)
        pts = np.stack([np.sin(alpha) * np.cos(ph),
                        np.sin(alpha) * np.sin(ph),
                        np.full(4, np.cos(alpha)),
                        np.zeros(4), np.zeros(4)])  # [d, 4]
        mats.append(pts)
        want.append(np.cos(alpha))
    for theta in (0.4, 1.2):
        a = np.array([np.sin(theta / 2), 0, np.cos(theta / 2), 0, 0])
        b = np.array([-np.sin(theta / 2), 0, np.cos(theta / 2), 0, 0])
        # duplicate-column padding must not move the ball
        mats.append(np.stack([a, b, a, a], axis=1))
        want.append(np.cos(theta / 2))
    A = np.stack(mats).astype(np.float32)
    assert A.shape == (5, d, 4)
    t = LovaszTheta._min_cone_batch(A)
    # Badoiu-Clarkson converges O(1/iters); at 400 iterations the widest
    # cone tested sits ~1.4e-2 off the exact cosine — an order below the
    # reference Welzl path's own 1e-1 containment slack
    np.testing.assert_allclose(t, want, atol=2e-2)
    np.testing.assert_allclose(t[:2], want[:2], atol=5e-3)
