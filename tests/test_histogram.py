"""VertexHistogram / EdgeHistogram semantics tests with hand-computed
values, PSD checks, and transform-time unseen-label behavior (the
reference plants an unseen label in every test split —
datasets/testing.py:232-236)."""

import numpy as np
import pytest

from grakel_tpu import VertexHistogram, EdgeHistogram, GraphKernel


def _g(edges, nl=None, el=None):
    return [edges, nl or {}, el or {}]


TRI = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]


def test_vh_hand_computed():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    K = VertexHistogram().fit_transform([g1, g2])
    # phi1 = (2, 1), phi2 = (1, 2)
    np.testing.assert_allclose(K, [[5, 4], [4, 5]])


def test_vh_transform_unseen_label():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    vh = VertexHistogram().fit([g1, g2])
    g3 = _g(TRI, {0: "b", 1: "c", 2: "c"})  # 'c' unseen at fit
    Kt = vh.transform([g3])
    # phi3 restricted to fit labels = (0, 1): dots = (0*2+1*1, 0*1+1*2)
    np.testing.assert_allclose(Kt, [[1, 2]])


def test_vh_diagonal():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    vh = VertexHistogram()
    K = vh.fit_transform([g1, g2])
    np.testing.assert_allclose(vh.diagonal(), np.diagonal(K))
    g3 = _g(TRI, {0: "b", 1: "c", 2: "c"})
    vh.transform([g3])
    Xd, Yd = vh.diagonal()
    np.testing.assert_allclose(Xd, [5, 5])
    np.testing.assert_allclose(Yd, [5])  # 1*b^2 + 2*c^2 -> 1 + 4


def test_vh_normalize():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    K = VertexHistogram(normalize=True).fit_transform([g1, g2])
    np.testing.assert_allclose(np.diagonal(K), [1, 1])
    np.testing.assert_allclose(K[0, 1], 4 / 5)


def test_eh_hand_computed():
    el1 = {e: "x" for e in TRI}
    el2 = dict(el1)
    el2[(0, 1)] = "y"
    el2[(1, 0)] = "y"
    g1 = _g(TRI, None, el1)
    g2 = _g(TRI, None, el2)
    K = EdgeHistogram().fit_transform([g1, g2])
    # phi1 = (6x,); phi2 = (4x, 2y)
    np.testing.assert_allclose(K, [[36, 24], [24, 20]])


def test_vh_requires_labels():
    with pytest.raises(ValueError):
        VertexHistogram().fit_transform([[TRI, None, None]])


def test_psd_random():
    rng = np.random.RandomState(42)
    graphs = []
    for _ in range(20):
        n = rng.randint(3, 12)
        A = (rng.rand(n, n) < 0.3).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        nl = {i: int(rng.randint(0, 4)) for i in range(n)}
        graphs.append([A, nl, {}])
    K = VertexHistogram().fit_transform(graphs)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-5
    np.testing.assert_allclose(K, K.T, atol=1e-8)


def test_wrapper_dispatch():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    for name in ("vertex_histogram", "VH", "subtree_wl"):
        K = GraphKernel(kernel=name).fit_transform([g1, g2])
        np.testing.assert_allclose(K, [[5, 4], [4, 5]])
    K = GraphKernel(kernel={"name": "edge_histogram"}).fit_transform(
        [_g(TRI, None, {e: "x" for e in TRI})] * 2)
    np.testing.assert_allclose(K, [[36, 36], [36, 36]])


def test_wrapper_fit_then_transform():
    g1 = _g(TRI, {0: "a", 1: "a", 2: "b"})
    g2 = _g(TRI, {0: "a", 1: "b", 2: "b"})
    gk = GraphKernel(kernel="vertex_histogram")
    gk.fit([g1, g2])
    Kt = gk.transform([g1])
    np.testing.assert_allclose(Kt, [[5, 4]])


def test_wrapper_nystroem():
    rng = np.random.RandomState(0)
    graphs = []
    for _ in range(30):
        n = rng.randint(3, 10)
        A = (rng.rand(n, n) < 0.4).astype(float)
        A = np.triu(A, 1) + np.triu(A, 1).T
        graphs.append([A, {i: int(rng.randint(0, 3)) for i in range(n)}, {}])
    gk = GraphKernel(kernel="vertex_histogram", Nystroem=10,
                     random_state=0)
    E = gk.fit_transform(graphs)
    assert E.shape == (30, 10)
    # Nystroem embedding must approximately reproduce the kernel
    K_full = VertexHistogram().fit_transform(graphs)
    K_approx = E @ E.T
    assert np.abs(K_approx - K_full).max() / K_full.max() < 0.5
