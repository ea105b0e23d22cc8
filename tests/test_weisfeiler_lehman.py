"""WL framework tests.

The strongest check here: the device fast path (multiset hashing +
sort-compaction) must produce the SAME Gram as the host general path
(explicit sorted-credential refinement, mirroring the reference
weisfeiler_lehman.py:213-241 semantics) on random graphs.
"""

import numpy as np
import pytest

from grakel_tpu import VertexHistogram, WeisfeilerLehman, GraphKernel


def _random_graphs(n_graphs, seed, n_lo=3, n_hi=12, n_labels=4):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_graphs):
        n = rng.randint(n_lo, n_hi)
        A = (rng.rand(n, n) < 0.35).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        nl = {i: int(rng.randint(0, n_labels)) for i in range(n)}
        out.append([A, nl, {}])
    return out


class _VH(VertexHistogram):
    """Distinct subclass to force WL onto the host general path."""


def test_fast_path_matches_host_path():
    graphs = _random_graphs(15, seed=3)
    K_fast = WeisfeilerLehman(n_iter=3).fit_transform(graphs)
    K_host = WeisfeilerLehman(n_iter=3, base_graph_kernel=_VH)\
        .fit_transform(graphs)
    np.testing.assert_allclose(K_fast, K_host, rtol=1e-5, atol=1e-5)


def test_fast_path_matches_host_path_transform():
    gtr = _random_graphs(12, seed=4)
    gte = _random_graphs(5, seed=5, n_labels=6)  # includes unseen labels
    wl_f = WeisfeilerLehman(n_iter=3)
    wl_h = WeisfeilerLehman(n_iter=3, base_graph_kernel=_VH)
    wl_f.fit(gtr)
    wl_h.fit(gtr)
    np.testing.assert_allclose(wl_f.transform(gte), wl_h.transform(gte),
                               rtol=1e-5, atol=1e-5)


def test_wl_hand_computed():
    # two isomorphic triangles with identical labels -> identical rows
    tri = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    g1 = [tri, {0: "a", 1: "a", 2: "a"}, {}]
    K = WeisfeilerLehman(n_iter=2).fit_transform([g1, g1])
    # every generation: 3 nodes, one label -> phi = (3,), k = 9; 3 gens
    np.testing.assert_allclose(K, [[27, 27], [27, 27]])


def test_wl_path_vs_star():
    # path 0-1-2-3 vs star center 0: same degree histogram at h=0 if
    # uniform labels, but WL separates them by round 1
    path = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    star = [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)]
    nl = {i: "x" for i in range(4)}
    K = WeisfeilerLehman(n_iter=1).fit_transform(
        [[path, nl, {}], [star, nl, {}]])
    assert K[0, 0] != K[0, 1]
    assert K[0, 0] > 0


def test_wl_psd_and_symmetry():
    graphs = _random_graphs(20, seed=7)
    K = WeisfeilerLehman(n_iter=5).fit_transform(graphs)
    np.testing.assert_allclose(K, K.T, atol=1e-4)
    w = np.linalg.eigvalsh(np.asarray(K, np.float64))
    assert w.min() > -1e-4


def test_wl_normalize_diag_one():
    graphs = _random_graphs(10, seed=9)
    K = WeisfeilerLehman(n_iter=3, normalize=True).fit_transform(graphs)
    np.testing.assert_allclose(np.diagonal(K), np.ones(10), rtol=1e-5)


def test_wl_diagonal_api():
    graphs = _random_graphs(10, seed=11)
    wl = WeisfeilerLehman(n_iter=2)
    K = wl.fit_transform(graphs)
    np.testing.assert_allclose(wl.diagonal(), np.diagonal(K), rtol=1e-5)
    gte = _random_graphs(4, seed=12)
    wl.transform(gte)
    xd, yd = wl.diagonal()
    assert xd.shape == (10,) and yd.shape == (4,)


def test_wl_transform_consistency_with_joint_fit():
    """transform(Y) rows must equal the corresponding block of a joint
    fit_transform over X+Y (WL is per-graph independent)."""
    gx = _random_graphs(8, seed=20)
    gy = _random_graphs(3, seed=21)
    wl = WeisfeilerLehman(n_iter=3)
    wl.fit(gx)
    Kt = wl.transform(gy)
    K_joint = WeisfeilerLehman(n_iter=3).fit_transform(gx + gy)
    np.testing.assert_allclose(Kt, K_joint[8:, :8], rtol=1e-5, atol=1e-5)


def test_wl_via_wrapper():
    graphs = _random_graphs(8, seed=30)
    K1 = GraphKernel(kernel={"name": "WL", "n_iter": 2}).fit_transform(graphs)
    K2 = WeisfeilerLehman(n_iter=2).fit_transform(graphs)
    np.testing.assert_allclose(K1, K2, rtol=1e-6)
    # framework chaining spec: WL over vertex histogram
    K3 = GraphKernel(kernel=[{"name": "weisfeiler_lehman", "n_iter": 2},
                             {"name": "vertex_histogram"}])\
        .fit_transform(graphs)
    np.testing.assert_allclose(K3, K2, rtol=1e-6)


def test_wl_invalid_n_iter():
    with pytest.raises(TypeError):
        WeisfeilerLehman(n_iter=0).fit_transform(_random_graphs(3, seed=1))
