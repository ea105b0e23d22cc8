"""General canonicalizer (bliss replacement): correctness vs brute
force, native/fallback agreement, Graph API surface, and the k=9
graphlet-sampling path it unblocks."""

import itertools

import numpy as np
import pytest

from grakel_tpu import Graph, GraphletSampling
from grakel_tpu.isomorphism import (canonical_form, canonical_labeling,
                                    is_isomorphic, _canonical_py,
                                    _as_edges, _rank_colors)
from grakel_tpu.native import canonical_labeling_native, have_native


def rand_graph(n, p, seed):
    r = np.random.RandomState(seed)
    A = (r.rand(n, n) < p).astype(int)
    A = np.triu(A, 1)
    return A + A.T


def brute_iso(A, B):
    n = A.shape[0]
    return any((A[np.ix_(P, P)] == B).all()
               for P in map(np.array, itertools.permutations(range(n))))


def test_canonical_form_permutation_invariant():
    rng = np.random.RandomState(0)
    for t in range(60):
        n = rng.randint(2, 9)
        A = rand_graph(n, rng.rand() * 0.8 + 0.1, 1000 + t)
        p = rng.permutation(n)
        assert canonical_form(A) == canonical_form(A[np.ix_(p, p)])


def test_vs_brute_force_pairs():
    gs = [rand_graph(6, 0.5, 3000 + i) for i in range(12)]
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            assert (canonical_form(gs[i]) == canonical_form(gs[j])) \
                == brute_iso(gs[i], gs[j])


@pytest.mark.skipif(not have_native(), reason="no native library")
def test_native_and_python_engines_agree():
    for i in range(20):
        A = rand_graph(7, 0.4, 5000 + i)
        n, src, dst = _as_edges(A)
        c = _rank_colors(None, n)
        pn = canonical_labeling_native(n, src, dst, c, False)
        pp = _canonical_py(n, src, dst, c, False)
        inv = np.empty(n, int)
        inv[pn] = np.arange(n)
        inv2 = np.empty(n, int)
        inv2[pp] = np.arange(n)
        assert brute_iso(A[np.ix_(inv, inv)], A[np.ix_(inv2, inv2)])


def test_relabel_identity():
    rng = np.random.RandomState(3)
    for i in range(20):
        A = rand_graph(7, 0.4, 7000 + i)
        p = rng.permutation(7)
        B = A[np.ix_(p, p)]
        pa, pb = canonical_labeling(A), canonical_labeling(B)
        ia = np.empty(7, int)
        ia[pa] = np.arange(7)
        ib = np.empty(7, int)
        ib[pb] = np.arange(7)
        assert (A[np.ix_(ia, ia)] == B[np.ix_(ib, ib)]).all()


def test_colored_isomorphism():
    A = rand_graph(6, 0.5, 42)
    p = np.random.RandomState(1).permutation(6)
    B = A[np.ix_(p, p)]
    c1 = {i: i % 2 for i in range(6)}
    c2 = {int(np.where(p == i)[0][0]): i % 2 for i in range(6)}
    assert is_isomorphic(A, B, c1, c2)
    # color COUNTS differ -> cannot be color-isomorphic
    assert not is_isomorphic(A, B, c1, {i: 0 for i in range(6)})


def test_regular_graph_pruning():
    pet = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6), (2, 7),
           (3, 8), (4, 9), (5, 7), (7, 9), (9, 6), (6, 8), (8, 5)]
    P = np.zeros((10, 10), int)
    for a, b in pet:
        P[a, b] = P[b, a] = 1
    q = np.random.RandomState(2).permutation(10)
    assert canonical_form(P) == canonical_form(P[np.ix_(q, q)])
    # 3-regular non-isomorphic pair on 6 vertices: K3,3 (triangle-free)
    # vs the triangular prism (two triangles + a perfect matching)
    K33 = np.zeros((6, 6), int)
    for a in range(3):
        for b in range(3, 6):
            K33[a, b] = K33[b, a] = 1
    prism = np.zeros((6, 6), int)
    for a, b in [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
                 (0, 3), (1, 4), (2, 5)]:
        prism[a, b] = prism[b, a] = 1
    assert canonical_form(K33) != canonical_form(prism)


def test_graph_api_surface():
    A = rand_graph(8, 0.4, 11)
    p = np.random.RandomState(4).permutation(8)
    B = A[np.ix_(p, p)]
    g1 = Graph(A, {i: "x" for i in range(8)}, {})
    g2 = Graph(B, {i: "x" for i in range(8)}, {})
    assert g1.isomorphic(g2)
    assert g1.isomorphic(g2, use_labels=True)
    perm = g1.canonical_labeling()
    assert sorted(perm.tolist()) == list(range(8))


def test_graphlet_sampling_k9_no_networkx():
    """GraphletSampling(k=9) must run through the canonical-form path
    (reference supports k=9 in its sample-complexity table,
    graphlet_sampling.py:155-232)."""
    rng = np.random.RandomState(9)
    data = []
    for i in range(8):
        n = rng.randint(10, 14)
        data.append([rand_graph(n, 0.35, 800 + i),
                     {v: 0 for v in range(n)}, {}])
    gk = GraphletSampling(k=9, sampling={"n_samples": 40}, random_state=0)
    K = gk.fit_transform(data[:6])
    assert K.shape == (6, 6) and np.isfinite(K).all()
    T = gk.transform(data[6:])
    assert T.shape == (2, 6) and np.isfinite(T).all()
    # the >8-size samples must have used exact canonical-form keys
    assert any(isinstance(k, tuple) and isinstance(k[1], bytes)
               for k in gk._graph_bins.values())
