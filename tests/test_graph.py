"""Graph container unit tests (mirrors reference test_graph.py coverage:
construction from adjacency vs dictionary, SP matrix, plus our canonical
representation invariants)."""

import numpy as np
import pytest

from grakel_tpu.graph import (Graph, dijkstra, floyd_warshall,
                              is_adjacency, is_edge_dictionary)


def test_from_adjacency():
    A = np.array([[0, 1, 0], [1, 0, 2], [0, 2, 0]], dtype=float)
    g = Graph(A)
    assert g.n == 3
    assert g.nb_edges() == 4
    np.testing.assert_allclose(g.get_adjacency_matrix(), A)


def test_from_edge_dict():
    g = Graph({"a": {"b": 1.0}, "b": {"a": 1.0, "c": 2.0}, "c": {"b": 2.0}})
    assert g.n == 3
    A = g.get_adjacency_matrix()
    assert A.sum() == 6.0
    # symbol order: a, b, c
    assert A[0, 1] == 1.0 and A[1, 2] == 2.0


def test_from_edge_list():
    g = Graph([(0, 1), (1, 0), (1, 2), (2, 1)])
    assert g.n == 3
    assert g.nb_edges() == 4


def test_from_weighted_tuples():
    g = Graph([(0, 1, 0.5), (1, 0, 0.5)])
    assert g.weights.tolist() == [0.5, 0.5]


def test_labels_attach():
    A = np.array([[0, 1], [1, 0]], dtype=float)
    g = Graph(A, {0: "x", 1: "y"}, {(0, 1): "e", (1, 0): "e"})
    assert g.get_labels() == {0: "x", 1: "y"}
    assert g.get_labels(label_type="edge") == {(0, 1): "e", (1, 0): "e"}


def test_dict_labels_by_symbol():
    g = Graph({"a": ["b"], "b": ["a"]}, node_labels={"a": 1, "b": 2})
    labs = g.get_labels()
    ia, ib = g.index_of["a"], g.index_of["b"]
    assert labs[ia] == 1 and labs[ib] == 2


def test_floyd_warshall_path():
    # path graph 0-1-2-3
    A = np.zeros((4, 4))
    for i in range(3):
        A[i, i + 1] = A[i + 1, i] = 1
    S = floyd_warshall(A)
    assert S[0, 3] == 3 and S[0, 0] == 0 and S[1, 3] == 2


def test_floyd_warshall_disconnected():
    A = np.zeros((3, 3))
    A[0, 1] = A[1, 0] = 1
    S = floyd_warshall(A)
    assert np.isinf(S[0, 2])


def test_dijkstra_matches_fw():
    rng = np.random.RandomState(0)
    A = (rng.rand(8, 8) < 0.4).astype(float)
    A = np.triu(A, 1)
    A = A + A.T
    g = Graph(A)
    S = floyd_warshall(A)
    d, pred = dijkstra(g, 0)
    for v, dist in d.items():
        assert S[0, v] == dist
    # every reached non-source vertex has a predecessor on a shortest path
    for v, p in pred.items():
        assert d[v] == d[p] + 1


def test_subgraph():
    A = np.zeros((4, 4))
    A[0, 1] = A[1, 0] = 1
    A[1, 2] = A[2, 1] = 1
    A[2, 3] = A[3, 2] = 1
    g = Graph(A, {i: i * 10 for i in range(4)})
    sub = g.get_subgraph([1, 2, 3])
    assert sub.n == 3
    assert sub.nb_edges() == 4  # 1-2, 2-3 both directions
    assert sub.get_labels() == {0: 10, 1: 20, 2: 30}


def test_core_numbers():
    # triangle + pendant: triangle vertices core 2, pendant core 1
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (2, 3), (3, 2)]
    g = Graph(edges)
    cores = g.core_numbers()
    assert cores[0] == cores[1] == cores[2] == 2
    assert cores[3] == 1


def test_neighborhoods():
    # path 0-1-2-3
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    g = Graph(edges)
    N, D, D_pair = g.produce_neighborhoods(r=2, with_distances=True, d=2)
    assert set(N[0][0]) == {0}
    assert set(N[1][0]) == {0, 1}
    assert set(N[2][0]) == {0, 1, 2}
    assert (0, 2) in D[2] and (1, 3) in D[2]
    assert D_pair[(0, 1)] == 1 and D_pair[(0, 2)] == 2


def test_format_checkers():
    assert is_adjacency(np.zeros((2, 2)))
    assert not is_adjacency(np.zeros(3))
    assert is_edge_dictionary({0: {1: 1.0}})
    assert is_edge_dictionary([(0, 1)])


def test_empty_graph_rejected():
    from grakel_tpu.kernels.base import normalize_input
    with pytest.warns(UserWarning):
        out = normalize_input([[[(0, 1), (1, 0)], {0: "a", 1: "a"}], []])
    assert len(out) == 1
