"""Interop utilities: converters, KMTransformer, cross-validation.

Mirrors the reference's test_utils.py strategy (reference
grakel/tests/test_utils.py:50-196)."""

import numpy as np
import pytest

from grakel_tpu import (KMTransformer, cross_validate_Kfold_SVM,
                        graph_from_networkx, graph_from_pandas,
                        graph_from_csv, VertexHistogram, WeisfeilerLehman)


def _random_nx(n_graphs=6, seed=0):
    import networkx as nx
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_graphs):
        n = rng.randint(4, 9)
        G = nx.Graph()
        for v in range(n):
            G.add_node(v, label=int(rng.randint(0, 3)))
        for u in range(n):
            for v in range(u + 1, n):
                if rng.rand() < 0.4:
                    G.add_edge(u, v, label=int(rng.randint(0, 2)),
                               w=float(rng.rand()))
        out.append(G)
    return out


def test_graph_from_networkx_labels():
    gs = list(graph_from_networkx(_random_nx(), node_labels_tag="label",
                                  edge_labels_tag="label"))
    K = WeisfeilerLehman(n_iter=2).fit_transform(gs)
    assert K.shape == (6, 6) and np.isfinite(K).all()


def test_graph_from_networkx_weights_as_graph():
    gs = list(graph_from_networkx(_random_nx(), node_labels_tag="label",
                                  edge_weight_tag="w", as_Graph=True))
    assert all(g.n > 0 for g in gs)
    # weights flowed through
    assert any(w not in (0.0, 1.0) for g in gs for w in g.weights)


def test_graph_from_pandas():
    import pandas as pd
    # node ids are global row indices (reference contract: "node id must
    # correspond to node number"): graph 0 owns nodes 0-2, graph 1 3-5
    edges = pd.DataFrame({
        "g": [0, 0, 0, 1, 1],
        "src": [0, 1, 2, 3, 4],
        "dst": [1, 2, 0, 4, 5],
        "w": [1.0, 2.0, 1.5, 1.0, 0.5],
        "lab": ["a", "b", "a", "b", "a"],
    })
    nodes = pd.DataFrame({"g": [0, 0, 0, 1, 1, 1],
                          "lab": ["x", "y", "x", "y", "x", "y"]})
    out = graph_from_pandas((edges, "g", ("src", "dst"), "w", "lab"),
                            (nodes, "g", "lab"))
    assert set(out) == {0, 1}
    ed, nl, el = out[0]
    assert nl[1] == "y" and el[(0, 1)] == "a" and ed[0][1] == 1.0
    K = VertexHistogram().fit_transform(list(out.values()))
    assert K.shape == (2, 2)


def test_graph_from_csv(tmp_path):
    e1 = tmp_path / "g1.csv"
    e1.write_text("0,1,0.5,a\n1,2,1.5,b\n")
    e2 = tmp_path / "g2.csv"
    e2.write_text("0,1,1.0,a\n")
    n1 = tmp_path / "n1.csv"
    n1.write_text("0,x\n1,y\n2,x\n")
    n2 = tmp_path / "n2.csv"
    n2.write_text("0,x\n1,y\n")
    gs = list(graph_from_csv(([str(e1), str(e2)], True, False),
                             ([str(n1), str(n2)], False)))
    assert len(gs) == 2
    ed, nl, el = gs[0]
    assert nl["0"] == "x" and el[("0", "1")] == "a"
    assert ed["0"]["1"] == 0.5 and ed["1"]["0"] == 0.5


def test_km_transformer():
    K = np.arange(16.0).reshape(4, 4)
    t = KMTransformer(K=K)
    sub = t.fit_transform([0, 2])
    np.testing.assert_allclose(sub, K[np.ix_([0, 2], [0, 2])])
    rect = t.transform([1, 3])
    np.testing.assert_allclose(rect, K[np.ix_([1, 3], [0, 2])])


def test_cross_validate_kfold_svm():
    rng = np.random.RandomState(1)
    n = 40
    y = np.array([i % 2 for i in range(n)])
    phi = rng.randn(n, 5) + y[:, None] * 2.0
    K = phi @ phi.T
    out = cross_validate_Kfold_SVM([K], y, n_iter=2, n_splits=3,
                                   random_state=0)
    assert len(out) == 1 and len(out[0]) == 2
    assert all(0.5 <= s <= 1.0 for s in out[0])


def _tg(**fields):
    """Minimal stand-in for a torch_geometric Data/Batch object — the
    converter only reads attributes, never calls library methods."""
    import types
    base = dict(x=None, edge_attr=None, y=None, batch=None)
    base.update(fields)
    return types.SimpleNamespace(**base)


def test_graph_from_torch_geometric_single():
    import torch
    from grakel_tpu import graph_from_torch_geometric
    data = _tg(
        edge_index=torch.tensor([[0, 1, 1, 2], [1, 0, 2, 1]]),
        x=torch.tensor([[0.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        edge_attr=torch.tensor([[1.0, 0.0]] * 4),
        y=torch.tensor([1]))
    out = graph_from_torch_geometric(data, node_one_hot=True,
                                     edge_one_hot=True)
    g = out["graph"]
    assert out["y"] == 1 and g.n == 3 and g.nb_edges() == 4
    assert g.get_labels(label_type="vertex") == {0: 1, 1: 0, 2: 1}
    assert g.get_labels(label_type="edge")[(0, 1)] == 0


def test_graph_from_torch_geometric_batch():
    import torch
    from grakel_tpu import graph_from_torch_geometric, VertexHistogram
    # two graphs: nodes 0-2 (graph 0), nodes 3-4 (graph 1)
    data = _tg(
        edge_index=torch.tensor([[0, 1, 2, 3], [1, 2, 0, 4]]),
        x=torch.tensor([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0],
                        [0.0, 1.0], [1.0, 0.0]]),
        y=torch.tensor([0, 1]),
        batch=torch.tensor([0, 0, 0, 1, 1]))
    out = graph_from_torch_geometric(data, node_one_hot=True)
    assert out["y"] == [0, 1]
    assert [g.n for g in out["graph"]] == [3, 2]
    K = VertexHistogram().fit_transform(out["graph"])
    assert K.shape == (2, 2) and np.isfinite(K).all()
    # attribute (non-one-hot) passthrough keeps vectors
    out2 = graph_from_torch_geometric(data, ignore_y=True)
    lab = out2["graph"][0].get_labels(label_type="vertex")
    assert np.asarray(lab[0]).shape == (2,)


def test_graph_from_torch_geometric_crossing_edge():
    import torch
    import pytest
    from grakel_tpu import graph_from_torch_geometric
    data = _tg(edge_index=torch.tensor([[0, 2], [1, 1]]),
               batch=torch.tensor([0, 0, 1]))
    with pytest.raises(ValueError):
        graph_from_torch_geometric(data)
