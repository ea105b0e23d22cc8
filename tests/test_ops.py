"""Host-assembly Gram ops (ops/gram.py)."""

import numpy as np


def test_sparse_counts_gram_matches_dense():
    from grakel_tpu.ops.gram import sparse_counts_gram
    rng = np.random.RandomState(0)
    n, width, items = 23, 5000, 4000
    gids = rng.randint(0, n, items)
    labels = rng.randint(0, width, items)
    w = rng.randint(1, 4, items).astype(float)
    C = np.zeros((n, width))
    np.add.at(C, (gids, labels), w)
    expect = C @ C.T
    got = sparse_counts_gram(gids, labels, n, weights=w)
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-6)
    # hot columns: everything in few columns -> dense XLA-CPU block
    labels2 = rng.randint(0, 3, items)
    C2 = np.zeros((n, 3))
    np.add.at(C2, (gids, labels2), w)
    got2 = sparse_counts_gram(gids, labels2, n, weights=w,
                              dense_col_mult=2)
    np.testing.assert_allclose(got2, C2 @ C2.T, rtol=1e-5, atol=1e-3)


def test_shortest_path_sparse_gram_path():
    """Force SP's host sparse assembly (wide repeated-id space) and
    compare against the device counts-GEMM path on the same input."""
    from grakel_tpu.kernels import ShortestPath
    rng = np.random.RandomState(1)
    graphs = []
    for i in range(18):
        nv = rng.randint(5, 12)
        A = (rng.rand(nv, nv) < 0.4).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        # weighted edges force the hash-compaction fallback
        A *= rng.uniform(0.5, 2.0)
        nl = {v: int(rng.randint(0, 4)) for v in range(nv)}
        graphs.append([A, nl, {}])
    k1 = ShortestPath()
    K1 = k1.fit_transform(graphs)
    k2 = ShortestPath()
    k2._SPARSE_GRAM_MIN_REP = 0   # force host sparse assembly
    K2 = k2.fit_transform(graphs)
    np.testing.assert_allclose(K1, K2, rtol=1e-5, atol=1e-5)


def test_shortest_path_stream_bfs_matches_dense():
    """Streaming-mode SP through the native BFS-APSP counts engine
    (and through the device FW path with the engine disabled) must
    equal the dense-mode Gram — fit, rect transform, and diagonal."""
    import numpy as np
    import pytest
    import grakel_tpu.native as native_mod
    from grakel_tpu.kernels import ShortestPath

    rng = np.random.RandomState(3)
    for labeled in (True, False):
        gs = []
        for i in range(28):
            n = rng.randint(5, 18)
            A = (rng.rand(n, n) < 0.25).astype(float)
            A = np.triu(A, 1)
            A = A + A.T
            nl = {v: int(rng.randint(0, 3)) for v in range(n)} \
                if labeled else {v: 0 for v in range(n)}
            gs.append([A, nl, {}])
        kd = ShortestPath(with_labels=labeled)
        Kd = kd.fit_transform(gs[:20])
        Td = kd.transform(gs[20:])
        dd = kd.diagonal()

        ks = ShortestPath(with_labels=labeled)
        ks._STREAM_BYTES = 0        # force streaming parse
        Ks = ks.fit_transform(gs[:20])
        # host sparse-assembly branch (huge observed-key spaces)
        kh = ShortestPath(with_labels=labeled)
        kh._STREAM_BYTES = 0
        kh._BFS_DEVICE_MAX_W = 0
        np.testing.assert_allclose(kh.fit_transform(gs[:20]), Kd,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(kh.transform(gs[20:]), Td,
                                   rtol=1e-5, atol=1e-5)
        Ts = ks.transform(gs[20:])
        ds = ks.diagonal()
        np.testing.assert_allclose(Ks, Kd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(Ts, Td, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ds[0], dd[0], rtol=1e-5)
        if native_mod.have_native():
            assert ks.X.get("bfs_coo"), "native BFS path not engaged"
            # device-FW streaming path with the native engine off
            orig = native_mod.have_native
            native_mod.have_native = lambda: False
            try:
                kf = ShortestPath(with_labels=labeled)
                kf._STREAM_BYTES = 0
                np.testing.assert_allclose(kf.fit_transform(gs[:20]),
                                           Kd, rtol=1e-5, atol=1e-5)
                np.testing.assert_allclose(kf.transform(gs[20:]),
                                           Td, rtol=1e-5, atol=1e-5)
            finally:
                native_mod.have_native = orig
