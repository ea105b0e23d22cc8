"""Cross-cutting guarantees, mirroring the reference's test_common.py:
picklability of every fitted kernel (reference test_common.py:53-58),
GraphKernel wrapper spec handling, and Nystroem approximation.
"""

import pickle

import numpy as np
import pytest

from grakel_tpu import GraphKernel
import grakel_tpu.kernels as K
from grakel_tpu.datasets import generate_dataset


@pytest.fixture(scope="module")
def labeled_data():
    train, test = generate_dataset(n_graphs=20, n_graphs_test=5,
                                   r_vertices=(4, 10), random_state=0,
                                   features=("nl", 3, "el", 2))
    return train, test


@pytest.fixture(scope="module")
def attr_data():
    train, test = generate_dataset(n_graphs=14, n_graphs_test=4,
                                   r_vertices=(4, 8), random_state=1,
                                   features=("na", 3))
    return train, test


LABELED_KERNELS = [
    ("VertexHistogram", {}),
    ("EdgeHistogram", {}),
    ("ShortestPath", {}),
    ("WeisfeilerLehman", {"n_iter": 2}),
    ("WeisfeilerLehmanOptimalAssignment", {"n_iter": 2}),
    ("NeighborhoodHash", {"random_state": 0}),
    ("HadamardCode", {"n_iter": 2}),
    ("Propagation", {"random_state": 0}),
    ("PyramidMatch", {}),
    ("RandomWalk", {}),
    ("RandomWalkLabeled", {}),
    ("GraphletSampling", {"random_state": 0,
                          "sampling": {"n_samples": 30}}),
    ("NeighborhoodSubgraphPairwiseDistance", {"r": 2, "d": 2}),
    ("OddSth", {}),
    ("SvmTheta", {"random_state": 0}),
    ("CoreFramework", {}),
    ("SubgraphMatching", {"k": 3}),
    ("LovaszTheta", {"random_state": 0, "n_samples": 15}),
]

ATTR_KERNELS = [
    ("ShortestPathAttr", {}),
    ("GraphHopper", {}),
    ("PropagationAttr", {"random_state": 0}),
    ("MultiscaleLaplacian", {"random_state": 0, "n_samples": 15}),
]


@pytest.mark.parametrize("name,params", LABELED_KERNELS)
def test_pickle_fitted_labeled(name, params, labeled_data):
    train, test = labeled_data
    k = getattr(K, name)(**params)
    Kf = k.fit_transform(train)
    blob = pickle.dumps(k)
    k2 = pickle.loads(blob)
    T1 = np.asarray(k.transform(test))
    T2 = np.asarray(k2.transform(test))
    np.testing.assert_allclose(T2, T1, rtol=1e-5, atol=1e-6,
                               err_msg=name)
    assert np.isfinite(Kf).all()


@pytest.mark.parametrize("name,params", ATTR_KERNELS)
def test_pickle_fitted_attr(name, params, attr_data):
    train, test = attr_data
    k = getattr(K, name)(**params)
    k.fit_transform(train)
    k2 = pickle.loads(pickle.dumps(k))
    T1 = np.asarray(k.transform(test))
    T2 = np.asarray(k2.transform(test))
    np.testing.assert_allclose(np.nan_to_num(T2), np.nan_to_num(T1),
                               rtol=1e-5, atol=1e-6, err_msg=name)


def test_graphkernel_nystroem(labeled_data):
    train, test = labeled_data
    gk = GraphKernel(kernel="WL", Nystroem=8, random_state=0)
    E = gk.fit_transform(train)
    Et = gk.transform(test)
    assert E.shape == (len(train), 8) and Et.shape == (len(test), 8)
    assert np.isfinite(E).all() and np.isfinite(Et).all()


def test_graphkernel_framework_chain(labeled_data):
    train, test = labeled_data
    gk = GraphKernel(kernel=[{"name": "core_framework"},
                             {"name": "WL", "n_iter": 2},
                             {"name": "vertex_histogram"}])
    Kf = gk.fit_transform(train)
    Kt = gk.transform(test)
    assert Kf.shape == (len(train), len(train))
    assert Kt.shape == (len(test), len(train))


def test_graphkernel_unknown_raises():
    with pytest.raises(ValueError):
        GraphKernel(kernel="not_a_kernel").fit_transform([[{0: [1]}, {}]])


def test_graphkernel_unknown_param_raises():
    """Typos in kernel specs must surface, not be silently dropped
    (reference graph_kernels.py:445-491)."""
    import pytest
    from grakel_tpu import GraphKernel
    gk = GraphKernel(kernel={"name": "weisfeiler_lehman", "n_itr": 5})
    with pytest.raises(TypeError, match="n_itr"):
        gk.initialize()


def test_histogram_sparse_validation():
    import pytest
    from grakel_tpu import VertexHistogram
    VertexHistogram(sparse=True).initialize()
    VertexHistogram(sparse="auto").initialize()
    with pytest.raises(TypeError):
        VertexHistogram(sparse="yes").initialize()


def test_verbose_pairwise_progress(capsys):
    import numpy as np
    from grakel_tpu import SubgraphMatching
    rng = np.random.RandomState(0)
    gs = []
    for i in range(6):
        A = (rng.rand(7, 7) < 0.5).astype(float)
        A = np.triu(A, 1)
        gs.append([A + A.T, {v: 0 for v in range(7)}, {}])
    k = SubgraphMatching(verbose=True, k=3)
    k.fit_transform(gs)
    assert "pairwise" in capsys.readouterr().err


def test_framework_per_iteration_parallelism(labeled_data):
    """WL/HC general-path Grams are identical with threaded per-iteration
    base-kernel dispatch (reference weisfeiler_lehman.py:255-262 analog)."""
    train, test = labeled_data
    for name, params in [
            ("WeisfeilerLehman",
             {"n_iter": 3, "base_graph_kernel": (K.ShortestPath, {})}),
            ("HadamardCode",
             {"n_iter": 3, "base_graph_kernel": (K.ShortestPath, {})})]:
        cls = getattr(K, name)
        seq = cls(**params)
        par = cls(n_jobs=-1, **params)
        np.testing.assert_allclose(par.fit_transform(train),
                                   seq.fit_transform(train), rtol=1e-6)
        np.testing.assert_allclose(par.transform(test),
                                   seq.transform(test), rtol=1e-6)


def test_oddsth_host_sparse_gram_matches_device(labeled_data):
    """The huge-bigDAG host sparse assembly (REDDIT-scale fallback)
    equals the device chunked counts-GEMM path."""
    train, test = labeled_data
    dev = K.OddSth()
    K_dev = dev.fit_transform(train)
    Kt_dev = dev.transform(test)
    host = K.OddSth()
    host._DEVICE_MAX_WIDTH = 0    # force the sparse host path
    np.testing.assert_allclose(host.fit_transform(train), K_dev,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(host.transform(test), Kt_dev,
                               rtol=1e-5, atol=1e-6)
    dx_d, dy_d = dev.diagonal()
    dx_h, dy_h = host.diagonal()
    np.testing.assert_allclose(dx_h, dx_d, rtol=1e-5)
    np.testing.assert_allclose(dy_h, dy_d, rtol=1e-5)


def test_odd_sth_native_matches_python():
    """The C++ decomposition engine and the pure-Python fallback must
    produce identical Grams (fit_transform AND transform with unseen
    labels), for int and string labels."""
    import numpy as np
    from grakel_tpu import OddSth
    from grakel_tpu.datasets import generate_dataset
    from grakel_tpu.native import have_native
    import pytest
    if not have_native():
        pytest.skip("no native library")
    for feat, map_lab in [(("nl", 4), None),
                          (("nl", 3), lambda v: "L%d" % v)]:
        fit, tr = generate_dataset(n_graphs=24, n_graphs_test=8,
                                   r_vertices=(3, 9),
                                   r_connectivity=(0.3, 0.7),
                                   random_state=11, features=feat)
        if map_lab is not None:
            fit = [[g[0], {k: map_lab(v) for k, v in g[1].items()}, g[2]]
                   for g in fit]
            tr = [[g[0], {k: map_lab(v) for k, v in g[1].items()}, g[2]]
                  for g in tr]
        kn = OddSth().fit(fit)
        assert isinstance(kn.X, dict)
        kp = OddSth()
        kp._decompose_native = lambda graphs: None
        kp.fit(fit)
        Kn = OddSth().fit_transform(fit)
        kp2 = OddSth()
        kp2._decompose_native = lambda graphs: None
        Kp = kp2.fit_transform(fit)
        np.testing.assert_allclose(Kn, Kp, rtol=1e-6)
        Tn = kn.transform(tr)
        Tp = kp.transform(tr)
        np.testing.assert_allclose(Tn, Tp, rtol=1e-6)


def test_svm_qp_matches_libsvm():
    """Batched one-class QP (ops/svm_qp.py) vs the libsvm oracle.

    The alphas agree to libsvm's own 1e-3 solver tolerance, OUR
    objective is never worse (we solve the same QP more accurately),
    and the constraints hold exactly."""
    import numpy as np
    from grakel_tpu.ops.svm_qp import one_class_alphas
    from grakel_tpu.kernels.svm_theta import _svm_alphas
    rng = np.random.RandomState(3)
    adjm = []
    for i in range(12):
        n = rng.randint(2, 35)
        p = rng.choice([0.1, 0.3, 0.6])
        A = (rng.rand(n, n) < p).astype(float)
        A = np.triu(A, 1)
        adjm.append(A + A.T)
    adjm.append(np.zeros((5, 5)))   # zero-K degenerate: libsvm returns
    adjm.append(np.zeros((1, 1)))   # its initializer untouched
    ours = one_class_alphas(adjm)
    for A, a in zip(adjm, ours):
        n = A.shape[0]
        r = _svm_alphas(A)
        K = (A > 1e-10).astype(float)
        np.fill_diagonal(K, 0)
        me = np.linalg.eigvalsh(K)[0]
        if me < 0 and abs(me) > 1e-6:
            K = K / (-me)
            K[np.diag_indices_from(K)] += 1.0
        # constraints: box and sum(alpha) = nu * n
        assert a.min() >= -1e-6 and a.max() <= 1 + 1e-6
        assert abs(a.sum() - 0.5 * n) < 1e-4 * max(n, 1)
        # optimality: never worse than libsvm (float32 path slack)
        assert 0.5 * a @ K @ a <= 0.5 * r @ K @ r + 1e-5

    # feature-level agreement on an IMDB-B-shaped batch (dense unlabeled
    # graphs): the kernel's phi is a subset-sampled linear functional of
    # alpha, so this validates the 2e-3 parity bound beyond MUTAG while
    # staying robust to the (documented) non-uniqueness of raw alphas
    from grakel_tpu.kernels.svm_theta import SvmTheta
    imdb = []
    for i in range(16):
        n = rng.randint(12, 29)
        A = (rng.rand(n, n) < 0.5).astype(float)
        A = np.triu(A, 1)
        imdb.append(A + A.T)
    ours_b = one_class_alphas(imdb)
    for A, a in zip(imdb, ours_b):
        r = _svm_alphas(A)
        k = SvmTheta(random_state=0)
        k.initialize()
        phi_a = k._levels(A, a)
        k2 = SvmTheta(random_state=0)
        k2.initialize()
        phi_r = k2._levels(A, r)
        np.testing.assert_allclose(phi_a, phi_r, rtol=2e-3, atol=2e-3)


def test_pm_device_embeddings_match_scipy():
    """Slab-batched device eigh embeddings (ops/spectral.py) agree with
    the per-graph ARPACK path on non-degenerate graphs, and the full
    PyramidMatch Gram routed through the device path matches the scipy
    path."""
    import numpy as np
    from grakel_tpu.kernels.pyramid_match import PyramidMatch
    from grakel_tpu.ops.spectral import batched_topd_abs_eigvecs
    rng = np.random.RandomState(5)
    adjm, graphs = [], []
    for i in range(6):
        n = rng.randint(130, 200)
        A = (rng.rand(n, n) < 0.05).astype(float)
        A = np.triu(A, 1)
        A = A + A.T
        adjm.append(A)
        graphs.append([A, {v: v % 3 for v in range(n)}, {}])
    pm = PyramidMatch()
    pm.initialize()
    coo = []
    for i, A in enumerate(adjm):
        r, c = np.nonzero(A)
        coo.append((i, A.shape[0], r.astype(np.int32),
                    c.astype(np.int32), A[r, c].astype(np.float32)))
    dev = batched_topd_abs_eigvecs(coo, pm.d)
    for i, A in enumerate(adjm):
        ref = pm._embed(A)
        assert dev[i].shape == ref.shape
        np.testing.assert_allclose(dev[i], ref, atol=2e-4,
                                   err_msg=f"graph {i}")
    # end-to-end: device-path Gram == forced-scipy-path Gram
    K_dev = PyramidMatch().fit_transform(graphs)
    old = PyramidMatch._DEVICE_EMBED_MIN_N
    try:
        PyramidMatch._DEVICE_EMBED_MIN_N = 10**9
        K_host = PyramidMatch().fit_transform(graphs)
    finally:
        PyramidMatch._DEVICE_EMBED_MIN_N = old
    np.testing.assert_allclose(K_dev, K_host, rtol=1e-6, atol=1e-8)


def test_random_walk_spectral_matches_cg():
    """The batched spectral closed form (moment features / rational
    tiles) must agree with the per-pair CG path it replaced, in both
    the converging (sparse) and non-converging-series (dense) regimes."""
    import numpy as np
    from grakel_tpu import RandomWalk

    rng = np.random.RandomState(11)
    for p_edge, lam in ((0.15, 0.05), (0.6, 0.01)):
        graphs = []
        for i in range(14):
            n = rng.randint(5, 14)
            A = (rng.rand(n, n) < p_edge).astype(float)
            A = np.triu(A, 1)
            A = A + A.T
            graphs.append([A, {v: 0 for v in range(n)}, {}])
        k = RandomWalk(lamda=lam)
        K_spec = k.fit_transform(graphs)
        assert all("s2" in it for it in k.X)  # spectral path engaged
        k2 = RandomWalk(lamda=lam)
        k2.fit(graphs)
        for it in k2.X:
            it.pop("s2", None)
            it.pop("mu", None)
        K_cg = k2._compute_symmetric(k2.X)
        np.testing.assert_allclose(K_spec, K_cg, rtol=5e-3, atol=1e-2)
        # rect transform path
        Kt = RandomWalk(lamda=lam).fit(graphs[:9]).transform(graphs[9:])
        assert Kt.shape == (5, 9) and np.isfinite(Kt).all()


def test_random_walk_moments_path_matches_eigh():
    """Above _EIG_MAX_N the spectral data comes from matvec moments
    (1^T A^k 1) + power-iteration mu_max; must equal the eigh-based
    moment features."""
    import numpy as np
    from grakel_tpu import RandomWalk
    rng = np.random.RandomState(0)
    gs = []
    for i in range(5):
        n = rng.randint(60, 90)
        par = np.maximum(0, np.arange(1, n) - rng.randint(1, 5, n - 1))
        A = np.zeros((n, n))
        A[np.arange(1, n), par] = 1
        A = A + A.T
        gs.append([A, {v: 0 for v in range(n)}, {}])
    k = RandomWalk(lamda=0.01)
    k._EIG_MAX_N = 10              # force the moments-only path
    K = k.fit_transform(gs)
    assert all(it.get("moments_only") for it in k.X)
    K2 = RandomWalk(lamda=0.01).fit_transform(gs)
    np.testing.assert_allclose(K, K2, rtol=1e-4, atol=1e-6)
