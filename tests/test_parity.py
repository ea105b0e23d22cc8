"""Numerical parity vs the reference GraKeL (imported via tools/refshim).

Each test computes the same Gram matrix with the reference implementation
(pure-Python algorithms, compiled extensions replaced by equivalent
stand-ins) and with grakel_tpu, and asserts allclose — fit_transform,
transform (including unseen labels), and normalization paths.

Skipped automatically when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

try:
    from refshim import import_reference_grakel
    import_reference_grakel()
    import grakel as ref_grakel  # noqa: F401
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference GraKeL unavailable")

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def mutag():
    from grakel_tpu.datasets import read_data
    bunch = read_data("MUTAG", path=DATA)
    return bunch.data


@pytest.fixture(scope="module")
def mutag_split(mutag):
    return mutag[:60], mutag[60:80]


def _ref(name, **params):
    import grakel.kernels as rk
    return getattr(rk, name)(**params)


def _ours(name, **params):
    import grakel_tpu.kernels as ok
    return getattr(ok, name)(**params)


def check_pair(name, data_fit, data_tr=None, rtol=1e-5, atol=1e-6,
               ref_params=None, our_params=None, **params):
    rp = dict(params, **(ref_params or {}))
    op = dict(params, **(our_params or {}))
    ref = _ref(name, **rp)
    ours = _ours(name, **op)
    K_ref = np.asarray(ref.fit_transform(data_fit), np.float64)
    K_our = np.asarray(ours.fit_transform(data_fit), np.float64)
    np.testing.assert_allclose(K_our, K_ref, rtol=rtol, atol=atol,
                               err_msg="%s fit_transform mismatch" % name)
    if data_tr is not None:
        T_ref = np.asarray(ref.transform(data_tr), np.float64)
        T_our = np.asarray(ours.transform(data_tr), np.float64)
        np.testing.assert_allclose(T_our, T_ref, rtol=rtol, atol=atol,
                                   err_msg="%s transform mismatch" % name)


# --------------------------------------------------------------------- #
class TestVertexHistogram:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("VertexHistogram", fit, tr)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("VertexHistogram", fit, tr, normalize=True)


class TestEdgeHistogram:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("EdgeHistogram", fit, tr)


class TestShortestPath:
    def test_labeled(self, mutag_split):
        fit, tr = mutag_split
        check_pair("ShortestPath", fit, tr)

    def test_unlabeled(self, mutag_split):
        fit, tr = mutag_split
        check_pair("ShortestPath", fit, tr, with_labels=False)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("ShortestPath", fit, tr, normalize=True)


@pytest.fixture(scope="module")
def mutag_small(mutag):
    return mutag[:25], mutag[25:35]


class TestRandomWalk:
    def test_fast_geometric_cg(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalk", fit, tr, rtol=5e-3, atol=1e-3)

    def test_fast_exponential_spectral(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalk", fit, tr, rtol=5e-3, atol=1e-3,
                   kernel_type="exponential")

    def test_fast_pstep_spectral(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalk", fit, tr, rtol=5e-3, atol=1e-3, p=3)

    def test_baseline_geometric(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalk", fit, tr, rtol=5e-3, atol=1e-3,
                   method_type="baseline")

    def test_baseline_pstep(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalk", fit, tr, rtol=5e-3, atol=1e-3,
                   method_type="baseline", p=2)


class TestRandomWalkLabeled:
    def test_fast_geometric_cg(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalkLabeled", fit, tr, rtol=5e-3, atol=1e-3)

    def test_pstep(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalkLabeled", fit, tr, rtol=5e-3, atol=1e-3, p=2)

    def test_baseline_geometric(self, mutag_small):
        fit, tr = mutag_small
        check_pair("RandomWalkLabeled", fit, tr, rtol=5e-3, atol=1e-3,
                   method_type="baseline")


class TestNeighborhoodHash:
    def test_simple(self, mutag_split):
        fit, tr = mutag_split
        check_pair("NeighborhoodHash", fit, tr, random_state=42)

    def test_count_sensitive(self, mutag_split):
        fit, tr = mutag_split
        check_pair("NeighborhoodHash", fit, tr, random_state=42,
                   nh_type="count_sensitive")

    def test_more_rounds_bits(self, mutag_split):
        fit, tr = mutag_split
        check_pair("NeighborhoodHash", fit, tr, random_state=7, R=5, bits=6)


@pytest.fixture(scope="module")
def cuneiform_attr():
    from grakel_tpu.datasets import read_data
    bunch = read_data("Cuneiform", path=DATA, prefer_attr_nodes=True)
    return bunch.data[:30], bunch.data[30:40]


class TestPropagation:
    def test_tv(self, mutag_split):
        fit, tr = mutag_split
        check_pair("Propagation", fit, tr, random_state=11)

    def test_hellinger(self, mutag_split):
        fit, tr = mutag_split
        check_pair("Propagation", fit, tr, random_state=11, M="H", t_max=3)

    def test_unseen_labels(self, mutag):
        # craft a transform set with labels absent at fit
        fit = mutag[:30]
        tr = []
        for edges, nl, el in mutag[30:36]:
            nl2 = dict(nl)
            first = next(iter(nl2))
            nl2[first] = 999  # unseen label
            tr.append([edges, nl2, el])
        check_pair("Propagation", fit, tr, random_state=5)

    def test_attr(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("PropagationAttr", fit, tr, random_state=3, rtol=1e-4,
                   atol=1e-5)


class TestPyramidMatch:
    def test_dense_path_labeled(self, mutag_small):
        # d=30 forces the deterministic dense-eig embedding path in both
        # implementations (ARPACK with random start vectors is only
        # deterministic up to eigen-degeneracies)
        fit, tr = mutag_small
        check_pair("PyramidMatch", fit, tr, d=30, rtol=1e-4, atol=1e-5)

    def test_dense_path_unlabeled(self, mutag_small):
        fit, tr = mutag_small
        check_pair("PyramidMatch", fit, tr, d=30, with_labels=False,
                   rtol=1e-4, atol=1e-5)

    def test_default_psd_and_close(self, mutag_small):
        # default d=6 uses ARPACK; allow loose tolerance
        fit, _ = mutag_small
        import grakel.kernels as rk
        import grakel_tpu.kernels as ok
        K_ref = np.asarray(rk.PyramidMatch().fit_transform(fit), np.float64)
        K_our = np.asarray(ok.PyramidMatch().fit_transform(fit), np.float64)
        rel = np.abs(K_our - K_ref) / np.maximum(np.abs(K_ref), 1.0)
        assert np.median(rel) < 1e-3


class TestWLOptimalAssignment:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehmanOptimalAssignment", fit, tr, n_iter=3)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehmanOptimalAssignment", fit, tr, n_iter=5,
                   normalize=True)

    def test_unseen_labels(self, mutag):
        fit = mutag[:30]
        tr = []
        for edges, nl, el in mutag[30:36]:
            nl2 = dict(nl)
            nl2[next(iter(nl2))] = 999
            tr.append([edges, nl2, el])
        check_pair("WeisfeilerLehmanOptimalAssignment", fit, tr, n_iter=2)


class TestOddSth:
    def test_gram(self, mutag_small):
        fit, tr = mutag_small
        check_pair("OddSth", fit, tr)

    def test_depth_capped(self, mutag_small):
        fit, tr = mutag_small
        check_pair("OddSth", fit, tr, h=2)

    def test_normalized(self, mutag_small):
        fit, tr = mutag_small
        check_pair("OddSth", fit, tr, normalize=True)


class TestHadamardCode:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("HadamardCode", fit, tr, n_iter=3)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("HadamardCode", fit, tr, n_iter=5, normalize=True)

    def test_unseen_labels(self, mutag):
        fit = mutag[:30]
        tr = []
        for edges, nl, el in mutag[30:36]:
            nl2 = dict(nl)
            nl2[next(iter(nl2))] = 999
            tr.append([edges, nl2, el])
        check_pair("HadamardCode", fit, tr, n_iter=2)


class TestWeisfeilerLehman:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehman", fit, tr, n_iter=3)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehman", fit, tr, n_iter=3, normalize=True)

    def test_sp_base(self, mutag_small):
        # general (host) path + shared structural caches across
        # generations (Floyd-Warshall computed once per graph)
        fit, tr = mutag_small
        import grakel.kernels as rk
        import grakel_tpu.kernels as ok
        check_pair("WeisfeilerLehman", fit, tr, n_iter=3,
                   ref_params={"base_graph_kernel": (rk.ShortestPath, {})},
                   our_params={"base_graph_kernel": (ok.ShortestPath, {})})


class TestNSPD:
    def test_gram(self, mutag_small):
        fit, tr = mutag_small
        check_pair("NeighborhoodSubgraphPairwiseDistance", fit, tr,
                   r=2, d=3)

    def test_defaults(self, mutag_small):
        fit, tr = mutag_small
        check_pair("NeighborhoodSubgraphPairwiseDistance", fit, tr)

    def test_normalized(self, mutag_small):
        fit, tr = mutag_small
        check_pair("NeighborhoodSubgraphPairwiseDistance", fit, tr,
                   normalize=True)


class TestCoreFramework:
    def test_default_sp_base(self, mutag_small):
        fit, tr = mutag_small
        check_pair("CoreFramework", fit, tr)

    def test_wl_base(self, mutag_small):
        fit, tr = mutag_small
        import grakel.kernels as rk
        import grakel_tpu.kernels as ok
        check_pair("CoreFramework", fit, tr,
                   ref_params={"base_graph_kernel": (
                       rk.WeisfeilerLehman, {"n_iter": 3})},
                   our_params={"base_graph_kernel": (
                       ok.WeisfeilerLehman, {"n_iter": 3})})

    def test_normalized(self, mutag_small):
        fit, tr = mutag_small
        check_pair("CoreFramework", fit, tr, normalize=True)


class TestSvmTheta:
    # The default path solves the one-class dual with the batched device
    # QP (ops/svm_qp.py), which is MORE accurate than the reference's
    # libsvm fit (objective never worse; libsvm stops at a 1e-3 KKT
    # tolerance — see test_common.test_svm_qp_matches_libsvm).  The Gram
    # therefore matches the reference only up to libsvm's own solver
    # error: measured max rel 5.8e-4 on MUTAG, asserted at 2e-3.
    def test_gram(self, mutag_small):
        fit, tr = mutag_small
        check_pair("SvmTheta", fit, tr, random_state=17, rtol=2e-3,
                   atol=1e-4)

    def test_normalized(self, mutag_small):
        fit, tr = mutag_small
        check_pair("SvmTheta", fit, tr, random_state=17, normalize=True,
                   rtol=2e-3, atol=1e-4)

    def test_pipeline_exact_with_libsvm_alphas(self, mutag_small,
                                               monkeypatch):
        # With the reference's own libsvm alphas injected, everything
        # downstream (sampling, levels, metric, Gram assembly) is
        # parity-exact at the tight tolerance.
        from grakel_tpu.kernels import svm_theta as st
        monkeypatch.setattr(
            st.SvmTheta, "_alphas_batch",
            staticmethod(lambda adjm: [st._svm_alphas(A) for A in adjm]))
        fit, tr = mutag_small
        check_pair("SvmTheta", fit, tr, random_state=17, rtol=1e-4,
                   atol=1e-6)


class TestGraphHopper:
    def test_linear(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("GraphHopper", fit, tr, rtol=1e-5, atol=1e-5)

    def test_gaussian(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("GraphHopper", fit, tr, kernel_type=("gaussian", 0.5),
                   rtol=1e-5, atol=1e-5)

    def test_bridge(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("GraphHopper", fit, tr, kernel_type="bridge",
                   rtol=1e-5, atol=1e-5)

    def test_weighted_fallback(self):
        # weighted adjacencies route through the per-source Dijkstra +
        # od_vectors_dag DP instead of the unweighted all-sources tensor
        from grakel_tpu.datasets import generate_dataset
        fit, tr = generate_dataset(
            n_graphs=12, n_graphs_test=4, r_vertices=(4, 9),
            r_connectivity=(0.3, 0.6), r_weight_edges=(0.5, 2.0),
            random_state=7, features=("na", 3))
        check_pair("GraphHopper", fit, tr, rtol=1e-5, atol=1e-5)


class TestShortestPathAttr:
    def test_gram(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        # O(n^4)-equivalent reformulation; use a small slice
        check_pair("ShortestPathAttr", fit[:12], tr[:5],
                   rtol=1e-5, atol=1e-5,
                   ref_params={"algorithm_type": "floyd_warshall"})


class TestMultiscaleLaplacian:
    def test_gram(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("MultiscaleLaplacian", fit, tr, random_state=23,
                   rtol=1e-4, atol=1e-6)

    def test_small_params(self, cuneiform_attr):
        fit, tr = cuneiform_attr
        check_pair("MultiscaleLaplacian", fit, tr, random_state=5, L=2,
                   P=5, n_samples=20, rtol=1e-4, atol=1e-6)


class TestGraphletSampling:
    def test_probabilistic(self, mutag_small):
        fit, tr = mutag_small
        check_pair("GraphletSampling", fit, tr, random_state=31,
                   sampling={"n_samples": 150})

    def test_probabilistic_k4(self, mutag_small):
        fit, tr = mutag_small
        check_pair("GraphletSampling", fit, tr, random_state=7, k=4,
                   sampling={"n_samples": 100}, normalize=True)

    def test_exhaustive(self, mutag):
        fit, tr = mutag[:12], mutag[12:17]
        check_pair("GraphletSampling", fit, tr, k=4)


@pytest.fixture(scope="module")
def mutag_tiny(mutag):
    # smallest graphs (the shim's brute-force reference is O(nV^k))
    sized = sorted(range(len(mutag)), key=lambda i: len(mutag[i][1]))
    idx = sized[:8]
    return [mutag[i] for i in idx[:6]], [mutag[i] for i in idx[6:8]]


class TestSubgraphMatching:
    def test_gram_k3(self, mutag_tiny):
        fit, tr = mutag_tiny
        check_pair("SubgraphMatching", fit, tr, k=3, rtol=1e-6, atol=1e-8)

    def test_lambda_weights(self, mutag_tiny):
        fit, _ = mutag_tiny
        check_pair("SubgraphMatching", fit[:4], None, k=3, lw="decreasing",
                   rtol=1e-6, atol=1e-8)

    def test_k2_edges_none(self, mutag_tiny):
        fit, _ = mutag_tiny
        check_pair("SubgraphMatching", fit[:4], None, k=2, ke=None,
                   rtol=1e-6, atol=1e-8)


class TestProduceNeighborhoods:
    def test_levels_and_distances(self, mutag):
        """The vectorized doubling recursion must reproduce the
        reference's N / D / Dist_pair structures verbatim (NSPD's
        published features depend on every quirk, incl. self-loops and
        the d>r level-popping)."""
        from grakel import Graph as RefGraph
        from grakel_tpu import Graph as OurGraph
        rng = np.random.RandomState(5)
        cases = [mutag[i] for i in rng.choice(len(mutag), 6, replace=False)]
        # explicit self-loop case (the reference puts (i, i) in both
        # D[0] and D[1] and leaves Dist_pair[(i, i)] == 1)
        A = np.array([[1, 1, 0, 0], [1, 0, 1, 0],
                      [0, 1, 0, 1], [0, 0, 1, 0]], float)
        cases = cases + [[A, {i: i % 2 for i in range(4)}, {}]]
        for r, d in [(3, 4), (2, 6), (0, 2), (1, 0)]:
            for g in cases:
                ref = RefGraph(g[0], g[1], g[2])
                ours = OurGraph(g[0], g[1], g[2])
                Nr, Dr, Pr = ref.produce_neighborhoods(
                    r=r, with_distances=True, d=d)
                No, Do, Po = ours.produce_neighborhoods(
                    r=r, with_distances=True, d=d)
                assert set(Nr) == set(No)
                for lev in Nr:
                    for v in Nr[lev]:
                        assert sorted(Nr[lev][v]) == sorted(No[lev][v]), \
                            (r, d, lev, v)
                assert set(Dr) == set(Do)
                for lev in Dr:
                    assert set(Dr[lev]) == set(Do[lev]), (r, d, lev)
                assert Pr == Po, (r, d)
