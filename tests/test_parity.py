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


class TestWeisfeilerLehman:
    def test_gram(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehman", fit, tr, n_iter=3)

    def test_normalized(self, mutag_split):
        fit, tr = mutag_split
        check_pair("WeisfeilerLehman", fit, tr, n_iter=3, normalize=True)
