"""Import the reference GraKeL (at /root/reference) without its compiled
extensions, for GOLDEN GENERATION ONLY.

The reference's Cython/C++ modules (`grakel.kernels._c_functions`,
`grakel.kernels._isomorphism`) and the py2-compat `future` package are not
buildable/installed in this image.  This module registers functionally
equivalent pure-Python stand-ins in ``sys.modules`` *before* importing
``grakel``, so the reference's Python algorithms run unmodified and can
produce golden Gram matrices for parity tests.

Stand-in contracts (verified against the reference sources):
  * future.utils.iteritems            — py3 dict.items()
  * k_to_ij_triangular/rectangular    — functions.pyx:164-172 index math
  * APHash                            — ArashPartov.cpp:8-20 string hash
  * ConSubg(G, k, symmetric)          — all connected k-vertex subsets of a
                                        dict-of-sets graph (functions.pyx:177)
  * sm_kernel                         — product-graph weighted clique sum
                                        (functions.pyx:28-162 + sm_core.cpp)
  * _isomorphism.Graph                — bliss.pyx colored-graph `isomorphic`
                                        via networkx VF2

This file is a test tool; nothing in grakel_tpu imports it.
"""

import itertools
import sys
import types

REFERENCE = "/root/reference"


def _install_future():
    if "future" in sys.modules:
        return
    future = types.ModuleType("future")
    utils = types.ModuleType("future.utils")

    def iteritems(d, **kw):
        return iter(d.items(**kw))

    def iterkeys(d, **kw):
        return iter(d.keys(**kw))

    def itervalues(d, **kw):
        return iter(d.values(**kw))

    utils.iteritems = iteritems
    utils.iterkeys = iterkeys
    utils.itervalues = itervalues
    future.utils = utils
    sys.modules["future"] = future
    sys.modules["future.utils"] = utils


def _aphash(s):
    """AP string hash over the utf-8 bytes of ``s`` (uint32 semantics)."""
    M = 0xFFFFFFFF
    h = 0xAAAAAAAA
    for i, b in enumerate(s.encode("utf-8")):
        if (i & 1) == 0:
            h ^= ((h << 7) ^ (b * (h >> 3))) & M
        else:
            h ^= (~((h << 11) + (b ^ (h >> 5))) & M)
        h &= M
    return h


def _k_to_ij_triangular(k, dim):
    import math
    i = int(dim - 1 - math.floor(
        math.sqrt(-8 * k + 4 * (dim + 1) * dim - 7) / 2.0 - 0.5))
    j = int(k + i - (dim + 1) * dim // 2 + (dim - i + 1) * (dim - i) // 2)
    return (i, j)


def _k_to_ij_rectangular(k, dim):
    return (k % dim, k // dim)


def _consubg(G, k, symmetric):
    """All connected k-vertex subsets of ``G`` (dict: vertex -> set of
    neighbours).  Simple grow-from-anchor enumeration; output contract
    matches the reference's Karakashian implementation: a set of frozensets.
    """
    out = set()
    for anchor in G:
        # connected subsets containing `anchor` using only vertices >= rank
        # of anchor in an arbitrary fixed order would miss sets; instead do
        # the standard "extension" enumeration from each anchor with a
        # forbidden set to avoid duplicates.
        def extend(sub, ext, forbidden):
            if len(sub) == k:
                out.add(frozenset(sub))
                return
            ext = list(ext)
            while ext:
                v = ext.pop()
                new_forbidden = forbidden | {v}
                new_ext = set(ext)
                for w in G[v]:
                    if w not in sub and w not in new_forbidden:
                        new_ext.add(w)
                extend(sub | {v}, new_ext, new_forbidden)
                forbidden = new_forbidden
        extend({anchor}, {v for v in G[anchor] if v != anchor}, {anchor})
    return out


def _sm_kernel(x, y, kv, ke, k):
    """Per-size weighted clique sums over the (x, y) weighted product
    graph — the contract of the reference's Cython ``sm_kernel``
    (functions.pyx:28-162 + sm_core.cpp): returns ``tv`` of length k+1
    where tv[s] sums, over every clique of s+1 product-graph vertices
    that is pairwise nonzero-adjacent AND connected through POSITIVE
    (c-)edges, the product of vertex costs times |edge weights|.

    Product graph (functions.pyx semantics): vertices = pairs (i, j)
    with kv != 0; edge weight = ke value when both graphs have the edge
    (c-edge), -1 when neither has it (d-edge), 0 otherwise.

    Implemented independently of grakel_tpu as a brute-force subset
    enumeration (positive-subgraph connectivity checked per subset), so
    parity tests compare two unrelated implementations.
    """
    import itertools

    import numpy as np

    nx_, Ex, Lx, LEx = x
    ny_, Ey, Ly, LEy = y

    if kv is None:
        V = [(i, j) for i in range(nx_) for j in range(ny_)]
        vcost = [1.0] * len(V)
    else:
        V, vcost = [], []
        for i in range(nx_):
            for j in range(ny_):
                c = kv(Lx[i], Ly[j])
                if c != 0.0:
                    V.append((i, j))
                    vcost.append(c)
    nV = len(V)

    def weight(a, b):
        (i1, j1), (i2, j2) = V[a], V[b]
        if i1 == i2 or j1 == j2:
            return 0.0
        ex = (i1, i2) in Ex
        ey = (j1, j2) in Ey
        if ex and ey:
            return 1.0 if ke is None else ke(LEx[(i1, i2)], LEy[(j1, j2)])
        if not ex and not ey:
            return -1.0
        return 0.0

    W = np.zeros((nV, nV))
    for a in range(nV):
        for b in range(a + 1, nV):
            W[a, b] = W[b, a] = weight(a, b)

    tv = np.zeros(k + 1)
    for s in range(1, k + 1):
        for subset in itertools.combinations(range(nV), s):
            sub = np.array(subset)
            Wd = W[np.ix_(sub, sub)]
            if s > 1 and np.any((Wd == 0.0)
                                & ~np.eye(s, dtype=bool)):
                continue
            # positive-edge subgraph must be connected
            if s > 1:
                pos = Wd > 0.0
                seen = {0}
                frontier = [0]
                while frontier:
                    u = frontier.pop()
                    for v2 in range(s):
                        if pos[u, v2] and v2 not in seen:
                            seen.add(v2)
                            frontier.append(v2)
                if len(seen) != s:
                    continue
            val = 1.0
            for a in subset:
                val *= vcost[a]
            if s > 1:
                iu, ju = np.triu_indices(s, 1)
                val *= float(np.prod(np.abs(Wd[iu, ju])))
            tv[s - 1] += val
    return tv


def _install_c_functions():
    name = "grakel.kernels._c_functions"
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.APHash = _aphash
    mod.k_to_ij_triangular = _k_to_ij_triangular
    mod.k_to_ij_rectangular = _k_to_ij_rectangular
    mod.ConSubg = _consubg
    mod.sm_kernel = _sm_kernel
    sys.modules[name] = mod


def _install_isomorphism():
    name = "grakel.kernels._isomorphism"
    if name in sys.modules:
        return
    import networkx as nx
    from networkx.algorithms.isomorphism import GraphMatcher, categorical_node_match

    class Graph:
        """bliss.pyx-compatible colored graph with VF2 `isomorphic`."""

        def __init__(self, *args):
            self._g = nx.Graph()
            if len(args) > 0:
                assert len(args) == 2
                n_nodes, edges = args
                for v in range(n_nodes):
                    self._g.add_node(v, color=0)
                for u, v in edges:
                    self._g.add_edge(u, v)

        def add_vertex(self, name, color=0):
            self._g.add_node(name, color=color)

        def add_edge(self, u, v):
            self._g.add_edge(u, v)

        def isomorphic(self, other):
            gm = GraphMatcher(self._g, other._g,
                              node_match=categorical_node_match("color", 0))
            return gm.is_isomorphic()

    mod = types.ModuleType(name)
    mod.Graph = Graph
    sys.modules[name] = mod


def _install_numpy_compat():
    """Restore numpy-1.x names the reference uses (removed in numpy 2)."""
    import numpy as np
    if not hasattr(np, "ComplexWarning"):
        np.ComplexWarning = np.exceptions.ComplexWarning
    if not hasattr(np, "VisibleDeprecationWarning"):
        np.VisibleDeprecationWarning = np.exceptions.VisibleDeprecationWarning
    if not hasattr(np, "float_"):
        np.float_ = np.float64
    if not hasattr(np, "int_"):
        np.int_ = np.int64
    if not hasattr(np, "NaN"):
        np.NaN = np.nan
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    if "numpy.matlib" not in sys.modules and not hasattr(np, "matlib"):
        matlib = types.ModuleType("numpy.matlib")

        def repmat(a, m, n):
            a = np.asanyarray(a)
            if a.ndim == 0:
                a = a.reshape(1, 1)
            elif a.ndim == 1:
                a = a.reshape(1, -1)
            return np.tile(a, (m, n))

        matlib.repmat = repmat
        matlib.zeros = lambda shape, dtype=float: np.zeros(shape, dtype)
        matlib.ones = lambda shape, dtype=float: np.ones(shape, dtype)
        sys.modules["numpy.matlib"] = matlib
        np.matlib = matlib


def _install_scipy_compat():
    """The reference passes ``dtype='>f8'`` (big-endian) to csr_matrix
    (vertex_histogram.py:139,152), which scipy >= 1.12 rejects.  Replace
    ``scipy.sparse.csr_matrix`` with a subclass that normalizes dtype byte
    order; the reference imports the name at module scope, so patching
    before the grakel import suffices."""
    import numpy as np
    import scipy.sparse as sp

    if getattr(sp.csr_matrix, "_grakel_tpu_shim", False):
        return

    base = sp.csr_matrix

    class csr_matrix(base):
        _grakel_tpu_shim = True

        def __init__(self, arg1, shape=None, dtype=None, copy=False):
            if dtype is not None:
                dtype = np.dtype(dtype).newbyteorder("=")
            base.__init__(self, arg1, shape=shape, dtype=dtype, copy=copy)

    sp.csr_matrix = csr_matrix

    # scipy >= 1.12 removed eigvalsh(..., eigvals=) which the reference
    # uses (svm_theta.py:224, lovasz_theta.py:366); translate to
    # subset_by_index.  Patch the module attr before grakel's
    # `from scipy.linalg import eigvalsh`.
    import scipy.linalg as sl

    if not getattr(sl.eigvalsh, "_grakel_tpu_shim", False):
        _orig_eigvalsh = sl.eigvalsh

        def eigvalsh(a, *args, eigvals=None, **kw):
            if eigvals is not None:
                kw["subset_by_index"] = eigvals
            return _orig_eigvalsh(a, *args, **kw)

        eigvalsh._grakel_tpu_shim = True
        sl.eigvalsh = eigvalsh


def import_reference_grakel():
    """Install stand-ins and return the imported reference ``grakel``."""
    _install_future()
    _install_numpy_compat()
    _install_scipy_compat()
    _install_c_functions()
    _install_isomorphism()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import grakel
    return grakel
