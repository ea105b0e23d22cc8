"""GraphKernel: generic wrapper with the reference's kernel-spec
mini-language (reference grakel/graph_kernels.py:40-68, 445-556).

Accepts ``kernel=`` as a string name/synonym, a dict
``{"name": ..., **params}``, or a list of dicts where the tail becomes
the ``base_graph_kernel`` of the head (framework chaining).  Also
implements Nystroem low-rank approximation
(graph_kernels.py:313-337, 366-372).
"""

from __future__ import annotations

import copy
import warnings

import numpy as np
from sklearn.base import BaseEstimator, TransformerMixin
from sklearn.exceptions import NotFittedError
from sklearn.utils import check_random_state

__all__ = ["GraphKernel"]


def _registry():
    """name/synonym -> (class, default hidden params).  Built lazily to
    avoid import cycles; grows as kernels are implemented."""
    from . import kernels as K

    table = {}

    def add(cls, *names):
        for n in names:
            table[n] = cls

    add(K.VertexHistogram, "vertex_histogram", "subtree_wl", "VH", "ST-WL")
    add(K.EdgeHistogram, "edge_histogram", "EH")
    for opt in ("ShortestPath", "GraphletSampling", "RandomWalk",
                "RandomWalkLabeled", "WeisfeilerLehman", "NeighborhoodHash",
                "NeighborhoodSubgraphPairwiseDistance", "LovaszTheta",
                "SvmTheta", "OddSth", "Propagation", "PropagationAttr",
                "PyramidMatch", "SubgraphMatching", "MultiscaleLaplacian",
                "HadamardCode", "CoreFramework", "GraphHopper",
                "WeisfeilerLehmanOptimalAssignment", "ShortestPathAttr"):
        cls = getattr(K, opt, None)
        if cls is None:
            continue
        if opt == "ShortestPath":
            add(cls, "shortest_path", "SP")
        elif opt == "ShortestPathAttr":
            add(cls, "shortest_path_attr", "SPA")
        elif opt == "GraphletSampling":
            add(cls, "graphlet_sampling", "graphlet", "GR")
        elif opt == "RandomWalk":
            add(cls, "random_walk", "RW")
        elif opt == "RandomWalkLabeled":
            add(cls, "random_walk_labeled", "RWL")
        elif opt == "WeisfeilerLehman":
            add(cls, "weisfeiler_lehman", "WL")
        elif opt == "NeighborhoodHash":
            add(cls, "neighborhood_hash", "NH")
        elif opt == "NeighborhoodSubgraphPairwiseDistance":
            add(cls, "neighborhood_subgraph_pairwise_distance", "NSPD",
                "NSPDK")
        elif opt == "LovaszTheta":
            add(cls, "lovasz_theta", "lovasz-theta", "LOVT")
        elif opt == "SvmTheta":
            add(cls, "svm_theta", "svm-theta", "SVMT")
        elif opt == "OddSth":
            add(cls, "odd_sth", "ODD", "ODD-STh")
        elif opt == "Propagation":
            add(cls, "propagation", "PR", "PK")
        elif opt == "PropagationAttr":
            add(cls, "propagation_attr", "PRA")
        elif opt == "PyramidMatch":
            add(cls, "pyramid_match", "PM")
        elif opt == "SubgraphMatching":
            add(cls, "subgraph_matching", "SM")
        elif opt == "MultiscaleLaplacian":
            add(cls, "multiscale_laplacian", "ML")
        elif opt == "HadamardCode":
            add(cls, "hadamard_code", "HC")
        elif opt == "CoreFramework":
            add(cls, "core_framework", "CORE")
        elif opt == "GraphHopper":
            add(cls, "graph_hopper", "GH")
        elif opt == "WeisfeilerLehmanOptimalAssignment":
            add(cls, "weisfeiler_lehman_optimal_assignment", "WL-OA")
    return table


_FRAMEWORKS = {"weisfeiler_lehman", "WL", "hadamard_code", "HC",
               "core_framework", "CORE"}


class GraphKernel(BaseEstimator, TransformerMixin):
    """Generic wrapper dispatching a kernel spec to a kernel instance."""

    def __init__(self, kernel="shortest_path", normalize=False, verbose=False,
                 n_jobs=None, random_state=None, Nystroem=False, mesh=None):
        self.kernel = kernel
        self.normalize = normalize
        self.verbose = verbose
        self.n_jobs = n_jobs
        self.random_state = random_state
        self.Nystroem = Nystroem
        # 1-D jax.sharding.Mesh or "auto": multi-device Gram assembly
        # (threaded onto the built kernel; see kernels.base.Kernel.mesh)
        self.mesh = mesh
        self._initialized = False

    # ------------------------------------------------------------------ #
    def initialize(self):
        spec = self.kernel
        if isinstance(spec, (str, dict)):
            spec = [spec]
        elif not isinstance(spec, list) or len(spec) == 0:
            raise ValueError("kernel spec must be a str, dict, or non-empty "
                             "list of dicts")
        self.kernel_ = self._make_kernel(list(spec))
        if self.mesh is not None:
            # attribute injection (not a constructor param) keeps the 21
            # concrete kernel signatures at reference parity; framework
            # base kernels inherit the ambient mesh at call time
            self.kernel_.mesh = self.mesh
        if self.Nystroem:
            ncomp = 100 if self.Nystroem is True else int(self.Nystroem)
            if ncomp <= 0:
                raise ValueError("Nystroem components must be positive")
            self.nystroem_ = ncomp
        else:
            self.nystroem_ = False
        self._initialized = True

    def _make_kernel(self, specs):
        head = specs[0]
        if isinstance(head, str):
            head = {"name": head}
        elif not isinstance(head, dict):
            raise ValueError("each kernel spec element must be str or dict")
        head = dict(head)
        name = head.pop("name")
        table = _registry()
        if name not in table:
            raise ValueError("unsupported kernel: %r (available: %s)"
                             % (name, sorted(set(table))))
        cls = table[name]
        params = dict(head)
        params.setdefault("verbose", self.verbose)
        params.setdefault("n_jobs", self.n_jobs)
        params.setdefault("normalize", self.normalize)
        if len(specs) > 1:
            # framework chaining: tail becomes base kernel spec, recursively
            # (reference graph_kernels.py:545-553)
            params["base_graph_kernel"] = self._resolve_base(specs[1:])
        if self.random_state is not None and \
                "random_state" in cls().get_params():
            params.setdefault("random_state", self.random_state)
        valid = cls().get_params()
        unknown = sorted(set(params) - set(valid))
        if unknown:
            # surface typos instead of silently dropping them
            # (reference graph_kernels.py:445-491 raises the same way)
            raise TypeError("%s got unexpected kernel parameter(s): %s "
                            "(valid: %s)"
                            % (cls.__name__, ", ".join(unknown),
                               ", ".join(sorted(valid))))
        return cls(**params)

    def _resolve_base(self, specs):
        """Resolve a tail spec list into a (class, params) pair."""
        head = specs[0] if isinstance(specs[0], dict) else {"name": specs[0]}
        head = dict(head)
        name = head.pop("name", None)
        base_cls = _registry().get(name)
        if base_cls is None:
            raise ValueError("unsupported base kernel: %r" % name)
        bparams = dict(head)
        if len(specs) > 1:
            bparams["base_graph_kernel"] = self._resolve_base(specs[1:])
        return (base_cls, bparams)

    # ------------------------------------------------------------------ #
    def fit(self, X, y=None):
        if not self._initialized:
            self.initialize()
        if self.nystroem_:
            X = list(X)
            n = len(X)
            ncomp = min(self.nystroem_, n)
            self.components_indices_ = check_random_state(
                self.random_state).permutation(n)[:ncomp]
            basis = [X[i] for i in self.components_indices_]
            K_bb = self.kernel_.fit_transform(basis)
            from scipy.linalg import svd
            U, S, V = svd(np.asarray(K_bb))
            S = np.maximum(S, 1e-12)
            self.normalization_ = np.dot(U / np.sqrt(S), V)
            self.components_ = basis
        else:
            self.kernel_.fit(X)
        return self

    def transform(self, X):
        if not self._initialized:
            raise NotFittedError("call fit first")
        K = self.kernel_.transform(X)
        if self.nystroem_:
            return np.dot(K, self.normalization_.T)
        return self._post(K)

    def fit_transform(self, X, y=None):
        if not self._initialized:
            self.initialize()
        if self.nystroem_:
            self.fit(X)
            K = self.kernel_.transform(X)
            return np.dot(K, self.normalization_.T)
        K = self.kernel_.fit_transform(X)
        return self._post(K)

    def _post(self, K):
        # normalization is injected into the inner kernel at construction
        return K

    def diagonal(self):
        return self.kernel_.diagonal()

    def set_params(self, **params):
        super().set_params(**params)
        self._initialized = False
        return self
