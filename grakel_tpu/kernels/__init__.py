"""Graph kernels (device-batched, sklearn-compatible)."""

from .base import Kernel
from .core_framework import CoreFramework
from .histogram import VertexHistogram, EdgeHistogram
from .graph_hopper import GraphHopper
from .graphlet_sampling import GraphletSampling
from .hadamard_code import HadamardCode
from .neighborhood_hash import NeighborhoodHash
from .lovasz_theta import LovaszTheta
from .multiscale_laplacian import MultiscaleLaplacian
from .nspd import NeighborhoodSubgraphPairwiseDistance
from .odd_sth import OddSth
from .propagation import Propagation, PropagationAttr
from .pyramid_match import PyramidMatch
from .random_walk import RandomWalk, RandomWalkLabeled
from .shortest_path import ShortestPath, ShortestPathAttr
from .subgraph_matching import SubgraphMatching
from .svm_theta import SvmTheta
from .weisfeiler_lehman import WeisfeilerLehman
from .wl_optimal_assignment import WeisfeilerLehmanOptimalAssignment

__all__ = [
    "Kernel",
    "CoreFramework",
    "VertexHistogram",
    "EdgeHistogram",
    "GraphHopper",
    "GraphletSampling",
    "HadamardCode",
    "NeighborhoodHash",
    "LovaszTheta",
    "MultiscaleLaplacian",
    "NeighborhoodSubgraphPairwiseDistance",
    "OddSth",
    "Propagation",
    "PropagationAttr",
    "PyramidMatch",
    "RandomWalk",
    "RandomWalkLabeled",
    "ShortestPath",
    "ShortestPathAttr",
    "SubgraphMatching",
    "SvmTheta",
    "WeisfeilerLehman",
    "WeisfeilerLehmanOptimalAssignment",
]
