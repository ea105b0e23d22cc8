"""Graph kernels (device-batched, sklearn-compatible)."""

from .base import Kernel
from .histogram import VertexHistogram, EdgeHistogram
from .neighborhood_hash import NeighborhoodHash
from .propagation import Propagation, PropagationAttr
from .pyramid_match import PyramidMatch
from .random_walk import RandomWalk, RandomWalkLabeled
from .shortest_path import ShortestPath, ShortestPathAttr
from .weisfeiler_lehman import WeisfeilerLehman

__all__ = [
    "Kernel",
    "VertexHistogram",
    "EdgeHistogram",
    "NeighborhoodHash",
    "Propagation",
    "PropagationAttr",
    "PyramidMatch",
    "RandomWalk",
    "RandomWalkLabeled",
    "ShortestPath",
    "ShortestPathAttr",
    "WeisfeilerLehman",
]
