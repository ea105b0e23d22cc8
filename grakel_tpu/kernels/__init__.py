"""Graph kernels (device-batched, sklearn-compatible)."""

from .base import Kernel
from .histogram import VertexHistogram, EdgeHistogram
from .neighborhood_hash import NeighborhoodHash
from .shortest_path import ShortestPath, ShortestPathAttr
from .weisfeiler_lehman import WeisfeilerLehman

__all__ = [
    "Kernel",
    "VertexHistogram",
    "EdgeHistogram",
    "NeighborhoodHash",
    "ShortestPath",
    "ShortestPathAttr",
    "WeisfeilerLehman",
]
