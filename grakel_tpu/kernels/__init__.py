"""Graph kernels (device-batched, sklearn-compatible)."""

from .base import Kernel
from .histogram import VertexHistogram, EdgeHistogram
from .weisfeiler_lehman import WeisfeilerLehman

__all__ = [
    "Kernel",
    "VertexHistogram",
    "EdgeHistogram",
    "WeisfeilerLehman",
]
