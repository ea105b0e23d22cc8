"""Graph kernels (device-batched, sklearn-compatible)."""

from .base import Kernel
from .histogram import VertexHistogram, EdgeHistogram

__all__ = [
    "Kernel",
    "VertexHistogram",
    "EdgeHistogram",
]
