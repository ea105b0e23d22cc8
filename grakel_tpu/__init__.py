"""grakel_tpu: a TPU-native graph-kernel framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
the reference graph-kernel library (scikit-learn-compatible kernels
producing Gram matrices over graph datasets), built for padded batched
device execution and multi-chip Gram tiling.
"""

from .graph import Graph
from .batch import GraphBatch
from .kernels import *          # noqa: F401,F403
from .kernels import __all__ as _kernels_all

__version__ = "0.1.0"

__all__ = ["Graph", "GraphBatch", "GraphKernel"] + list(_kernels_all)

# GraphKernel wrapper is imported lazily at the end so kernels resolve first
from .graph_kernels import GraphKernel  # noqa: E402
from .utils import (KMTransformer, cross_validate_Kfold_SVM,  # noqa: E402
                    graph_from_networkx, graph_from_pandas,
                    graph_from_csv, graph_from_torch_geometric)

__all__ += ["KMTransformer", "cross_validate_Kfold_SVM",
            "graph_from_networkx", "graph_from_pandas",
            "graph_from_csv", "graph_from_torch_geometric"]
