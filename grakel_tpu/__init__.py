"""grakel_tpu: a TPU-native graph-kernel framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
the reference graph-kernel library (scikit-learn-compatible kernels
producing Gram matrices over graph datasets), built for padded batched
device execution and multi-chip Gram tiling.
"""

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: size-bucketed batching compiles
    one program per (bucket, op) shape, which on a tunneled backend can
    cost minutes on a cold start; the on-disk cache amortizes it across
    processes.  Opt out with GRAKEL_TPU_NO_COMPILE_CACHE=1 or point
    JAX_COMPILATION_CACHE_DIR elsewhere."""
    if _os.environ.get("GRAKEL_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            path = _os.path.join(
                _os.path.expanduser("~"), ".cache", "grakel_tpu_xla")
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .graph import Graph  # noqa: E402
from .batch import GraphBatch  # noqa: E402
from .kernels import *          # noqa: F401,F403
from .kernels import __all__ as _kernels_all

__version__ = "0.1.0"

__all__ = ["Graph", "GraphBatch", "GraphKernel"] + list(_kernels_all)

# GraphKernel wrapper is imported lazily at the end so kernels resolve first
from .graph_kernels import GraphKernel  # noqa: E402
from .utils import (KMTransformer, cross_validate_Kfold_SVM,  # noqa: E402
                    graph_from_networkx, graph_from_pandas,
                    graph_from_csv, graph_from_torch_geometric)

from .isomorphism import (canonical_labeling, canonical_form,  # noqa: E402
                          is_isomorphic)

__all__ += ["KMTransformer", "cross_validate_Kfold_SVM",
            "graph_from_networkx", "graph_from_pandas",
            "graph_from_csv", "graph_from_torch_geometric",
            "canonical_labeling", "canonical_form", "is_isomorphic"]
