"""Multi-chip distribution layer: mesh construction + sharded Gram tiling.

The reference library is single-process CPU (its only concurrency is
joblib threading over Gram pair ranges, reference kernel.py:236-265);
this package is the greenfield distributed equivalent (SURVEY.md §2.5):
graphs are sharded across a 1-D device mesh, features are extracted
locally, and the N x N Gram matrix is assembled as row-block tiles with a
ring ``ppermute`` exchange of feature blocks so each step overlaps one
MXU GEMM with one ICI hop.
"""

from .mesh import make_mesh, local_mesh, distributed_init
from .gram import (ring_gram, ring_rect_gram, sharded_counts_gram,
                   sharded_counts_gram_rect, shard_batch)
from .wl import distributed_wl_gram
from .large_graph import (edge_partitioned_wl_features,
                          large_graph_wl_gram, LargeGraphWL)

__all__ = ["make_mesh", "local_mesh", "distributed_init", "ring_gram",
           "ring_rect_gram", "sharded_counts_gram",
           "sharded_counts_gram_rect",
           "shard_batch", "distributed_wl_gram",
           "edge_partitioned_wl_features", "large_graph_wl_gram",
           "LargeGraphWL"]
