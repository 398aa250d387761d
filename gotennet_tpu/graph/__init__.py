"""Graph substrate: static-shape batches, segment ops, neighbor lists.

Replaces the reference's PyG/torch_scatter/torch_cluster stack
(/root/reference/gotennet/models/components/layers.py:1566-1604 and
torch_geometric.utils.scatter/softmax call sites) with XLA-native
equivalents over fixed-capacity padded edge lists.
"""

from gotennet_tpu.graph.batch import GraphBatch, pad_sizes_for
from gotennet_tpu.graph.dense_batch import DenseBatch, collate_dense, flatten_nodes
from gotennet_tpu.graph.neighborlist import (
    build_edges_np,
    collate_graphs,
    radius_graph_jax,
)
from gotennet_tpu.graph.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "GraphBatch",
    "pad_sizes_for",
    "DenseBatch",
    "collate_dense",
    "flatten_nodes",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "build_edges_np",
    "collate_graphs",
    "radius_graph_jax",
]
