"""Static-shape padded graph batches.

XLA traces and compiles once per shape, so molecular graphs are packed
into fixed-capacity buffers: ``num_nodes`` node slots, ``num_edges``
edge slots and ``num_graphs`` graph slots.  Padding is tracked with
masks; every aggregation in the model multiplies by the mask before a
segment reduction so padded slots contribute exact zeros.

This replaces the dynamic PyG ``Data``/``Batch`` objects used by the
reference (concatenated graphs + ``batch`` id vector, see
/root/reference/gotennet/datamodules/datamodule.py:209-215).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["GraphBatch", "pad_sizes_for", "pad_stack"]


def pad_stack(batches):
    """Stack same-structure batch pytrees along a new leading axis,
    zero-padding leaves to common shapes first.

    Mid-epoch rebucketing (BatchLoader/ELLLoader growing their edge or
    neighbor capacity on overflow) can change batch shapes inside a
    gradient-accumulation chunk or device group; growing a batch's
    capacity with zero padding is semantics-preserving because padded
    slots carry zero masks (and src=dst=0 edges match the collator's
    own padding convention), so the stack succeeds instead of raising
    a shape mismatch — the crash the rebucketing was meant to avoid.
    """
    import jax

    # ELL window metadata (gather_window/gather_halo) is static AND
    # per-batch exact, so two otherwise-identical batches can carry
    # different values — both are UPPER bounds on neighbor-index
    # spans, so unifying to the element-wise max preserves correctness
    # and makes the treedefs match
    if (batches and hasattr(batches[0], "gather_halo")
            and any(b.gather_window is not None for b in batches)):
        gw = max(b.gather_window or 0 for b in batches) or None
        gh = max((b.gather_halo for b in batches
                  if b.gather_halo is not None), default=None)
        batches = [b.replace(gather_window=gw, gather_halo=gh)
                   for b in batches]

    treedef = None
    leaves_per_batch = []
    for b in batches:
        leaves, td = jax.tree.flatten(b)
        if treedef is None:
            treedef = td
        elif td != treedef:
            raise ValueError("pad_stack: batch pytree structures differ")
        leaves_per_batch.append(leaves)
    stacked = []
    for column in zip(*leaves_per_batch):
        shapes = {tuple(np.shape(x)) for x in column}
        if len(shapes) > 1:
            ranks = {len(s) for s in shapes}
            if len(ranks) > 1:
                raise ValueError(f"pad_stack: rank mismatch {shapes}")
            target = tuple(max(s[d] for s in shapes)
                           for d in range(ranks.pop()))
            column = [jnp.pad(jnp.asarray(x),
                              [(0, t - s) for s, t in zip(x.shape, target)])
                      for x in column]
        stacked.append(jnp.stack([jnp.asarray(x) for x in column]))
    return jax.tree.unflatten(treedef, stacked)


@struct.dataclass
class GraphBatch:
    """A fixed-capacity batch of molecular graphs.

    Shapes (all static):
      - ``N`` node capacity, ``E`` edge capacity, ``G`` graph capacity.

    Attributes:
        z: ``[N] int32`` atomic numbers; ``0`` marks a padded node.
        pos: ``[N, 3]`` Cartesian coordinates (Angstrom).
        node_graph: ``[N] int32`` graph id of each node; padded nodes
            carry ``0`` and are masked out of every graph reduction.
        edge_src: ``[E] int32`` source node ``j`` (the neighbor).
        edge_dst: ``[E] int32`` destination node ``i`` (the center);
            edges are sorted by ``edge_dst`` so segment reductions can
            use ``indices_are_sorted=True``.
        node_mask: ``[N] bool`` true for real nodes.
        edge_mask: ``[E] bool`` true for real edges.
        graph_mask: ``[G] bool`` true for real graphs.
        y: ``[G, T]`` graph-level targets (zeros when absent).
        dy: optional ``[N, 3]`` per-atom force targets (zeros when absent).
    """

    z: jnp.ndarray
    pos: jnp.ndarray
    node_graph: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst: jnp.ndarray
    node_mask: jnp.ndarray
    edge_mask: jnp.ndarray
    graph_mask: jnp.ndarray
    y: jnp.ndarray
    dy: Optional[jnp.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.z.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def n_real_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask.astype(jnp.int32))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_sizes_for(
    n_nodes: Sequence[int],
    n_edges: Sequence[int],
    node_multiple: int = 8,
    edge_multiple: int = 128,
    slack: float = 1.0,
) -> Tuple[int, int]:
    """Pick (node, edge) capacities for a batch, rounded to TPU-friendly
    multiples (sublane 8 for nodes, lane 128 for edges) so recompilation
    is bounded to a handful of buckets.
    """
    n = max(1, int(np.ceil(sum(n_nodes) * slack)))
    e = max(1, int(np.ceil(sum(n_edges) * slack)))
    return _round_up(n, node_multiple), _round_up(e, edge_multiple)
