"""ELL (padded-neighbor) graph batches: per-node neighbor rows.

The middle ground between the flat edge list (scatter-bound segment
reductions) and dense ``[G, M, M]`` blocks (O(M^2) padding): nodes are
concatenated across the batch like the edge layout, but each node's
incident edges live in a fixed-width row of ``K`` neighbor slots.
Attention softmax becomes a plain masked softmax over the K axis and
every aggregation a dense ``sum`` over K — no sorts, no scatters — at
padding cost O(N*K) instead of O(G*M^2).  Designed for the 10^2-10^3
atom regime (MD22) where molecules are too large for dense blocks but
degree (bounded by ``max_num_neighbors``, reference gotennet.py:1018)
is far below the atom count.

Replaces the same PyG machinery as graph/batch.py; the neighbor rows
are exactly the reference's ``radius_graph`` edges grouped by
destination (layers.py:1566-1604 semantics: nearest-k cap, self-loops).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["ELLBatch", "collate_ell", "ell_from_graph_batch"]


@struct.dataclass
class ELLBatch:
    """Fixed-capacity batch with per-node neighbor rows.

    Shapes: ``N`` node slots, ``K`` neighbor slots per node, ``G``
    graph slots.

    Attributes:
        z: ``[N] int32`` atomic numbers (0 = padded node).
        pos: ``[N, 3]`` coordinates.
        node_graph: ``[N] int32`` graph id per node.
        nbr: ``[N, K] int32`` source-node index of each incident edge
            (the destination/center is the row index); padded slots
            point at the row's own node so gathers stay in range.
        nbr_mask: ``[N, K] bool`` true for real edges.
        node_mask: ``[N] bool``; graph_mask: ``[G] bool``.
        y: ``[G, T]`` targets; dy: optional ``[N, 3]`` forces.
        gather_window / block_rows: static (non-pytree) metadata for
            the windowed one-hot gather path: with spatially-ordered
            nodes, every neighbor index of a ``block_rows``-row node
            block provably lies in a ``gather_window``-wide index
            window, so the model replaces ``x[nbr]`` row gathers
            (pathological on TPU) with block-banded one-hot matmuls.
            ``None`` selects the plain-take path.
    """

    z: jnp.ndarray
    pos: jnp.ndarray
    node_graph: jnp.ndarray
    nbr: jnp.ndarray
    nbr_mask: jnp.ndarray
    node_mask: jnp.ndarray
    graph_mask: jnp.ndarray
    y: jnp.ndarray
    dy: Optional[jnp.ndarray] = None
    gather_window: Optional[int] = struct.field(
        pytree_node=False, default=None)
    block_rows: Optional[int] = struct.field(
        pytree_node=False, default=None)
    # max excursion of any block's neighbor indices outside its own
    # row range: any contiguous row chunk [a, b) has nbr in
    # [a - gather_halo, b + gather_halo) — the static window bound
    # the chunked fused-kernel path slices node tables by
    gather_halo: Optional[int] = struct.field(
        pytree_node=False, default=None)

    @property
    def num_nodes(self) -> int:
        return self.z.shape[0]

    @property
    def max_neighbors(self) -> int:
        return self.nbr.shape[1]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


def collate_ell(
    graphs: Sequence[dict],
    num_nodes: int,
    max_neighbors: int,
    num_graphs: int,
    cutoff: float = 5.0,
    loop: bool = True,
    max_num_neighbors: int = 32,
    y_dim: int = 1,
    with_forces: bool = False,
    block_rows: Optional[int] = None,
    spatial_sort: bool = False,
) -> ELLBatch:
    """Pack molecules into one fixed-capacity ``ELLBatch``.

    Edges come from the same neighbor builder as the edge layout
    (cell list / O(N^2), nearest-k cap, dst-sorted) and are regrouped
    into per-destination rows.  Raises if a node's degree exceeds
    ``max_neighbors`` (no silent truncation).
    """
    if len(graphs) > num_graphs:
        raise ValueError(f"{len(graphs)} graphs > capacity {num_graphs}")

    z = np.zeros(num_nodes, np.int32)
    pos = np.zeros((num_nodes, 3), np.float32)
    node_graph = np.zeros(num_nodes, np.int32)
    node_mask = np.zeros(num_nodes, bool)
    # padded rows self-point so X[nbr]/pos[nbr] gathers stay in range
    nbr = np.tile(np.arange(num_nodes, dtype=np.int32)[:, None],
                  (1, max_neighbors))
    nbr_mask = np.zeros((num_nodes, max_neighbors), bool)
    graph_mask = np.zeros(num_graphs, bool)
    y = np.zeros((num_graphs, y_dim), np.float32)
    dy = np.zeros((num_nodes, 3), np.float32) if with_forces else None

    from gotennet_tpu.graph.native import build_edges

    n_off = 0
    for g_idx, g in enumerate(graphs):
        gz = np.asarray(g["z"], np.int32)
        gpos = np.asarray(g["pos"], np.float32)
        gdy = g.get("dy")
        if spatial_sort:
            # cell-lexicographic atom order bounds each node block's
            # neighbor-index window (see ELLBatch.gather_window)
            from gotennet_tpu.graph.neighborlist import spatial_order
            perm = spatial_order(gpos, cutoff)
            gz, gpos = gz[perm], gpos[perm]
            if gdy is not None:
                gdy = np.asarray(gdy, np.float32)[perm]
            g = dict(g, dy=gdy)
        m = gz.shape[0]
        if n_off + m > num_nodes:
            raise ValueError("node capacity exceeded")
        src, dst = build_edges(gpos, cutoff, loop, max_num_neighbors)
        counts = np.bincount(dst, minlength=m)
        if counts.max(initial=0) > max_neighbors:
            raise ValueError(
                f"node degree {counts.max()} exceeds neighbor capacity "
                f"{max_neighbors}")
        # edges are dst-sorted: slot position = running offset per row
        slot = np.arange(len(dst)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        nbr[n_off + dst, slot] = src + n_off
        nbr_mask[n_off + dst, slot] = True
        z[n_off:n_off + m] = gz
        pos[n_off:n_off + m] = gpos
        node_graph[n_off:n_off + m] = g_idx
        node_mask[n_off:n_off + m] = True
        graph_mask[g_idx] = True
        if "y" in g and g["y"] is not None:
            y[g_idx] = np.asarray(g["y"], np.float32).reshape(-1)[:y_dim]
        if with_forces and "dy" in g and g["dy"] is not None:
            dy[n_off:n_off + m] = np.asarray(g["dy"], np.float32)
        n_off += m

    gather_window = None
    gather_halo = None
    if block_rows:
        if num_nodes % block_rows:
            raise ValueError(
                f"num_nodes ({num_nodes}) must be a multiple of "
                f"block_rows ({block_rows}) for windowed gathers")
        # exact per-block index spans -> one static window width,
        # rounded to the 128-lane contraction tile.  Guaranteed bound:
        # the model re-derives each block's start as min(nbr) over the
        # block, so max(nbr) <= start + gather_window - 1 by
        # construction here.
        nb = nbr.reshape(num_nodes // block_rows, -1)
        width = int((nb.max(axis=1) - nb.min(axis=1) + 1).max())
        gather_window = min(num_nodes, -(-width // 128) * 128)
        # halo: how far any block's neighbor indices stray outside the
        # block's own row range.  Gives a PROVEN static window for ANY
        # contiguous row chunk [a, b): nbr ⊂ [a - halo, b + halo) —
        # what the chunked fused-ELL kernel path slices its node-table
        # windows by (models/gotennet_ell.py).  Exact (measured on
        # this batch's indices), no spatial-sort assumption needed.
        rows_idx = np.arange(num_nodes)
        first = rows_idx.reshape(-1, block_rows)[:, 0]
        last = rows_idx.reshape(-1, block_rows)[:, -1]
        gather_halo = int(max(
            0,
            (first - nb.min(axis=1)).max(initial=0),
            (nb.max(axis=1) - last).max(initial=0)))

    return ELLBatch(
        z=jnp.asarray(z), pos=jnp.asarray(pos),
        node_graph=jnp.asarray(node_graph),
        nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(nbr_mask),
        node_mask=jnp.asarray(node_mask),
        graph_mask=jnp.asarray(graph_mask),
        y=jnp.asarray(y),
        dy=jnp.asarray(dy) if dy is not None else None,
        gather_window=gather_window,
        block_rows=block_rows if gather_window else None,
        gather_halo=gather_halo,
    )


def ell_from_graph_batch(batch, max_neighbors: int) -> ELLBatch:
    """Host-side conversion of a GraphBatch (dst-sorted edge list) to
    ELL rows — for tests and layout comparisons."""
    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    em = np.asarray(batch.edge_mask)
    n = batch.num_nodes
    nbr = np.tile(np.arange(n, dtype=np.int32)[:, None],
                  (1, max_neighbors))
    nbr_mask = np.zeros((n, max_neighbors), bool)
    fill = np.zeros(n, np.int32)
    for s, d in zip(src[em], dst[em]):
        nbr[d, fill[d]] = s
        nbr_mask[d, fill[d]] = True
        fill[d] += 1
    return ELLBatch(
        z=batch.z, pos=batch.pos, node_graph=batch.node_graph,
        nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(nbr_mask),
        node_mask=batch.node_mask, graph_mask=batch.graph_mask,
        y=batch.y, dy=batch.dy,
    )
