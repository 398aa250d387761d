"""Neighbor-list construction and batch collation.

Replaces ``torch_cluster.radius_graph`` (reference:
/root/reference/gotennet/models/components/layers.py:1579-1604).
Molecules are small (QM9 <= 29 atoms, MD22 <= a few hundred), so an
O(M^2) masked within-graph distance test is both exact and fast.

Two paths:
  * ``build_edges_np`` / ``collate_graphs`` — host-side NumPy, used by
    the input pipeline.  Emits fixed-capacity, destination-sorted edge
    lists ready for the jitted model.
  * ``radius_graph_jax`` — jittable on-device builder over a padded
    batch, for pipelines that want graph construction inside ``jit``.

Both honor the reference semantics: optional self-loops whose distance
is defined as 0 (layers.py:1597-1600), cutoff-radius neighborhoods, and
a ``max_num_neighbors`` cap (we keep the *nearest* k — the reference's
CUDA kernel keeps an arbitrary k; nearest is deterministic and strictly
more physical, and the cap rarely binds at QM9 scale).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gotennet_tpu.graph.batch import GraphBatch

__all__ = ["build_edges_np", "collate_graphs", "radius_graph_jax",
           "spatial_order"]


def spatial_order(pos: np.ndarray, cell: float) -> np.ndarray:
    """Permutation sorting atoms by spatial cell (lexicographic grid
    order, cells of side ``cell`` — use the neighbor cutoff).

    Spatially-ordered atoms make the neighbor-index matrix *banded*:
    every neighbor of a node lies within a bounded index window, which
    is what lets the ELL layout's windowed one-hot gathers read a
    [W, F] slab instead of the whole [N, F] feature table (the
    10^3-atom path; see models/gotennet_ell.py).  Order within a cell
    is by original index (stable)."""
    p = np.asarray(pos, np.float64)
    c = np.floor((p - p.min(axis=0, keepdims=True)) / max(cell, 1e-6))
    c = c.astype(np.int64)
    # lexicographic cell key; stable sort keeps in-cell order
    key = (c[:, 0], c[:, 1], c[:, 2])
    return np.lexsort((np.arange(len(p)), key[2], key[1], key[0]))


def build_edges_np(
    pos: np.ndarray,
    cutoff: float,
    loop: bool = True,
    max_num_neighbors: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Radius graph of a single molecule.

    Returns ``(src, dst)`` int32 arrays.  For every (directed) edge the
    *destination* is the center node whose neighborhood the edge belongs
    to; ``dst``-sorted.  Self-loops, when requested, are appended for
    every node regardless of the cap (mirrors torch_cluster
    ``radius_graph(loop=True)``).
    """
    n = pos.shape[0]
    if n == 0:
        return (np.zeros(0, np.int32),) * 2
    diff = pos[None, :, :] - pos[:, None, :]  # [dst, src, 3] src - dst? see below
    # dist[i, j] = |pos_j - pos_i| : neighbors j of center i
    dist = np.sqrt((diff ** 2).sum(-1))
    within = dist < cutoff
    np.fill_diagonal(within, False)

    src_list: List[np.ndarray] = []
    dst_list: List[np.ndarray] = []
    for i in range(n):
        nbrs = np.nonzero(within[i])[0]
        if len(nbrs) > max_num_neighbors:
            order = np.argsort(dist[i, nbrs], kind="stable")
            nbrs = nbrs[order[:max_num_neighbors]]
            nbrs = np.sort(nbrs)
        if loop:
            nbrs = np.concatenate([nbrs, [i]])
        src_list.append(nbrs.astype(np.int32))
        dst_list.append(np.full(len(nbrs), i, np.int32))
    return np.concatenate(src_list), np.concatenate(dst_list)


def collate_graphs(
    graphs: Sequence[dict],
    num_nodes: int,
    num_edges: int,
    num_graphs: int,
    cutoff: float = 5.0,
    loop: bool = True,
    max_num_neighbors: int = 32,
    y_dim: int = 1,
    with_forces: bool = False,
) -> GraphBatch:
    """Pack a list of molecules into one fixed-capacity ``GraphBatch``.

    Each graph dict holds ``z [M]``, ``pos [M, 3]`` and optionally
    ``y [T]`` / ``dy [M, 3]``.  Raises if capacities are exceeded.
    """
    if len(graphs) > num_graphs:
        raise ValueError(f"{len(graphs)} graphs > capacity {num_graphs}")

    z = np.zeros(num_nodes, np.int32)
    pos = np.zeros((num_nodes, 3), np.float32)
    node_graph = np.zeros(num_nodes, np.int32)
    node_mask = np.zeros(num_nodes, bool)
    src = np.zeros(num_edges, np.int32)
    dst = np.zeros(num_edges, np.int32)
    edge_mask = np.zeros(num_edges, bool)
    graph_mask = np.zeros(num_graphs, bool)
    y = np.zeros((num_graphs, y_dim), np.float32)
    dy = np.zeros((num_nodes, 3), np.float32) if with_forces else None

    from gotennet_tpu.graph.native import build_edges  # native if built

    n_off = 0
    e_off = 0
    for g_idx, g in enumerate(graphs):
        gz = np.asarray(g["z"], np.int32)
        gpos = np.asarray(g["pos"], np.float32)
        m = gz.shape[0]
        es, ed = build_edges(gpos, cutoff, loop, max_num_neighbors)
        ne = es.shape[0]
        if n_off + m > num_nodes:
            raise ValueError("node capacity exceeded")
        if e_off + ne > num_edges:
            raise ValueError("edge capacity exceeded")
        z[n_off:n_off + m] = gz
        pos[n_off:n_off + m] = gpos
        node_graph[n_off:n_off + m] = g_idx
        node_mask[n_off:n_off + m] = True
        src[e_off:e_off + ne] = es + n_off
        dst[e_off:e_off + ne] = ed + n_off
        edge_mask[e_off:e_off + ne] = True
        graph_mask[g_idx] = True
        if "y" in g and g["y"] is not None:
            y[g_idx] = np.asarray(g["y"], np.float32).reshape(-1)[:y_dim]
        if with_forces and "dy" in g and g["dy"] is not None:
            dy[n_off:n_off + m] = np.asarray(g["dy"], np.float32)
        n_off += m
        e_off += ne

    return GraphBatch(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        node_graph=jnp.asarray(node_graph),
        edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        y=jnp.asarray(y),
        dy=jnp.asarray(dy) if dy is not None else None,
    )


def radius_graph_jax(
    pos: jnp.ndarray,
    node_graph: jnp.ndarray,
    node_mask: jnp.ndarray,
    cutoff: float,
    max_degree: int,
    loop: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jittable radius graph over a padded node set.

    Emits exactly ``N * max_degree`` (+ ``N`` self-loop) edge slots:
    for every center node the nearest ``max_degree`` candidates within
    the cutoff (same graph, both real).  Returns ``(src, dst, mask)``,
    destination-sorted by construction.

    O(N^2) distance work: fine for molecular N; replace with a cell
    list only if periodic/large systems arrive.
    """
    n = pos.shape[0]
    d2 = jnp.sum((pos[None, :, :] - pos[:, None, :]) ** 2, axis=-1)  # [i, j]
    same_graph = node_graph[:, None] == node_graph[None, :]
    both_real = node_mask[:, None] & node_mask[None, :]
    not_self = ~jnp.eye(n, dtype=bool)
    valid = same_graph & both_real & not_self & (d2 < cutoff ** 2)

    # nearest-k per row: argsort of masked distances (k is small and static)
    big = jnp.float32(1e30)
    masked_d2 = jnp.where(valid, d2, big)
    order = jnp.argsort(masked_d2, axis=1)[:, :max_degree]  # [N, k]
    picked_d2 = jnp.take_along_axis(masked_d2, order, axis=1)
    edge_valid = picked_d2 < big / 2

    dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), max_degree)
    src = order.astype(jnp.int32).reshape(-1)
    mask = edge_valid.reshape(-1)
    if loop:
        loop_idx = jnp.arange(n, dtype=jnp.int32)
        # interleave so dst stays sorted: append per-node loop after its block
        dst = jnp.concatenate(
            [dst.reshape(n, max_degree), loop_idx[:, None]], axis=1
        ).reshape(-1)
        src = jnp.concatenate(
            [src.reshape(n, max_degree), loop_idx[:, None]], axis=1
        ).reshape(-1)
        mask = jnp.concatenate(
            [mask.reshape(n, max_degree), node_mask[:, None]], axis=1
        ).reshape(-1)
    src = jnp.where(mask, src, dst)  # dead slots become masked self-loops
    return src, dst, mask
