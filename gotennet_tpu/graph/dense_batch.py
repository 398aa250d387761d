"""Dense per-graph batch layout: [num_graphs, max_atoms] blocks.

TPU-first alternative to the flat edge list for small molecules
(QM9 <= 29 atoms): every pairwise quantity lives in a ``[G, M, M, ...]``
block, so neighborhood aggregation is a batched masked matmul on the
MXU and attention softmax is a plain masked softmax over the j axis —
no gather, no scatter, no sort.  Padded pair fraction at QM9 scale is
~1.6x the capped edge list, a bargain against scatter-bound segment
ops (measured: the edge-list forward is >2/3 HBM-traffic stalls from
scatter fusions).

The flat ``GraphBatch`` remains the layout for large/sparse molecules
and for edge-partitioned multi-chip execution; ``to_graph_batch`` /
``flatten_nodes`` convert between the two.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from gotennet_tpu.graph.batch import GraphBatch

__all__ = ["DenseBatch", "collate_dense", "collate_dense_packed",
           "pack_molecules", "flatten_nodes"]


@struct.dataclass
class DenseBatch:
    """Fixed-capacity dense molecule batch.

    Two layouts share this container:

    * unpacked (``seg is None``): one molecule per slab —
      ``y [G, T]``, ``graph_mask [G]``.
    * packed (``seg`` set): several molecules block-diagonally packed
      into each M-slot slab (``collate_dense_packed``) — ``seg [G, M]``
      holds each atom slot's LOCAL molecule index in ``[0, P)``,
      ``y [G, P, T]`` / ``graph_mask [G, P]`` carry one molecule slot
      per (slab, local) pair.  Every per-slab leading axis stays ``G``
      so gradient-accumulation chunking splits packed batches exactly
      like unpacked ones.

    Attributes:
        z: ``[G, M] int32`` atomic numbers, 0 = padded atom slot.
        pos: ``[G, M, 3]`` coordinates.
        mask: ``[G, M] bool`` real-atom mask.
        graph_mask: ``[G] bool`` (or ``[G, P]`` packed) real-graph mask.
        y: ``[G, T]`` (or ``[G, P, T]`` packed) targets.
        dy: optional ``[G, M, 3]`` force targets.
        seg: optional ``[G, M] int32`` local molecule id per atom slot
            (packed layout); padded slots carry 0 and are masked.
    """

    z: jnp.ndarray
    pos: jnp.ndarray
    mask: jnp.ndarray
    graph_mask: jnp.ndarray
    y: jnp.ndarray
    dy: Optional[jnp.ndarray] = None
    seg: Optional[jnp.ndarray] = None

    @property
    def num_graphs(self) -> int:
        return self.z.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.z.shape[1]

    @property
    def mols_per_slab(self) -> int:
        """Molecule slots per slab (1 unless packed)."""
        return 1 if self.seg is None else self.graph_mask.shape[1]

    @property
    def node_mask(self) -> jnp.ndarray:
        """Alias so code generic over batch layouts can mask atoms."""
        return self.mask


def collate_dense(graphs: Sequence[dict], num_graphs: int, max_atoms: int,
                  y_dim: int = 1, with_forces: bool = False) -> DenseBatch:
    """Pack molecules into a dense batch (capacity errors are loud)."""
    if len(graphs) > num_graphs:
        raise ValueError(f"{len(graphs)} graphs > capacity {num_graphs}")
    z = np.zeros((num_graphs, max_atoms), np.int32)
    pos = np.zeros((num_graphs, max_atoms, 3), np.float32)
    mask = np.zeros((num_graphs, max_atoms), bool)
    gmask = np.zeros(num_graphs, bool)
    y = np.zeros((num_graphs, y_dim), np.float32)
    dy = np.zeros((num_graphs, max_atoms, 3), np.float32) if with_forces else None
    for g_idx, g in enumerate(graphs):
        gz = np.asarray(g["z"], np.int32)
        m = gz.shape[0]
        if m > max_atoms:
            raise ValueError(f"molecule with {m} atoms > capacity {max_atoms}")
        z[g_idx, :m] = gz
        pos[g_idx, :m] = np.asarray(g["pos"], np.float32)
        mask[g_idx, :m] = True
        gmask[g_idx] = True
        if "y" in g and g["y"] is not None:
            y[g_idx] = np.asarray(g["y"], np.float32).reshape(-1)[:y_dim]
        if with_forces and "dy" in g and g["dy"] is not None:
            dy[g_idx, :m] = np.asarray(g["dy"], np.float32)
    return DenseBatch(
        z=jnp.asarray(z), pos=jnp.asarray(pos), mask=jnp.asarray(mask),
        graph_mask=jnp.asarray(gmask), y=jnp.asarray(y),
        dy=jnp.asarray(dy) if dy is not None else None)


def pack_molecules(sizes: Sequence[int], max_atoms: int,
                   mols_per_slab: int) -> list:
    """First-fit-decreasing bin packing of molecules into slabs of
    ``max_atoms`` atom slots, at most ``mols_per_slab`` molecules per
    slab.  Returns a list of slabs, each a list of molecule indices.
    Deterministic (stable sort by size, ties by index), so tests and
    collators can reproduce the assignment independently."""
    order = sorted(range(len(sizes)), key=lambda i: (-int(sizes[i]), i))
    slabs: list = []           # parallel lists: free slots, members
    free: list = []
    for i in order:
        m = int(sizes[i])
        if m > max_atoms:
            raise ValueError(
                f"molecule with {m} atoms > slab capacity {max_atoms}")
        for s, f in enumerate(free):
            if f >= m and len(slabs[s]) < mols_per_slab:
                slabs[s].append(i)
                free[s] -= m
                break
        else:
            slabs.append([i])
            free.append(max_atoms - m)
    return slabs


def collate_dense_packed(graphs: Sequence[dict], num_slabs: int,
                         max_atoms: int, mols_per_slab: int,
                         y_dim: int = 1,
                         with_forces: bool = False) -> DenseBatch:
    """Block-diagonally pack molecules into ``num_slabs`` slabs of
    ``max_atoms`` slots (first-fit decreasing).  The model masks
    cross-molecule pairs via ``seg``, so each slab computes several
    independent molecules in one [M, M] pair block (the dense-layout
    analog of the reference's graph concatenation,
    /root/reference/gotennet/datamodules/datamodule.py:181-219).
    Raises ``ValueError('slab capacity ...')`` when the packing needs
    more slabs than ``num_slabs`` (loaders rebucket on that signal)."""
    sizes = [len(np.asarray(g["z"])) for g in graphs]
    slabs = pack_molecules(sizes, max_atoms, mols_per_slab)
    if len(slabs) > num_slabs:
        raise ValueError(
            f"slab capacity {num_slabs} exceeded: packing {len(graphs)} "
            f"molecules needs {len(slabs)} slabs of {max_atoms}")
    z = np.zeros((num_slabs, max_atoms), np.int32)
    pos = np.zeros((num_slabs, max_atoms, 3), np.float32)
    mask = np.zeros((num_slabs, max_atoms), bool)
    seg = np.zeros((num_slabs, max_atoms), np.int32)
    gmask = np.zeros((num_slabs, mols_per_slab), bool)
    y = np.zeros((num_slabs, mols_per_slab, y_dim), np.float32)
    dy = (np.zeros((num_slabs, max_atoms, 3), np.float32)
          if with_forces else None)
    for s, members in enumerate(slabs):
        off = 0
        for local, i in enumerate(members):
            g = graphs[i]
            m = sizes[i]
            sl = slice(off, off + m)
            z[s, sl] = np.asarray(g["z"], np.int32)
            pos[s, sl] = np.asarray(g["pos"], np.float32)
            mask[s, sl] = True
            seg[s, sl] = local
            gmask[s, local] = True
            if "y" in g and g["y"] is not None:
                y[s, local] = np.asarray(
                    g["y"], np.float32).reshape(-1)[:y_dim]
            if with_forces and "dy" in g and g["dy"] is not None:
                dy[s, sl] = np.asarray(g["dy"], np.float32)
            off += m
    return DenseBatch(
        z=jnp.asarray(z), pos=jnp.asarray(pos), mask=jnp.asarray(mask),
        graph_mask=jnp.asarray(gmask), y=jnp.asarray(y),
        dy=jnp.asarray(dy) if dy is not None else None,
        seg=jnp.asarray(seg))


def flatten_nodes(batch: DenseBatch) -> GraphBatch:
    """View the dense batch as a flat node set (no edges) so the output
    heads and graph reductions can reuse the GraphBatch code path.
    Packed batches flatten their (slab, local) molecule slots to a
    ``[G * P]`` graph axis: ``node_graph = slab * P + seg``."""
    g, m = batch.z.shape
    if batch.seg is None:
        node_graph = jnp.repeat(jnp.arange(g, dtype=jnp.int32), m)
        y, gmask = batch.y, batch.graph_mask
    else:
        p = batch.graph_mask.shape[1]
        node_graph = (jnp.arange(g, dtype=jnp.int32)[:, None] * p
                      + batch.seg.astype(jnp.int32)).reshape(-1)
        y = batch.y.reshape(g * p, -1)
        gmask = batch.graph_mask.reshape(-1)
    empty = jnp.zeros((0,), jnp.int32)
    return GraphBatch(
        z=batch.z.reshape(-1),
        pos=batch.pos.reshape(-1, 3),
        node_graph=node_graph,
        edge_src=empty, edge_dst=empty,
        node_mask=batch.mask.reshape(-1),
        edge_mask=jnp.zeros((0,), bool),
        graph_mask=gmask,
        y=y,
        dy=batch.dy.reshape(-1, 3) if batch.dy is not None else None,
    )
