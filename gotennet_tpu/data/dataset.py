"""In-memory molecular datasets + loaders emitting static-shape batches.

Replaces the reference's PyG dataset / torch DataLoader stack
(/root/reference/gotennet/datamodules/) with a NumPy pipeline: molecules
live as ragged arrays on host, a ``BatchLoader`` shuffles, packs them
into fixed-capacity ``GraphBatch`` buffers (bucketed so XLA compiles a
handful of shapes), and hands devices a steady stream of identical
pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from gotennet_tpu.graph.batch import GraphBatch
from gotennet_tpu.graph.neighborlist import collate_graphs

__all__ = ["MoleculeDataset", "BatchLoader", "DenseLoader", "ELLLoader",
           "make_splits", "synthetic_molecules", "standardize_energy",
           "center_positions"]


@dataclasses.dataclass
class MoleculeDataset:
    """Ragged molecule storage: lists of per-molecule arrays."""

    z: List[np.ndarray]          # [M_i] int
    pos: List[np.ndarray]        # [M_i, 3] float
    y: Optional[np.ndarray] = None   # [n, T] graph targets
    dy: Optional[List[np.ndarray]] = None  # [M_i, 3] forces
    atomref: Optional[np.ndarray] = None   # [max_z, 1]

    def __len__(self) -> int:
        return len(self.z)

    def subset(self, idx: Sequence[int]) -> "MoleculeDataset":
        idx = np.asarray(idx)
        return MoleculeDataset(
            z=[self.z[i] for i in idx],
            pos=[self.pos[i] for i in idx],
            y=self.y[idx] if self.y is not None else None,
            dy=[self.dy[i] for i in idx] if self.dy is not None else None,
            atomref=self.atomref,
        )

    def graph_dicts(self, idx: Sequence[int]) -> List[dict]:
        out = []
        for i in idx:
            g = {"z": self.z[i], "pos": self.pos[i]}
            if self.y is not None:
                g["y"] = self.y[i]
            if self.dy is not None:
                g["dy"] = self.dy[i]
            out.append(g)
        return out


def make_splits(n: int, train_size, val_size, test_size, seed: int,
                save_path: Optional[str] = None,
                splits_path: Optional[str] = None):
    """Seeded permutation split; sizes may be int, float fraction, or
    None (= remainder).  Mirrors the reference's make_splits
    (/root/reference/gotennet/datamodules/components/utils.py:6-135),
    including persisting/reloading ``splits.npz``."""
    if splits_path is not None:
        f = np.load(splits_path)
        return f["idx_train"], f["idx_val"], f["idx_test"]

    def resolve(size):
        if size is None:
            return None
        if isinstance(size, float):
            return int(round(size * n))
        return int(size)

    tr, va, te = resolve(train_size), resolve(val_size), resolve(test_size)
    none_count = sum(x is None for x in (tr, va, te))
    if none_count > 1:
        raise ValueError("at most one of the split sizes may be None")
    if tr is None:
        tr = n - va - te
    elif va is None:
        va = n - tr - (te or 0)
        if te is None:
            raise ValueError("ambiguous: two None sizes")
    if te is None:
        te = n - tr - va
    if tr + va + te > n:
        raise ValueError(f"splits {tr}+{va}+{te} exceed dataset size {n}")

    perm = np.random.default_rng(seed).permutation(n)
    idx_train = perm[:tr]
    idx_val = perm[tr:tr + va]
    idx_test = perm[tr + va:tr + va + te]
    if save_path is not None:
        np.savez(save_path, idx_train=idx_train, idx_val=idx_val,
                 idx_test=idx_test)
    return idx_train, idx_val, idx_test


def center_positions(ds: MoleculeDataset) -> MoleculeDataset:
    """Subtract each molecule's center of mass from its positions
    (reference ``normalize_positions`` transform, applied at dataset
    load when the datamodule hparam is set —
    /root/reference/gotennet/datamodules/datamodule.py:19-31)."""
    from gotennet_tpu.models.heads import ATOMIC_MASSES

    masses = np.asarray(ATOMIC_MASSES, np.float64)
    pos = []
    for z, p in zip(ds.z, ds.pos):
        w = masses[np.asarray(z)]
        com = (w[:, None] * p).sum(0) / w.sum()
        pos.append((p - com).astype(p.dtype))
    return dataclasses.replace(ds, pos=pos)


def standardize_energy(ds: MoleculeDataset, idx: Sequence[int],
                       label_col: int = 0,
                       use_atomref: bool = True):
    """Mean/std of the target over a split, minus per-molecule atomref
    sums when available (reference _standardize,
    datamodule.py:221-268)."""
    ys = []
    for i in idx:
        y = float(ds.y[i, label_col])
        if use_atomref and ds.atomref is not None:
            y -= float(ds.atomref[ds.z[i], 0].sum())
        ys.append(y)
    ys = np.asarray(ys, np.float64)
    return float(ys.mean()), float(ys.std(ddof=1))


def synthetic_molecules(n: int, seed: int = 0, min_atoms: int = 6,
                        max_atoms: int = 24, box: float = 4.0,
                        with_forces: bool = False) -> MoleculeDataset:
    """Random QM9-like molecules for tests and benchmarks: organic atom
    types, positions spread so typical neighbor counts match a 5 A
    cutoff, and a smooth synthetic target (sum of pair potentials) so
    training has signal."""
    rng = np.random.default_rng(seed)
    zs, poss, ys, dys = [], [], [], []
    types = np.asarray([1, 6, 7, 8, 9])
    probs = np.asarray([0.5, 0.3, 0.1, 0.08, 0.02])
    for _ in range(n):
        m = int(rng.integers(min_atoms, max_atoms + 1))
        z = rng.choice(types, size=m, p=probs).astype(np.int32)
        pos = (rng.random((m, 3)) - 0.5) * box * (m / 12.0) ** (1 / 3)
        # synthetic smooth energy: sum of Gaussian pair terms
        diff = pos[:, None] - pos[None, :]
        d2 = (diff ** 2).sum(-1)
        w = z[:, None] * z[None, :]
        np.fill_diagonal(d2, np.inf)
        e = float((w * np.exp(-d2)).sum()) * 0.01
        zs.append(z)
        poss.append(pos.astype(np.float32))
        ys.append([e])
        if with_forces:
            g = np.zeros_like(pos)
            k = w[..., None] * np.exp(-d2)[..., None] * (-2.0 * diff)
            g = 0.01 * 2.0 * np.nansum(
                np.where(np.isfinite(d2)[..., None], k, 0.0), axis=1)
            dys.append((-g).astype(np.float32))
    return MoleculeDataset(
        z=zs, pos=poss, y=np.asarray(ys, np.float32),
        dy=dys if with_forces else None)


class BatchLoader:
    """Iterates fixed-capacity GraphBatches over a dataset split.

    Capacities are derived once from the split's size statistics (with
    slack) so every batch reuses the same compiled executable.  The
    final short batch is padded with dummy graphs — masks keep the math
    exact.

    Capacity safety: the edge capacity starts from a degree probe over
    ``neighbor_probe`` molecules (or every molecule with
    ``neighbor_probe='full'`` — exact, and cheap with the C++ cell
    list).  If an unprobed outlier still overflows mid-epoch, the
    loader *rebuckets*: it grows the edge capacity, re-collates the
    offending batch, and keeps the larger capacity — one extra XLA
    compile instead of a crashed run or silent truncation.
    """

    def __init__(self, ds: MoleculeDataset, batch_size: int,
                 cutoff: float = 5.0, shuffle: bool = False, seed: int = 0,
                 max_num_neighbors: int = 32, loop: bool = True,
                 node_capacity: Optional[int] = None,
                 edge_capacity: Optional[int] = None,
                 drop_last: bool = False,
                 neighbor_probe: "int | str" = 64):
        self.ds = ds
        self.batch_size = batch_size
        self.cutoff = cutoff
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.max_num_neighbors = max_num_neighbors
        self.loop = loop
        self.drop_last = drop_last

        if node_capacity is None or edge_capacity is None:
            sizes = np.asarray([len(z) for z in ds.z])
            if neighbor_probe == "full":
                probe = np.arange(len(ds))
            else:
                probe = np.linspace(0, len(ds) - 1,
                                    min(len(ds), int(neighbor_probe))
                                    ).astype(int)
            from gotennet_tpu.graph.native import build_edges
            e_per_node = []
            for i in probe:
                src, _ = build_edges(ds.pos[i], cutoff, loop,
                                     max_num_neighbors)
                e_per_node.append(len(src) / max(len(ds.z[i]), 1))
            deg = max(e_per_node) if e_per_node else 8.0
            n_cap = int(np.sort(sizes)[-min(batch_size, len(sizes)):].sum())
            node_capacity = node_capacity or _round_up(n_cap + 8, 8)
            slack = 1.0 if neighbor_probe == "full" else 1.15
            edge_capacity = edge_capacity or _round_up(
                int(node_capacity * deg * slack) + 16, 128)
        self.node_capacity = node_capacity
        self.edge_capacity = edge_capacity
        self.with_forces = ds.dy is not None

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Make the shuffle a pure function of (seed, epoch) so a
        resumed run reproduces the uninterrupted run's batch order
        (≙ torch DistributedSampler.set_epoch)."""
        self.rng = np.random.default_rng([self.seed, epoch])

    # -- multi-host sharding (≙ torch DistributedSampler) ---------------
    world: int = 1
    rank: int = 0
    pad_shard: bool = False

    def set_shard(self, world: int, rank: int, pad: bool = False) -> None:
        """Restrict iteration to every ``world``-th batch starting at
        ``rank``.  Every process computes the same global batch order
        (shared seed + set_epoch), so sharding at batch granularity
        reproduces the single-process device groups exactly.  With
        ``pad=False`` (training) trailing batches that don't fill every
        rank are dropped so all hosts run the same number of steps;
        with ``pad=True`` (evaluation) ranks wrap around to the start,
        so duplicated batches keep collective call counts aligned at
        the cost of slightly over-counting those molecules in metrics
        (torch DistributedSampler's padding semantics)."""
        if world < 1 or not (0 <= rank < world):
            raise ValueError(f"bad shard ({world=}, {rank=})")
        self.world = world
        self.rank = rank
        self.pad_shard = pad

    def _shard_batch_indices(self, n_batches: int) -> List[int]:
        if self.world == 1:
            return list(range(n_batches))
        if self.pad_shard:
            total = -(-n_batches // self.world) * self.world
            return [i % n_batches
                    for i in range(self.rank, total, self.world)]
        usable = (n_batches // self.world) * self.world
        return list(range(self.rank, usable, self.world))

    def _collate(self, graphs, y_dim):
        return collate_graphs(
            graphs, self.node_capacity, self.edge_capacity,
            self.batch_size, cutoff=self.cutoff, loop=self.loop,
            max_num_neighbors=self.max_num_neighbors, y_dim=y_dim,
            with_forces=self.with_forces)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stop = len(self.ds) - (len(self.ds) % bs if self.drop_last else 0)
        y_dim = self.ds.y.shape[1] if self.ds.y is not None else 1
        n_batches = len(range(0, stop, bs))
        for b_idx in self._shard_batch_indices(n_batches):
            off = b_idx * bs
            idx = order[off:off + bs]
            graphs = self.ds.graph_dicts(idx)
            while True:
                try:
                    yield self._collate(graphs, y_dim)
                    break
                except ValueError as e:
                    if "edge capacity" not in str(e):
                        raise
                    new_cap = _round_up(
                        int(self.edge_capacity * 1.5) + 128, 128)
                    from gotennet_tpu.utils.logging import get_logger
                    get_logger().warning(
                        "edge capacity %d overflowed at batch offset %d; "
                        "rebucketing to %d (triggers one recompile)",
                        self.edge_capacity, off, new_cap)
                    self.edge_capacity = new_cap


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ELLLoader:
    """Iterates fixed-capacity ELLBatches ([N, K] neighbor rows) over a
    dataset split — the input pipeline for the ELL (padded-neighbor)
    model layout.  ``max_neighbors`` defaults to the max degree found
    by a probe (or the whole dataset with ``neighbor_probe='full'``),
    rounded up to a multiple of 4; overflow rebuckets like BatchLoader.
    """

    def __init__(self, ds: MoleculeDataset, batch_size: int,
                 cutoff: float = 5.0, shuffle: bool = False, seed: int = 0,
                 max_num_neighbors: int = 32, loop: bool = True,
                 node_capacity: Optional[int] = None,
                 max_neighbors: Optional[int] = None,
                 drop_last: bool = False,
                 neighbor_probe: "int | str" = 64,
                 spatial_sort: bool = False,
                 block_rows: Optional[int] = None):
        self.ds = ds
        self.batch_size = batch_size
        self.cutoff = cutoff
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.max_num_neighbors = max_num_neighbors
        self.loop = loop
        self.drop_last = drop_last
        # windowed one-hot gathers (the 10^3-atom path): spatially sort
        # atoms and emit per-block gather windows; see
        # models/gotennet_ell.py:_gather_fn
        self.spatial_sort = spatial_sort
        self.block_rows = block_rows

        sizes = np.asarray([len(z) for z in ds.z])
        if node_capacity is None:
            n_cap = int(np.sort(sizes)[-min(batch_size, len(sizes)):].sum())
            node_capacity = _round_up(n_cap + 8, 8)
        if block_rows:
            node_capacity = _round_up(node_capacity, block_rows)
        if max_neighbors is None:
            if neighbor_probe == "full":
                probe = np.arange(len(ds))
            else:
                probe = np.linspace(0, len(ds) - 1,
                                    min(len(ds), int(neighbor_probe))
                                    ).astype(int)
            from gotennet_tpu.graph.native import build_edges
            deg = 1
            for i in probe:
                _, dst = build_edges(ds.pos[i], cutoff, loop,
                                     max_num_neighbors)
                if len(dst):
                    deg = max(deg, int(np.bincount(dst).max()))
            if neighbor_probe != "full":
                deg = min(int(deg * 1.25) + 1,
                          max_num_neighbors + (1 if loop else 0))
            max_neighbors = _round_up(deg, 4)
        self.node_capacity = node_capacity
        self.max_neighbors = max_neighbors
        self.with_forces = ds.dy is not None

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    set_epoch = BatchLoader.set_epoch
    set_shard = BatchLoader.set_shard
    _shard_batch_indices = BatchLoader._shard_batch_indices
    world, rank, pad_shard = 1, 0, False

    def __iter__(self):
        from gotennet_tpu.graph.ell_batch import collate_ell
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stop = len(self.ds) - (len(self.ds) % bs if self.drop_last else 0)
        y_dim = self.ds.y.shape[1] if self.ds.y is not None else 1
        n_batches = len(range(0, stop, bs))
        for b_idx in self._shard_batch_indices(n_batches):
            off = b_idx * bs
            graphs = self.ds.graph_dicts(order[off:off + bs])
            while True:
                try:
                    yield collate_ell(
                        graphs, self.node_capacity, self.max_neighbors,
                        self.batch_size, cutoff=self.cutoff,
                        loop=self.loop,
                        max_num_neighbors=self.max_num_neighbors,
                        y_dim=y_dim, with_forces=self.with_forces,
                        block_rows=self.block_rows,
                        spatial_sort=self.spatial_sort)
                    break
                except ValueError as e:
                    if "neighbor capacity" not in str(e):
                        raise
                    new_k = _round_up(self.max_neighbors + 4, 4)
                    from gotennet_tpu.utils.logging import get_logger
                    get_logger().warning(
                        "neighbor capacity %d overflowed; rebucketing "
                        "to %d", self.max_neighbors, new_k)
                    self.max_neighbors = new_k


class DenseLoader:
    """Iterates fixed-capacity DenseBatches ([G, M] blocks) over a
    dataset split — the input pipeline for the dense-block (MXU) model
    layout.  ``max_atoms`` defaults to the split's largest molecule,
    rounded up to a multiple of 8 (sublane tile).

    Size bucketing (``bucket=True``): pair tensors are O(M^2), so
    padding every batch to the split's global max M wastes ~2.5x at
    QM9's 12-29-atom spread.  Bucketing shuffles molecules, sorts them
    by size inside windows of ``bucket_window`` batches, and pads each
    batch only to its own max rounded up to a multiple of 8 — a
    handful of compiled M shapes (16/24/32 at QM9) instead of one,
    and ~1.7x fewer padded pairs.  Batches stay size-sorted within a
    window (not re-shuffled) so gradient-accumulation chunks stack
    same-M batches; the window order itself is random.  ≙ PyG's
    ragged batching paying no padding (reference
    datamodule.py:181-219)."""

    def __init__(self, ds: MoleculeDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 max_atoms: Optional[int] = None,
                 drop_last: bool = False,
                 bucket: bool = False,
                 bucket_window: int = 16,
                 pack: bool = False,
                 mols_per_slab: Optional[int] = None):
        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        if max_atoms is None:
            max_atoms = max((len(z) for z in ds.z), default=1)
        self.max_atoms = _round_up(max_atoms, 8)
        self.bucket = bucket
        self.bucket_window = bucket_window
        self.with_forces = ds.dy is not None
        # block-diagonal packing (collate_dense_packed): several
        # molecules share each M-slot slab, cross-molecule pairs are
        # masked by the model.  Slab capacity is estimated from the
        # dataset's mean size with 6% slack for first-fit-decreasing
        # inefficiency; a batch that packs worse rebuckets (grows the
        # capacity, one extra compile) like BatchLoader does for edges.
        self.pack = pack
        if pack:
            sizes = np.asarray([len(z) for z in ds.z])
            if mols_per_slab is None:
                mols_per_slab = int(min(
                    8, max(1, self.max_atoms // max(1, sizes.min()))))
            self.mols_per_slab = mols_per_slab
            mean = float(sizes.mean()) if len(sizes) else 1.0
            self.num_slabs = max(1, int(np.ceil(
                batch_size * mean / self.max_atoms * 1.06)) + 1)

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    set_epoch = BatchLoader.set_epoch
    set_shard = BatchLoader.set_shard
    _shard_batch_indices = BatchLoader._shard_batch_indices
    world, rank, pad_shard = 1, 0, False

    def _batch_index_arrays(self, order) -> List[np.ndarray]:
        """Split the (possibly shuffled) molecule order into per-batch
        index arrays; with bucketing, sort by size inside windows of
        ``bucket_window`` batches first."""
        bs = self.batch_size
        stop = len(order) - (len(order) % bs if self.drop_last else 0)
        order = order[:stop]
        if not self.bucket:
            return [order[off:off + bs] for off in range(0, stop, bs)]
        window = bs * max(1, self.bucket_window)
        sizes = np.asarray([len(z) for z in self.ds.z])
        out = []
        for wstart in range(0, stop, window):
            w = order[wstart:wstart + window]
            w = w[np.argsort(sizes[w], kind="stable")]
            out.extend(w[o:o + bs] for o in range(0, len(w), bs))
        return out

    def __iter__(self):
        from gotennet_tpu.graph.dense_batch import (
            collate_dense,
            collate_dense_packed,
        )
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        y_dim = self.ds.y.shape[1] if self.ds.y is not None else 1
        batches = self._batch_index_arrays(order)
        sizes = np.asarray([len(z) for z in self.ds.z]) if self.bucket \
            else None
        for b_idx in self._shard_batch_indices(len(batches)):
            idx = batches[b_idx]
            if self.pack:
                while True:
                    try:
                        yield collate_dense_packed(
                            self.ds.graph_dicts(idx), self.num_slabs,
                            self.max_atoms, self.mols_per_slab,
                            y_dim=y_dim, with_forces=self.with_forces)
                        break
                    except ValueError as e:
                        if "slab capacity" not in str(e):
                            raise
                        self.num_slabs += max(1, self.num_slabs // 16)
                        from gotennet_tpu.utils.logging import get_logger
                        get_logger().warning(
                            "packed slab capacity overflowed; growing "
                            "to %d (one recompile)", self.num_slabs)
                continue
            m = self.max_atoms if not self.bucket else min(
                self.max_atoms,
                _round_up(max(8, int(sizes[idx].max())), 8))
            yield collate_dense(self.ds.graph_dicts(idx),
                                self.batch_size, m, y_dim=y_dim,
                                with_forces=self.with_forces)
