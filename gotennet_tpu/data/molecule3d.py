"""Molecule3D dataset ingestion (ground-state geometries + properties).

Molecule3D distributes ~3.9M PubChemQC molecules as SDF shards plus a
CSV of properties; at that scale the in-memory path below is for
subsets/prototyping, and the intended production path is sharded NPZ
(``save_shards`` / ``iter_shards``) feeding per-host loaders — each
host of a multi-host run reads a disjoint shard range (the
Molecule3D multi-host config in BASELINE.json).

No network egress here: point ``root`` at an existing copy.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional

import numpy as np

from gotennet_tpu.data.dataset import MoleculeDataset
from gotennet_tpu.data.qm9 import _parse_sdf_coords  # shared V2000 parser

__all__ = ["load_molecule3d", "load_molecule3d_sdf", "save_shards",
           "iter_shards", "shard_range_for_host", "is_shard_dir"]


def is_shard_dir(root: str) -> bool:
    """True when ``root`` holds processed NPZ shards (the multi-host
    production layout written by ``save_shards``)."""
    return bool(glob.glob(os.path.join(root, "shard_*.npz")))


def load_molecule3d(root: str, label: Optional[str] = None,
                    max_molecules: Optional[int] = None,
                    host: int = 0, n_hosts: int = 1) -> MoleculeDataset:
    """Load Molecule3D from ``root`` — the CLI entry point.

    Two layouts:
      * **NPZ shard dir** (``shard_*.npz`` from ``save_shards``): the
        production multi-host path — this host materializes only its
        ``shard_range_for_host`` slice, so no host ever reads the full
        3.9M-molecule set.
      * **raw SDF shards** (``*.sdf`` + optional ``properties.csv``
        whose rows align with the concatenated molecule order, column
        picked by ``label``): the prototyping path.
    """
    if is_shard_dir(root):
        zs: List[np.ndarray] = []
        poss: List[np.ndarray] = []
        ys: List[np.ndarray] = []
        for part in iter_shards(root, host, n_hosts):
            zs.extend(part.z)
            poss.extend(part.pos)
            if part.y is not None:
                ys.append(np.asarray(part.y))
            if max_molecules is not None and len(zs) >= max_molecules:
                break
        y = np.concatenate(ys)[:len(zs)] if ys else None
        if max_molecules is not None:
            zs, poss = zs[:max_molecules], poss[:max_molecules]
            y = y[:max_molecules] if y is not None else None
        return MoleculeDataset(z=zs, pos=poss, y=y)

    sdfs = sorted(glob.glob(os.path.join(root, "*.sdf")))
    if not sdfs:
        raise FileNotFoundError(
            f"no Molecule3D data under {root!r}: expected shard_*.npz "
            f"or *.sdf (+ properties.csv)")
    zs, poss = [], []
    for p in sdfs:
        remaining = (None if max_molecules is None
                     else max_molecules - len(zs))
        if remaining is not None and remaining <= 0:
            break
        part = load_molecule3d_sdf(p, None, max_molecules=remaining)
        zs.extend(part.z)
        poss.extend(part.pos)
    y = None
    csv = os.path.join(root, "properties.csv")
    if os.path.exists(csv):
        with open(csv) as f:
            header = f.readline().strip().split(",")
            col = header.index(label) if label else 1
            vals = []
            for _ in range(len(zs)):
                row = f.readline().strip().split(",")
                vals.append([float(row[col])])
        y = np.asarray(vals, np.float32)
    return MoleculeDataset(z=zs, pos=poss, y=y)


def load_molecule3d_sdf(sdf_path: str, properties_csv: Optional[str] = None,
                        target_col: Optional[str] = None,
                        max_molecules: Optional[int] = None
                        ) -> MoleculeDataset:
    """Parse one SDF shard (+ optional properties CSV keyed by index)."""
    with open(sdf_path) as f:
        lines = f.read().split("\n")
    zs, poss = [], []
    i = 0
    while i < len(lines) - 4:
        z, pos, i = _parse_sdf_coords(lines, i)
        if z is None:
            continue
        if (z > 0).all():
            zs.append(z)
            poss.append(pos)
        if max_molecules is not None and len(zs) >= max_molecules:
            break
    y = None
    if properties_csv is not None and os.path.exists(properties_csv):
        with open(properties_csv) as f:
            header = f.readline().strip().split(",")
            col = header.index(target_col) if target_col else 1
            vals = []
            for _ in range(len(zs)):
                row = f.readline().strip().split(",")
                vals.append([float(row[col])])
        y = np.asarray(vals, np.float32)
    return MoleculeDataset(z=zs, pos=poss, y=y)


def save_shards(ds: MoleculeDataset, out_dir: str,
                shard_size: int = 50_000) -> List[str]:
    """Write the dataset as fixed-size NPZ shards for multi-host reads."""
    from gotennet_tpu.data.qm9 import save_processed_qm9
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s, off in enumerate(range(0, len(ds), shard_size)):
        sub = ds.subset(range(off, min(off + shard_size, len(ds))))
        path = os.path.join(out_dir, f"shard_{s:05d}.npz")
        save_processed_qm9(path, sub)
        paths.append(path)
    return paths


def shard_range_for_host(n_shards: int, host: int, n_hosts: int):
    """Disjoint contiguous shard assignment per host."""
    per = (n_shards + n_hosts - 1) // n_hosts
    return range(host * per, min((host + 1) * per, n_shards))


def iter_shards(shard_dir: str, host: int = 0,
                n_hosts: int = 1) -> Iterator[MoleculeDataset]:
    """Yield this host's shards as MoleculeDatasets."""
    from gotennet_tpu.data.qm9 import _load_processed
    paths = sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz")))
    for idx in shard_range_for_host(len(paths), host, n_hosts):
        yield _load_processed(paths[idx])
