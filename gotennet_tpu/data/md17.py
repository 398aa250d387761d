"""rMD17 / MD22 trajectory datasets (energy + forces).

The reference validates rMD17 checkpoint aliases but ships no loader
(utils/file.py:193-196); here molecular-dynamics datasets are first
class.  Supported on-disk formats (no network in this environment —
point ``path`` at an existing copy):

  * revised-MD17 NPZ: ``nuclear_charges [N]``, ``coords [S, N, 3]``,
    ``energies [S]``, ``forces [S, N, 3]``.
  * sGDML-style NPZ (MD17/MD22 distributions): ``z [N]``,
    ``R [S, N, 3]``, ``E [S, 1]``, ``F [S, N, 3]``.
  * extended XYZ: repeated blocks of ``N / comment(E=...) / N lines``.

All frames share one topology; the loader returns a
``MoleculeDataset`` with per-frame positions, energies and forces.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

from gotennet_tpu.data.dataset import MoleculeDataset

__all__ = ["load_md_npz", "load_xyz", "load_md_dataset", "MD17_MOLECULES",
           "MD22_MOLECULES"]

MD17_MOLECULES = ["aspirin", "azobenzene", "benzene", "ethanol",
                  "malonaldehyde", "naphthalene", "paracetamol",
                  "salicylic", "toluene", "uracil"]
MD22_MOLECULES = ["Ac-Ala3-NHMe", "DHA", "stachyose", "AT-AT",
                  "AT-AT-CG-CG", "buckyball-catcher",
                  "double-walled_nanotube"]

_SYMBOL_TO_Z = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20,
}


def load_md_npz(path: str, max_frames: Optional[int] = None
                ) -> MoleculeDataset:
    """Load an rMD17- or sGDML-format NPZ trajectory."""
    f = np.load(path)
    if "nuclear_charges" in f:       # revised MD17
        z = np.asarray(f["nuclear_charges"], np.int32)
        coords = np.asarray(f["coords"], np.float32)
        energies = np.asarray(f["energies"], np.float64).reshape(-1)
        forces = np.asarray(f["forces"], np.float32)
    elif "z" in f and "R" in f:      # sGDML (MD17/MD22)
        z = np.asarray(f["z"], np.int32).reshape(-1)
        coords = np.asarray(f["R"], np.float32)
        energies = np.asarray(f["E"], np.float64).reshape(-1)
        forces = np.asarray(f["F"], np.float32)
    else:
        raise ValueError(
            f"{path}: unrecognized NPZ keys {sorted(f.keys())}")
    s = coords.shape[0] if max_frames is None else min(coords.shape[0],
                                                       max_frames)
    return MoleculeDataset(
        z=[z] * s,
        pos=[coords[i] for i in range(s)],
        y=energies[:s, None].astype(np.float32),
        dy=[forces[i] for i in range(s)],
    )


_E_RE = re.compile(r"(?:E|energy)\s*=\s*([-+0-9.eE]+)")


def load_xyz(path: str, max_frames: Optional[int] = None
             ) -> MoleculeDataset:
    """Parse a (multi-frame) XYZ file; energy read from the comment
    line when present (``E=...`` / ``energy=...``)."""
    zs, poss, ys = [], [], []
    with open(path) as fh:
        lines = fh.read().split("\n")
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i].strip())
        comment = lines[i + 1]
        m = _E_RE.search(comment)
        e = float(m.group(1)) if m else 0.0
        z = np.zeros(n, np.int32)
        pos = np.zeros((n, 3), np.float32)
        for a in range(n):
            parts = lines[i + 2 + a].split()
            sym = parts[0]
            z[a] = (_SYMBOL_TO_Z[sym] if not sym.isdigit() else int(sym))
            pos[a] = [float(x) for x in parts[1:4]]
        zs.append(z)
        poss.append(pos)
        ys.append([e])
        i += 2 + n
        if max_frames is not None and len(zs) >= max_frames:
            break
    return MoleculeDataset(z=zs, pos=poss,
                           y=np.asarray(ys, np.float32))


def load_md_dataset(root: str, molecule: str,
                    max_frames: Optional[int] = None) -> MoleculeDataset:
    """Find and load a molecule's trajectory under ``root`` by common
    file-name conventions."""
    candidates = [
        os.path.join(root, f"rmd17_{molecule}.npz"),
        os.path.join(root, f"md17_{molecule}.npz"),
        os.path.join(root, f"md22_{molecule}.npz"),
        os.path.join(root, f"{molecule}.npz"),
        os.path.join(root, f"{molecule}.xyz"),
    ]
    for c in candidates:
        if os.path.exists(c):
            if c.endswith(".npz"):
                return load_md_npz(c, max_frames)
            return load_xyz(c, max_frames)
    raise FileNotFoundError(
        f"no trajectory for {molecule!r} under {root} "
        f"(tried {[os.path.basename(c) for c in candidates]})")
