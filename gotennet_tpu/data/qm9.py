"""QM9 dataset ingestion without torch/PyG.

Capability equivalent of the reference's QM9 wrapper
(/root/reference/gotennet/datamodules/components/qm9.py): 12 regression
targets in the standard column order, atomref tables, per-target
statistics.  Ingestion paths, tried in order:

  1. A processed ``qm9_processed.npz`` under ``root`` (our format:
     concatenated z/pos with a ptr index plus the [n, 19] target
     matrix).
  2. The raw GDB-9 distribution (``gdb9.sdf`` + ``gdb9.sdf.csv`` +
     optional ``uncharacterized.txt``) parsed directly — unit
     conversions follow the standard QM9 conventions (energies
     Hartree -> eV, atomization energies kcal/mol -> eV).
  3. Auto-download of the raw files from the same sources the
     reference's PyG QM9 uses (``download_qm9``; ≙ _prepare_QM9,
     datamodule.py:91-120) when neither is present.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from gotennet_tpu.data.dataset import MoleculeDataset

__all__ = ["QM9_TARGETS", "qm9_atomref", "load_qm9", "save_processed_qm9"]

QM9_TARGETS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
               "U0", "U", "H", "G", "Cv"]

_HAR2EV = 27.211386246
_KCALMOL2EV = 0.04336414

# Per-target unit conversion in the reordered (mu-first) column order;
# 19 columns = 12 regression targets + U0_atom..G_atom + A, B, C.
_CONVERSION = np.asarray(
    [1.0, 1.0, _HAR2EV, _HAR2EV, _HAR2EV, 1.0, _HAR2EV, _HAR2EV, _HAR2EV,
     _HAR2EV, _HAR2EV, 1.0, _KCALMOL2EV, _KCALMOL2EV, _KCALMOL2EV,
     _KCALMOL2EV, 1.0, 1.0, 1.0], np.float64)

# Single-atom reference energies (eV) for H, C, N, O, F at z=1,6,7,8,9 —
# the QM9 distribution's atomref table for zpve/U0/U/H/G/Cv (public
# constants; the reference obtains the same numbers via PyG's QM9
# atomref, used at datamodule.py:244 and outputs.py:202).
_ATOMREF_RAW: Dict[str, list] = {
    "zpve": [0.0, 0.0, 0.0, 0.0, 0.0],
    "U0": [-13.61312172, -1029.86312267, -1485.30251237, -2042.61123593,
           -2713.48485589],
    "U": [-13.5745904, -1029.82456413, -1485.26398105, -2042.5727046,
          -2713.44632457],
    "H": [-13.54887564, -1029.79887659, -1485.2382935, -2042.54701705,
          -2713.42063702],
    "G": [-13.90303183, -1030.25891228, -1485.71166277, -2043.01812778,
          -2713.88796536],
    "Cv": [0.0, 0.0, 0.0, 0.0, 0.0],
}
_ATOMREF_Z = [1, 6, 7, 8, 9]

_SYMBOL_TO_Z = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}


def qm9_atomref(label: str, max_z: int = 100) -> Optional[np.ndarray]:
    """[max_z, 1] atomref table for a target, or None (reference
    qm9.py:189-207 zero-pads to max_z)."""
    if label not in _ATOMREF_RAW:
        return None
    table = np.zeros((max_z, 1), np.float32)
    for z, v in zip(_ATOMREF_Z, _ATOMREF_RAW[label]):
        table[z, 0] = v
    return table


def save_processed_qm9(path: str, ds: MoleculeDataset) -> None:
    ptr = np.cumsum([0] + [len(z) for z in ds.z])
    np.savez_compressed(
        path,
        z=np.concatenate(ds.z).astype(np.int32),
        pos=np.concatenate(ds.pos).astype(np.float32),
        ptr=ptr.astype(np.int64),
        y=ds.y.astype(np.float32),
    )


def _load_processed(path: str) -> MoleculeDataset:
    f = np.load(path)
    ptr = f["ptr"]
    z = [f["z"][ptr[i]:ptr[i + 1]] for i in range(len(ptr) - 1)]
    pos = [f["pos"][ptr[i]:ptr[i + 1]] for i in range(len(ptr) - 1)]
    return MoleculeDataset(z=z, pos=pos, y=f["y"])


def _parse_sdf_coords(lines, start):
    """Parse one V2000 mol block starting at ``lines[start]``; returns
    (z, pos, next_index) or (None, None, next_index) on failure."""
    try:
        counts = lines[start + 3]
        n_atoms = int(counts[:3])
    except (IndexError, ValueError):
        return None, None, start + 1
    z = np.zeros(n_atoms, np.int32)
    pos = np.zeros((n_atoms, 3), np.float32)
    for i in range(n_atoms):
        ln = lines[start + 4 + i]
        pos[i] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
        z[i] = _SYMBOL_TO_Z.get(ln[31:34].strip(), 0)
    # advance to the end-of-record marker
    j = start + 4 + n_atoms
    while j < len(lines) and lines[j].strip() != "$$$$":
        j += 1
    return z, pos, j + 1


# The raw-data URLs the reference's PyG QM9 dataset downloads from
# (torch_geometric.datasets.QM9.raw_url/raw_url2, reached via
# datamodule.py:91-120 _prepare_QM9 on first use)
QM9_RAW_URL = ("https://deepchemdata.s3-us-west-1.amazonaws.com/"
               "datasets/molnet_publish/qm9.zip")
QM9_UNCHAR_URL = "https://ndownloader.figshare.com/files/3195404"


def download_qm9(root: str) -> None:
    """Fetch the raw GDB-9 distribution into ``root``: qm9.zip
    (gdb9.sdf + gdb9.sdf.csv) and uncharacterized.txt — the same
    sources the reference's PyG QM9 dataset uses.  Skips files already
    present; raises with a pointer to manual placement when there is
    no network egress."""
    import zipfile

    from gotennet_tpu.utils.hub import download_file

    os.makedirs(root, exist_ok=True)
    sdf = os.path.join(root, "gdb9.sdf")
    csv = os.path.join(root, "gdb9.sdf.csv")
    if not (os.path.exists(sdf) and os.path.exists(csv)):
        zpath = download_file(QM9_RAW_URL, os.path.join(root, "qm9.zip"))
        with zipfile.ZipFile(zpath) as zf:
            for name in zf.namelist():
                base = os.path.basename(name)
                if base in ("gdb9.sdf", "gdb9.sdf.csv"):
                    with zf.open(name) as src, \
                            open(os.path.join(root, base), "wb") as dst:
                        dst.write(src.read())
        os.remove(zpath)
    unchar = os.path.join(root, "uncharacterized.txt")
    if not os.path.exists(unchar):
        download_file(QM9_UNCHAR_URL, unchar)


def load_qm9(root: str, label: Optional[str] = None,
             max_z: int = 100, download: bool = True) -> MoleculeDataset:
    """Load QM9 from ``root``; ``y`` is [n, 19] (12 targets + extras) or
    filtered to one column when ``label`` is given (matching the
    reference's _filter_label, qm9.py:209-220).  Missing raw files are
    downloaded first when ``download`` (≙ reference _prepare_QM9 ->
    PyG QM9 auto-download, datamodule.py:91-120)."""
    processed = os.path.join(root, "qm9_processed.npz")
    if os.path.exists(processed):
        ds = _load_processed(processed)
    else:
        sdf = os.path.join(root, "gdb9.sdf")
        csv = os.path.join(root, "gdb9.sdf.csv")
        if download and not (os.path.exists(sdf) and os.path.exists(csv)):
            try:
                download_qm9(root)
            except Exception as e:
                raise FileNotFoundError(
                    f"No QM9 data under {root} and the download from "
                    f"{QM9_RAW_URL} failed ({e}); place gdb9.sdf + "
                    "gdb9.sdf.csv (+ optional uncharacterized.txt) or "
                    "qm9_processed.npz there manually") from e
        if not (os.path.exists(sdf) and os.path.exists(csv)):
            raise FileNotFoundError(
                f"No QM9 data under {root}: expected qm9_processed.npz or "
                "gdb9.sdf + gdb9.sdf.csv")
        with open(csv) as f:
            rows = f.read().strip().split("\n")[1:]
        target = np.asarray(
            [[float(x) for x in r.split(",")[1:20]] for r in rows],
            np.float64)
        # reorder: [mu..Cv, U0_atom.., A, B, C] then unit conversion
        target = np.concatenate([target[:, 3:], target[:, :3]], axis=1)
        target = (target * _CONVERSION[None, :]).astype(np.float32)

        skip = set()
        unchar = os.path.join(root, "uncharacterized.txt")
        if os.path.exists(unchar):
            with open(unchar) as f:
                for ln in f.read().split("\n")[9:-2]:
                    parts = ln.split()
                    if parts:
                        skip.add(int(parts[0]) - 1)

        with open(sdf) as f:
            lines = f.read().split("\n")
        zs, poss, keep = [], [], []
        i = 0
        mol_idx = 0
        while i < len(lines) - 4:
            z, pos, i = _parse_sdf_coords(lines, i)
            if z is None:
                continue
            if mol_idx not in skip and (z > 0).all():
                zs.append(z)
                poss.append(pos)
                keep.append(mol_idx)
            mol_idx += 1
        ds = MoleculeDataset(z=zs, pos=poss, y=target[np.asarray(keep)])
        save_processed_qm9(processed, ds)

    if label is not None:
        idx = QM9_TARGETS.index(label)
        ds = MoleculeDataset(z=ds.z, pos=ds.pos, y=ds.y[:, idx:idx + 1],
                             atomref=qm9_atomref(label, max_z))
    return ds
