"""Molecule3D end-to-end: fabricated SDF shards + properties.csv (and
NPZ shards with per-host assignment) through the full CLI train
pipeline (`cli train experiment=molecule3d`) — the BASELINE.json
multi-host workload's single-host slice."""

import os

import numpy as np
import pytest

from gotennet_tpu.cli import CONFIG_DIR, train
from gotennet_tpu.data.dataset import synthetic_molecules
from gotennet_tpu.utils.config import load_config

_SYM = {1: "H", 6: "C", 7: "N", 8: "O", 9: "F"}


def _write_sdf(path, ds, start, stop):
    """Minimal V2000 writer matching data.qm9._parse_sdf_coords."""
    with open(path, "w") as f:
        for i in range(start, stop):
            z, pos = ds.z[i], ds.pos[i]
            f.write("mol\n fabricated\n\n")
            f.write(f"{len(z):3d}{0:3d}  0  0  0  0  0  0  0  0999 "
                    "V2000\n")
            for zj, p in zip(z, pos):
                f.write(f"{p[0]:10.4f}{p[1]:10.4f}{p[2]:10.4f} "
                        f"{_SYM[int(zj)]:<3}" + " 0" * 12 + "\n")
            f.write("M  END\n$$$$\n")


@pytest.fixture
def m3d_root(tmp_path):
    ds = synthetic_molecules(60, seed=3, min_atoms=5, max_atoms=12)
    root = tmp_path / "molecule3d"
    os.makedirs(root)
    _write_sdf(root / "combined_mols_0.sdf", ds, 0, 30)
    _write_sdf(root / "combined_mols_1.sdf", ds, 30, 60)
    with open(root / "properties.csv", "w") as f:
        f.write("index,dipole_x,dipole_y,dipole_z,homo,lumo,gap,"
                "scf_energy\n")
        for i in range(60):
            gap = float(ds.y[i, 0])
            f.write(f"{i},0,0,0,-0.3,{-0.3 + gap},{gap},-40.0\n")
    return str(root), ds


def test_molecule3d_sdf_ingestion(m3d_root):
    root, ds = m3d_root
    from gotennet_tpu.data.molecule3d import load_molecule3d
    full = load_molecule3d(root, label="gap")
    assert len(full) == 60 and full.y.shape == (60, 1)
    np.testing.assert_allclose(full.y[:, 0], ds.y[:, 0], rtol=1e-5)
    # positions survive the SDF round trip at 4-decimal precision
    np.testing.assert_allclose(full.pos[7], ds.pos[7], atol=1e-3)
    np.testing.assert_array_equal(full.z[33], ds.z[33])


def test_molecule3d_shards_and_host_assignment(m3d_root, tmp_path):
    root, _ = m3d_root
    from gotennet_tpu.data.molecule3d import (
        is_shard_dir,
        load_molecule3d,
        save_shards,
    )
    full = load_molecule3d(root, label="gap")
    shard_dir = str(tmp_path / "shards")
    paths = save_shards(full, shard_dir, shard_size=20)
    assert len(paths) == 3 and is_shard_dir(shard_dir)
    # 2 hosts over 3 shards: host 0 gets shards {0,1}, host 1 gets {2}
    h0 = load_molecule3d(shard_dir, host=0, n_hosts=2)
    h1 = load_molecule3d(shard_dir, host=1, n_hosts=2)
    assert len(h0) == 40 and len(h1) == 20
    np.testing.assert_allclose(np.asarray(h0.y)[:, 0], full.y[:40, 0])
    np.testing.assert_allclose(np.asarray(h1.y)[:, 0], full.y[40:, 0])


@pytest.mark.parametrize("root_kind", ["sdf", "shards"])
def test_molecule3d_cli_train(m3d_root, tmp_path, root_kind):
    """`cli train experiment=molecule3d` trains end-to-end on fabricated
    shards (both raw SDF and processed NPZ layouts)."""
    root, _ = m3d_root
    if root_kind == "shards":
        from gotennet_tpu.data.molecule3d import load_molecule3d, save_shards
        full = load_molecule3d(root, label="gap")
        root = str(tmp_path / "npz_root")
        save_shards(full, root, shard_size=25)
    cfg = load_config(CONFIG_DIR, "train.yaml", [
        "experiment=molecule3d", f"workdir={tmp_path}/run_{root_kind}",
        f"datamodule.dataset_root={root}",
        "datamodule.batch_size=8",
        "datamodule.train_size=40", "datamodule.val_size=10",
        "datamodule.test_size=10",
        "model.representation.n_atom_basis=32",
        "model.representation.n_interactions=2",
        "model.representation.n_rbf=8",
        "model.representation.num_heads=4",
        "model.representation.lmax=1",
        "trainer.max_epochs=2", "trainer.log_every=100"])
    results = train(cfg)
    assert np.isfinite(results["MeanAbsoluteError"])
    assert np.isfinite(results["val_loss"])
