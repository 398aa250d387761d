"""Data ingestion: QM9 SDF parsing, MD17/MD22 NPZ + XYZ, processed
round-trips, loaders."""

import os

import numpy as np
import pytest

from gotennet_tpu.data.dataset import BatchLoader, DenseLoader, synthetic_molecules
from gotennet_tpu.data.md17 import load_md_npz, load_md_dataset, load_xyz
from gotennet_tpu.data.qm9 import load_qm9, qm9_atomref, save_processed_qm9

_SDF_MOL = """
 OpenBabel

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.1173 O   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000    0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000   -0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0  0  0  0
  1  3  1  0  0  0  0
M  END
$$$$
"""


def test_qm9_sdf_parsing(tmp_path):
    sdf = os.path.join(str(tmp_path), "gdb9.sdf")
    csv = os.path.join(str(tmp_path), "gdb9.sdf.csv")
    with open(sdf, "w") as f:
        f.write(_SDF_MOL * 2)  # two identical water molecules
    header = "mol_id," + ",".join(f"c{i}" for i in range(19))
    row = "gdb_1," + ",".join("1.0" for _ in range(19))
    with open(csv, "w") as f:
        f.write(header + "\n" + row + "\n" + row.replace("_1", "_2") + "\n")

    ds = load_qm9(str(tmp_path), label="homo")
    assert len(ds) == 2
    np.testing.assert_array_equal(ds.z[0], [8, 1, 1])
    assert ds.pos[0].shape == (3, 3)
    # homo (index 2) column: raw csv col 'mu'..: value 1.0 * HAR2EV
    assert abs(float(ds.y[0, 0]) - 27.211386246) < 1e-4
    # processed cache written and reloadable
    assert os.path.exists(os.path.join(str(tmp_path), "qm9_processed.npz"))
    ds2 = load_qm9(str(tmp_path), label="homo")
    np.testing.assert_allclose(ds2.y, ds.y)


def test_qm9_atomref():
    t = qm9_atomref("U0")
    assert t.shape == (100, 1)
    assert abs(t[1, 0] - (-13.61312172)) < 1e-6
    assert t[2, 0] == 0.0
    assert qm9_atomref("homo") is None


def test_md17_npz_formats(tmp_path):
    # revised-MD17 layout
    p1 = os.path.join(str(tmp_path), "rmd17_aspirin.npz")
    np.savez(p1, nuclear_charges=[6, 1, 8], coords=np.zeros((5, 3, 3)),
             energies=np.arange(5.0), forces=np.ones((5, 3, 3)))
    ds = load_md_dataset(str(tmp_path), "aspirin")
    assert len(ds) == 5 and ds.dy is not None
    np.testing.assert_array_equal(ds.z[0], [6, 1, 8])
    assert float(ds.y[3, 0]) == 3.0

    # sGDML layout
    p2 = os.path.join(str(tmp_path), "md22_AT-AT.npz")
    np.savez(p2, z=[7, 6], R=np.zeros((4, 2, 3)), E=np.ones((4, 1)) * 2,
             F=np.zeros((4, 2, 3)))
    ds2 = load_md_npz(p2, max_frames=3)
    assert len(ds2) == 3
    assert float(ds2.y[0, 0]) == 2.0


def test_xyz_parsing(tmp_path):
    p = os.path.join(str(tmp_path), "mol.xyz")
    with open(p, "w") as f:
        f.write("2\nE=-7.5\nC 0.0 0.0 0.0\nH 1.0 0.0 0.0\n"
                "2\nenergy = -8.25\nC 0.0 0.0 0.0\nH 0.0 1.1 0.0\n")
    ds = load_xyz(p)
    assert len(ds) == 2
    np.testing.assert_array_equal(ds.z[0], [6, 1])
    assert float(ds.y[0, 0]) == -7.5
    assert float(ds.y[1, 0]) == -8.25


def test_loaders_cover_dataset():
    ds = synthetic_molecules(21, seed=0)
    bl = BatchLoader(ds, batch_size=8)
    seen = sum(int(np.asarray(b.graph_mask).sum()) for b in bl)
    assert seen == 21
    assert len(bl) == 3
    dl = DenseLoader(ds, batch_size=8)
    seen_d = sum(int(np.asarray(b.graph_mask).sum()) for b in dl)
    assert seen_d == 21
    assert dl.max_atoms % 8 == 0


def test_prefetch_wrapper():
    from gotennet_tpu.data.prefetch import prefetch
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")
    it = prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        list(it)


def test_molecule3d_shards_roundtrip(tmp_path):
    from gotennet_tpu.data.molecule3d import (
        iter_shards, save_shards, shard_range_for_host)
    ds = synthetic_molecules(25, seed=7)
    paths = save_shards(ds, str(tmp_path), shard_size=10)
    assert len(paths) == 3
    # two hosts split shards disjointly and cover everything
    r0 = shard_range_for_host(3, 0, 2)
    r1 = shard_range_for_host(3, 1, 2)
    assert set(r0) | set(r1) == {0, 1, 2} and not set(r0) & set(r1)
    total = sum(len(s) for s in iter_shards(str(tmp_path)))
    assert total == 25
    first = next(iter_shards(str(tmp_path)))
    np.testing.assert_array_equal(first.z[0], ds.z[0])


def test_batchloader_rebuckets_on_outlier_overflow():
    """An unprobed dense outlier must not kill the epoch: the loader
    grows the edge capacity, re-collates, and every edge survives."""
    from gotennet_tpu.data.dataset import BatchLoader, MoleculeDataset
    rng = np.random.default_rng(0)
    zs, poss = [], []
    for i in range(130):
        if i == 1:  # dense blob the 64-point linspace probe skips
            m = 24
            pos = (rng.random((m, 3)) - 0.5) * 1.5  # everything in cutoff
        else:
            m = 6
            pos = (rng.random((m, 3)) - 0.5) * 12.0  # sparse
        zs.append(np.full(m, 6, np.int32))
        poss.append(pos.astype(np.float32))
    ds = MoleculeDataset(z=zs, pos=poss,
                         y=np.zeros((130, 1), np.float32))
    loader = BatchLoader(ds, batch_size=4, cutoff=5.0,
                         max_num_neighbors=32)
    cap0 = loader.edge_capacity
    batches = list(loader)
    assert len(batches) == len(loader)
    # the outlier batch forced a rebucket
    assert loader.edge_capacity > cap0
    # no silent truncation: total real edges = exact per-molecule count
    from gotennet_tpu.graph.native import build_edges
    want = sum(len(build_edges(p, 5.0, True, 32)[0]) for p in poss)
    got = sum(int(np.asarray(b.edge_mask).sum()) for b in batches)
    assert got == want


def test_batchloader_full_probe_is_exact():
    """neighbor_probe='full' sizes the capacity from the true max —
    no overflow possible, tighter than the sampled estimate."""
    from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
    ds = synthetic_molecules(64, seed=3, min_atoms=5, max_atoms=20)
    full = BatchLoader(ds, batch_size=8, cutoff=5.0,
                       neighbor_probe="full")
    cap0 = full.edge_capacity
    n = sum(1 for _ in full)
    assert n == len(full)
    assert full.edge_capacity == cap0  # never rebucketed


def test_qm9_uncharacterized_exclusion_and_conversions(tmp_path):
    """uncharacterized.txt drops the listed molecule indices (1-based,
    9 header + 2 footer lines, like the QM9 distribution's file), and
    the per-target unit conversions match hand-computed values:
    homo/U0 Hartree->eV, U0_atom kcal/mol->eV, mu/Cv unconverted."""
    root = str(tmp_path)
    with open(os.path.join(root, "gdb9.sdf"), "w") as f:
        f.write(_SDF_MOL * 3)  # three water molecules
    header = "mol_id," + ",".join(f"c{i}" for i in range(19))
    # csv column order: A,B,C,mu,alpha,homo,...  (the loader reorders
    # to mu-first) — give each molecule a distinct raw value
    rows = []
    for i in (1, 2, 3):
        rows.append(f"gdb_{i}," + ",".join(str(float(i))
                                           for _ in range(19)))
    with open(os.path.join(root, "gdb9.sdf.csv"), "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    # exclude molecule 2 (1-based index in the first column)
    unchar = ["header"] * 9 + ["  2  some reason", ""] + ["footer", ""]
    with open(os.path.join(root, "uncharacterized.txt"), "w") as f:
        f.write("\n".join(unchar))

    ds = load_qm9(root)
    assert len(ds) == 2                      # molecule 2 excluded
    har2ev = 27.211386246
    kcal2ev = 0.04336414
    # y column order: mu alpha homo lumo gap r2 zpve U0 U H G Cv
    #                 U0_atom U_atom H_atom G_atom A B C
    for row, raw in zip(np.asarray(ds.y), (1.0, 3.0)):
        assert abs(row[0] - raw) < 1e-5                 # mu: Debye, raw
        assert abs(row[2] - raw * har2ev) < 1e-4        # homo
        assert abs(row[7] - raw * har2ev) < 1e-4        # U0
        assert abs(row[11] - raw) < 1e-5                # Cv
        assert abs(row[12] - raw * kcal2ev) < 1e-6      # U0_atom


def test_qm9_auto_download_wiring(tmp_path, monkeypatch):
    """download_qm9 fetches qm9.zip + uncharacterized.txt from the
    reference's PyG URLs and extracts gdb9.sdf/gdb9.sdf.csv; load_qm9
    triggers it when raw files are missing (≙ _prepare_QM9's PyG
    download, datamodule.py:91-120).  The transport is monkeypatched
    (no egress here); URL routing, extraction and the parse are real."""
    import io
    import zipfile

    from gotennet_tpu.data import qm9 as qm9_mod

    header = "mol_id," + ",".join(f"c{i}" for i in range(19))
    row = "gdb_1," + ",".join("1.0" for _ in range(19))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("qm9/gdb9.sdf", _SDF_MOL)
        zf.writestr("qm9/gdb9.sdf.csv", header + "\n" + row + "\n")
        zf.writestr("qm9/readme", "ignored")

    calls = []

    def fake_download(url, dest, timeout=60):
        calls.append(url)
        if url == qm9_mod.QM9_RAW_URL:
            with open(dest, "wb") as f:
                f.write(buf.getvalue())
        elif url == qm9_mod.QM9_UNCHAR_URL:
            with open(dest, "w") as f:
                f.write("\n".join(["h"] * 9 + ["", "f", ""]))
        else:
            raise AssertionError(f"unexpected url {url}")
        return dest

    import gotennet_tpu.utils.hub as hub
    monkeypatch.setattr(hub, "download_file", fake_download)

    root = str(tmp_path)
    ds = load_qm9(root, label="homo")
    assert calls == [qm9_mod.QM9_RAW_URL, qm9_mod.QM9_UNCHAR_URL]
    assert len(ds) == 1
    assert os.path.exists(os.path.join(root, "gdb9.sdf"))
    assert os.path.exists(os.path.join(root, "uncharacterized.txt"))
    assert not os.path.exists(os.path.join(root, "qm9.zip"))

    # no-egress failure mode: a fresh root with downloads failing
    # raises a FileNotFoundError pointing at manual placement
    def broken(url, dest, timeout=60):
        raise IOError("no egress")
    monkeypatch.setattr(hub, "download_file", broken)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="manually"):
        load_qm9(os.path.join(root, "fresh"))
