"""ELL (padded-neighbor) layout: parity with the edge-list model on the
same parameter tree, loader behavior, training, and CLI integration."""

import jax
import numpy as np
import pytest

from gotennet_tpu.data.dataset import ELLLoader, synthetic_molecules
from gotennet_tpu.graph.ell_batch import ell_from_graph_batch
from gotennet_tpu.graph.neighborlist import collate_graphs
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.models.gotennet_ell import GotenNetELL


def _graphs(rng, sizes=(5, 7, 6)):
    return [
        dict(z=rng.integers(1, 10, size=m),
             pos=(rng.standard_normal((m, 3)) * 1.5), y=[0.0])
        for m in sizes
    ]


def _cfg(**kw):
    base = dict(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                num_heads=4)
    base.update(kw)
    return GotenNetConfig(**base)


@pytest.mark.parametrize("cfg", [
    _cfg(),
    _cfg(aggr="mean"),
    _cfg(aggr="max"),
    _cfg(scale_edge=True),
    _cfg(edge_updates="gated_linw_ln"),
    _cfg(layernorm="layer", steerable_norm="layer"),
    _cfg(sep_htr=False),
    _cfg(sep_dir=False, sep_tensor=False, lmax=1),
], ids=lambda c: f"aggr={c.aggr}_eu={c.edge_updates}_se={c.scale_edge}"
                 f"_ln={c.layernorm}_sh={c.sep_htr}_l={c.lmax}")
def test_ell_matches_edge_layout(cfg):
    """Same params, same graphs: ELL h/X == edge-layout h/X exactly on
    real nodes (both are reshuffles of the same masked math)."""
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    gb = collate_graphs(graphs, 24, 256, 4, cutoff=cfg.cutoff)
    eb = ell_from_graph_batch(gb, max_neighbors=12)

    edge_model = GotenNet(cfg)
    params = edge_model.init(jax.random.PRNGKey(0), gb,
                             method=GotenNet.from_batch)
    h_e, X_e = edge_model.apply(params, gb, method=GotenNet.from_batch)
    h_l, X_l = GotenNetELL(cfg).apply(params, eb)

    n_real = sum(len(g["z"]) for g in graphs)
    np.testing.assert_allclose(np.asarray(h_l)[:n_real],
                               np.asarray(h_e)[:n_real],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(X_l)[:n_real],
                               np.asarray(X_e)[:n_real],
                               rtol=1e-5, atol=1e-5)


def test_ell_loader_roundtrip_and_capacity():
    ds = synthetic_molecules(20, seed=1, min_atoms=5, max_atoms=12)
    loader = ELLLoader(ds, batch_size=4, cutoff=5.0)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    # every real node has at least its self-loop slot
    nm = np.asarray(b.node_mask)
    deg = np.asarray(b.nbr_mask).sum(1)
    assert (deg[nm] >= 1).all()
    assert (deg[~nm] == 0).all()
    # edge totals match the edge-list builder exactly
    from gotennet_tpu.graph.native import build_edges
    want = sum(len(build_edges(p, 5.0, True, 32)[0]) for p in ds.pos)
    got = sum(int(np.asarray(x.nbr_mask).sum()) for x in batches)
    assert got == want


def test_ell_full_model_and_forces(tmp_path):
    """GotenModel layout='ell' trains (incl. grad-of-grad forces) and
    its property output matches the edge layout bit-for-bit-ish."""
    from gotennet_tpu.data.dataset import BatchLoader
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.force_task import MD17Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _cfg(lmax=1)
    ds = synthetic_molecules(8, seed=2, min_atoms=5, max_atoms=8,
                             with_forces=True)
    task = MD17Task("aspirin", dataset_meta={"mean": 0.0, "std": 1.0})
    ell_model = GotenModel(cfg, task.build_head(), layout="ell")
    edge_model = GotenModel(cfg, task.build_head(), layout="edge")

    ell_loader = ELLLoader(ds, batch_size=4, cutoff=cfg.cutoff)
    edge_loader = BatchLoader(ds, batch_size=4, cutoff=cfg.cutoff)
    eb = next(iter(ell_loader))
    gb = next(iter(edge_loader))
    params = ell_model.init(jax.random.PRNGKey(0), eb)

    from gotennet_tpu.models.model import apply_with_forces
    out_l = apply_with_forces(ell_model, params, eb)
    out_e = apply_with_forces(edge_model, params, gb)
    np.testing.assert_allclose(np.asarray(out_l["property"]),
                               np.asarray(out_e["property"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_l["forces"]),
                               np.asarray(out_e["forces"]),
                               rtol=1e-4, atol=1e-5)

    trainer = Trainer(ell_model, task, TrainerConfig(
        lr=1e-3, max_epochs=2, scheduler="none", workdir=str(tmp_path)))
    params, history = trainer.fit(params, ell_loader, ell_loader)
    assert np.isfinite(history[-1]["val_loss"])


def test_ell_data_parallel_trainer(tmp_path):
    """ELL batches ride the data-parallel Trainer path."""
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _cfg(lmax=1)
    ds = synthetic_molecules(16, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head(), layout="ell")
    loader = ELLLoader(ds, batch_size=4, cutoff=cfg.cutoff)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_ser = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none",
        workdir=str(tmp_path / "s")))
    p_ser, _ = t_ser.fit(params, loader, loader)
    t_dp = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", data_parallel=2,
        workdir=str(tmp_path / "p")))
    p_dp, _ = t_dp.fit(params, loader, loader)
    # dp=2 over pairs == grad-accum-free sequential? No: dp averages
    # pairs; compare against grad_accum=2 for exact equivalence
    t_acc = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", grad_accum_steps=2,
        workdir=str(tmp_path / "a")))
    p_acc, _ = t_acc.fit(params, loader, loader)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_cli_smoke_ell_layout(tmp_path):
    from gotennet_tpu.cli import CONFIG_DIR, train
    from gotennet_tpu.utils.config import load_config
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "model.layout=ell"])
    results = train(cfg)
    assert np.isfinite(results["val_loss"])
