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


def test_ell_windowed_gather_matches_take():
    """The windowed one-hot gather path (the 10^3-atom formulation) is
    numerically identical to plain row gathers in f32, for values and
    gradients."""
    from gotennet_tpu.graph.ell_batch import collate_ell

    cfg = _cfg()
    rng = np.random.default_rng(2)
    # one larger molecule so windows are meaningful
    graphs = [dict(z=rng.integers(1, 10, size=40),
                   pos=rng.standard_normal((40, 3)) * 3.0, y=[0.0])]
    take_b = collate_ell(graphs, 48, 16, 1, cutoff=cfg.cutoff,
                         max_num_neighbors=12)
    win_b = collate_ell(graphs, 48, 16, 1, cutoff=cfg.cutoff,
                        max_num_neighbors=12,
                        block_rows=8, spatial_sort=True)
    assert win_b.gather_window is not None

    model = GotenNetELL(cfg)
    params = model.init(jax.random.PRNGKey(0), take_b)
    # compare on the SAME atom order: spatially sort the raw graph and
    # collate both ways without in-collator sorting
    from gotennet_tpu.graph.neighborlist import spatial_order
    perm = spatial_order(graphs[0]["pos"], cfg.cutoff)
    sg = [dict(z=graphs[0]["z"][perm], pos=graphs[0]["pos"][perm],
               y=[0.0])]
    tb = collate_ell(sg, 48, 16, 1, cutoff=cfg.cutoff,
                     max_num_neighbors=12)
    wb = collate_ell(sg, 48, 16, 1, cutoff=cfg.cutoff,
                     max_num_neighbors=12, block_rows=8)
    np.testing.assert_array_equal(np.asarray(tb.nbr), np.asarray(wb.nbr))

    h_t, X_t = model.apply(params, tb)
    h_w, X_w = model.apply(params, wb)
    np.testing.assert_allclose(np.asarray(h_w)[:40],
                               np.asarray(h_t)[:40], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_w)[:40],
                               np.asarray(X_t)[:40], rtol=2e-5, atol=2e-5)

    # gradient parity: d(sum h)/d(params) identical across paths
    import jax.numpy as jnp

    def loss(p, b):
        h, X = model.apply(p, b)
        return jnp.sum(h[:40] ** 2) + jnp.sum(X[:40] ** 2)

    g_t = jax.grad(loss)(params, tb)
    g_w = jax.grad(loss)(params, wb)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_w)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_fused_ell_model_matches_unfused():
    """GotenNetELL with cfg.fused=True (Pallas kernel, interpret mode
    on CPU) == the unfused XLA path: same parameter tree, same
    outputs, same gradients."""
    import dataclasses

    import jax.numpy as jnp

    cfg = _cfg()
    cfg_f = dataclasses.replace(cfg, fused=True, remat=False)
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    gb = collate_graphs(graphs, 24, 256, 4, cutoff=cfg.cutoff)
    eb = ell_from_graph_batch(gb, max_neighbors=12)

    model_u = GotenNetELL(cfg)
    model_f = GotenNetELL(cfg_f)
    params = model_u.init(jax.random.PRNGKey(0), eb)
    params_f = model_f.init(jax.random.PRNGKey(0), eb)
    assert (jax.tree_util.tree_structure(params_f)
            == jax.tree_util.tree_structure(params))

    h_u, X_u = model_u.apply(params, eb)
    h_f, X_f = model_f.apply(params, eb)
    n_real = sum(len(g["z"]) for g in graphs)
    np.testing.assert_allclose(np.asarray(h_f)[:n_real],
                               np.asarray(h_u)[:n_real],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(X_f)[:n_real],
                               np.asarray(X_u)[:n_real],
                               rtol=2e-4, atol=2e-4)

    def loss(model):
        def f(p):
            h, X = model.apply(p, eb)
            return jnp.sum(h[:n_real] ** 2) + jnp.sum(X[:n_real] ** 2)
        return f

    g_u = jax.grad(loss(model_u))(params)
    g_f = jax.grad(loss(model_f))(params)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("edge_updates", [True, "gatedt", "norej"])
def test_fused_htr_ell_matches_unfused(edge_updates):
    """cfg.fused_htr=True routes the HTR edge update through the
    fused ELL Pallas kernel (expanded rejection, in-kernel EK
    gathers): same parameter tree, outputs and gradients as the XLA
    rejection formulation."""
    import dataclasses

    import jax.numpy as jnp

    cfg = _cfg(edge_updates=edge_updates, n_interactions=3)
    cfg_f = dataclasses.replace(cfg, fused=True, fused_htr=True,
                                remat=False)
    rng = np.random.default_rng(1)
    graphs = _graphs(rng)
    gb = collate_graphs(graphs, 24, 256, 4, cutoff=cfg.cutoff)
    eb = ell_from_graph_batch(gb, max_neighbors=12)

    model_u = GotenNetELL(cfg)
    model_f = GotenNetELL(cfg_f)
    params = model_u.init(jax.random.PRNGKey(0), eb)
    params_f = model_f.init(jax.random.PRNGKey(0), eb)
    assert (jax.tree_util.tree_structure(params_f)
            == jax.tree_util.tree_structure(params))

    h_u, X_u = model_u.apply(params, eb)
    h_f, X_f = model_f.apply(params, eb)
    n_real = sum(len(g["z"]) for g in graphs)
    np.testing.assert_allclose(np.asarray(h_f)[:n_real],
                               np.asarray(h_u)[:n_real],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(X_f)[:n_real],
                               np.asarray(X_u)[:n_real],
                               rtol=2e-4, atol=2e-4)

    def loss(model):
        def f(p, pos):
            h, X = model.apply(p, eb.replace(pos=pos))
            return jnp.sum(h[:n_real] ** 2) + jnp.sum(X[:n_real] ** 2)
        return f

    g_u = jax.grad(loss(model_u), argnums=(0, 1))(params, eb.pos)
    g_f = jax.grad(loss(model_f), argnums=(0, 1))(params, eb.pos)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-3)


def test_spatial_order_bounds_window():
    """Cell-lexicographic ordering yields gather windows well below N
    for spatially extended systems."""
    from gotennet_tpu.graph.ell_batch import collate_ell

    ds = synthetic_molecules(1, seed=0, min_atoms=600, max_atoms=600,
                             box=6.3)
    g = [dict(z=ds.z[0], pos=ds.pos[0], y=[0.0])]
    b = collate_ell(g, 640, 36, 1, cutoff=5.0, block_rows=64,
                    spatial_sort=True)
    assert b.gather_window is not None
    # at ~600 atoms (23 A box, 5 A cells -> ~4.6 cells/side) the
    # lexicographic band is ~3 x-slabs of ~4.6 -> W ~= 0.8 N; the
    # ratio shrinks linearly with system size (W tracks slab size,
    # not N)
    assert b.gather_window <= 0.85 * b.num_nodes, b.gather_window


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


@pytest.mark.parametrize("spatial", [False, True],
                         ids=["take", "windowed"])
def test_ell_fused_data_parallel_trainer(tmp_path, spatial):
    """Fused Pallas ELL kernel (interpret on the CPU mesh) under the
    data-parallel Trainer == single-device grad-accum: the custom_vjp
    composes with shard_map/psum — the multi-chip 10^3-atom path.
    Covered with both neighbor-lookup modes (plain take and the
    windowed one-hot gathers used at spatial scale)."""
    import dataclasses

    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    cfg = dataclasses.replace(_cfg(lmax=1), fused=True, remat=False)
    ds = synthetic_molecules(8, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head(), layout="ell")
    loader = ELLLoader(ds, batch_size=2, cutoff=cfg.cutoff,
                       spatial_sort=spatial,
                       block_rows=8 if spatial else None)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_acc = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", grad_accum_steps=2,
        workdir=str(tmp_path / "a")))
    p_acc, h_acc = t_acc.fit(params, loader, loader)
    t_dp = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", data_parallel=2,
        workdir=str(tmp_path / "p")))
    p_dp, h_dp = t_dp.fit(params, loader, loader)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    assert np.isclose(h_acc[-1]["val_loss"], h_dp[-1]["val_loss"],
                      rtol=2e-4)


@pytest.mark.parametrize("variant", ["take", "windowed", "fused"])
def test_ell_row_sharded_forward_matches_single(variant):
    """Destination-row sharding (cfg.edge_axis inside shard_map) ==
    single-device forward, for all three neighbor-lookup modes: the
    multi-chip path for one molecule too big for a chip."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from gotennet_tpu.parallel import make_mesh

    mesh = make_mesh((1, 2), axis_names=("data", "edge"))
    cfg = _cfg(lmax=1)
    if variant == "fused":
        cfg = dataclasses.replace(cfg, fused=True, remat=False)
    ds = synthetic_molecules(6, seed=0, min_atoms=6, max_atoms=10)
    loader = ELLLoader(ds, batch_size=6, cutoff=cfg.cutoff,
                       node_capacity=64,
                       spatial_sort=(variant == "windowed"),
                       block_rows=8 if variant == "windowed" else None)
    batch = next(iter(loader))
    assert batch.num_nodes % 2 == 0
    model = GotenNetELL(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    h_ref, X_ref = model.apply(params, batch)

    model_par = GotenNetELL(dataclasses.replace(cfg, edge_axis="edge"))
    mapped = jax.shard_map(
        lambda b: model_par.apply(params, b), mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()), check_vma=False)
    h_par, X_par = jax.jit(mapped)(batch)
    np.testing.assert_allclose(np.asarray(h_par), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_par), np.asarray(X_ref),
                               rtol=2e-5, atol=2e-5)


def test_ell_row_sharded_trainer(tmp_path):
    """Trainer edge_parallel=2 with the ELL layout (row sharding)
    produces the same parameter update as the single-device fit."""
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _cfg(lmax=1)
    ds = synthetic_molecules(8, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head(), layout="ell")
    loader = ELLLoader(ds, batch_size=4, cutoff=cfg.cutoff,
                       node_capacity=48)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_ser = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none",
        workdir=str(tmp_path / "s")))
    p_ser, _ = t_ser.fit(params, loader, loader)
    t_rp = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", edge_parallel=2,
        workdir=str(tmp_path / "r")))
    p_rp, _ = t_rp.fit(params, loader, loader)
    for a, b in zip(jax.tree.leaves(p_ser), jax.tree.leaves(p_rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("layout", ["edge", "ell"])
def test_forces_match_under_graph_sharding(layout):
    """forces = -dE/dpos from the graph-sharded model (edge partition
    or ELL row sharding) == the serial forces: the inner force grad is
    pmean'd over the axis (each device's dE/dpos carries only its own
    pair shard's contributions, scaled by the in-forward psum
    transpose)."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from gotennet_tpu.data.dataset import BatchLoader
    from gotennet_tpu.models.model import (
        GotenModel, HeadConfig, apply_with_forces)
    from gotennet_tpu.parallel import make_mesh
    from gotennet_tpu.parallel.data_parallel import batch_pspec

    mesh = make_mesh((1, 2), axis_names=("data", "edge"))
    cfg = _cfg(lmax=1)
    head = HeadConfig(kind="atomwise", derivative=True)
    ds = synthetic_molecules(4, seed=0, min_atoms=5, max_atoms=9)
    if layout == "edge":
        loader = BatchLoader(ds, batch_size=4, cutoff=cfg.cutoff,
                             edge_capacity=512)
        bspec = jax.tree.map(lambda s: P(*s[1:]) if s else P(),
                             batch_pspec("edge"))
    else:
        loader = ELLLoader(ds, batch_size=4, cutoff=cfg.cutoff,
                           node_capacity=48)
        bspec = P()
    batch = next(iter(loader))
    model = GotenModel(cfg, head, layout=layout)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = apply_with_forces(model, params, batch)

    model_par = GotenModel(dataclasses.replace(cfg, edge_axis="edge"),
                           head, layout=layout)
    mapped = jax.shard_map(
        lambda b: apply_with_forces(model_par, params, b)["forces"],
        mesh=mesh, in_specs=(bspec,), out_specs=P(), check_vma=False)
    forces_par = jax.jit(mapped)(batch)
    np.testing.assert_allclose(np.asarray(forces_par),
                               np.asarray(ref["forces"]),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fused_htr", [False, True])
def test_ell_fused_chunked_matches_whole_table(fused_htr):
    """Chunked fused-kernel path (node table > fused_table_rows:
    kernel scanned over contiguous row chunks against halo-bounded
    static table windows) == the whole-table fused call, values and
    gradients — the 10^4-atom extension of the fused formulation.
    With fused_htr the chunked HTR kernel is covered too."""
    import dataclasses

    ds = synthetic_molecules(2, seed=0, min_atoms=155, max_atoms=160,
                             box=6.3)
    loader = ELLLoader(ds, batch_size=2, cutoff=5.0, node_capacity=320,
                       neighbor_probe="full", spatial_sort=True,
                       block_rows=8)
    batch = next(iter(loader))
    NT = batch.num_nodes
    halo = batch.gather_halo
    assert halo is not None
    max_rows = 256
    # the chunk picker must actually engage at this halo — guard the
    # test against silently degenerating to the whole-table path
    w8 = min(NT, -(-(8 + 2 * halo) // 128) * 128)
    assert w8 < NT and w8 <= max_rows, \
        f"halo {halo} too large for a meaningful chunk test"

    base = dataclasses.replace(_cfg(lmax=1), fused=True, remat=False,
                               fused_htr=fused_htr)
    whole = GotenNetELL(dataclasses.replace(base, fused_table_rows=0))
    chunked = GotenNetELL(
        dataclasses.replace(base, fused_table_rows=max_rows))
    params = whole.init(jax.random.PRNGKey(0), batch)

    h_w, X_w = whole.apply(params, batch)
    h_c, X_c = chunked.apply(params, batch)
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_w),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_c), np.asarray(X_w),
                               rtol=2e-5, atol=2e-5)

    import jax.numpy as jnp

    def loss(model, p, pos):
        h, X = model.apply(p, batch.replace(pos=pos))
        return jnp.sum(h ** 2) + jnp.sum(X ** 2)

    g_w = jax.grad(lambda p, pos: loss(whole, p, pos),
                   argnums=(0, 1))(params, batch.pos)
    g_c = jax.grad(lambda p, pos: loss(chunked, p, pos),
                   argnums=(0, 1))(params, batch.pos)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_ell_fused_chunked_row_sharded():
    """Chunked fused kernel under destination-row sharding: chunking
    subdivides each device's local rows (window starts rebased by the
    shard offset) and still matches the serial whole-table forward."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from gotennet_tpu.parallel import make_mesh

    ds = synthetic_molecules(2, seed=0, min_atoms=155, max_atoms=160,
                             box=6.3)
    loader = ELLLoader(ds, batch_size=2, cutoff=5.0, node_capacity=320,
                       neighbor_probe="full", spatial_sort=True,
                       block_rows=8)
    batch = next(iter(loader))
    base = dataclasses.replace(_cfg(lmax=1), fused=True, remat=False)
    whole = GotenNetELL(dataclasses.replace(base, fused_table_rows=0))
    params = whole.init(jax.random.PRNGKey(0), batch)
    h_ref, X_ref = whole.apply(params, batch)

    mesh = make_mesh((1, 2), axis_names=("data", "edge"))
    par = GotenNetELL(dataclasses.replace(
        base, fused_table_rows=256, edge_axis="edge"))
    mapped = jax.shard_map(
        lambda b: par.apply(params, b), mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()), check_vma=False)
    h_par, X_par = jax.jit(mapped)(batch)
    np.testing.assert_allclose(np.asarray(h_par), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_par), np.asarray(X_ref),
                               rtol=2e-5, atol=2e-5)


def test_cli_smoke_ell_layout(tmp_path):
    from gotennet_tpu.cli import CONFIG_DIR, train
    from gotennet_tpu.utils.config import load_config
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "model.layout=ell"])
    results = train(cfg)
    assert np.isfinite(results["val_loss"])
