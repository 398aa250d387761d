"""Dense-block layout vs edge-list layout: identical parameter trees,
identical outputs (the edge-list path is the oracle)."""

import jax
import numpy as np
import pytest

from gotennet_tpu.graph.dense_batch import collate_dense, flatten_nodes
from gotennet_tpu.graph.neighborlist import collate_graphs
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.models.gotennet_dense import GotenNetDense


def _graphs(rng, sizes=(5, 7, 9)):
    return [
        dict(z=rng.integers(1, 10, size=m),
             pos=rng.standard_normal((m, 3)) * 1.5, y=[0.0])
        for m in sizes
    ]


@pytest.mark.parametrize("cfg", [
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                   num_heads=4),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1, n_rbf=8,
                   num_heads=4, sep_dir=False, sep_tensor=False,
                   scale_edge=True),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=3, n_rbf=8,
                   num_heads=4, edge_updates="gated_linw_mlp",
                   sep_htr=False),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                   num_heads=4, layernorm="layer", steerable_norm="norm",
                   edge_updates="norej"),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                   num_heads=4, sep_dir=False, sep_tensor=False),
])
def test_dense_matches_edge_list(cfg):
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    eb = collate_graphs(graphs, 32, 256, 4, cutoff=cfg.cutoff,
                        max_num_neighbors=32)
    db = collate_dense(graphs, 4, 12)

    edge_model = GotenNet(cfg)
    dense_model = GotenNetDense(cfg)
    params = edge_model.init(jax.random.PRNGKey(0), eb,
                             method=GotenNet.from_batch)
    params_d = dense_model.init(jax.random.PRNGKey(0), db)
    # identical parameter trees (names and shapes)
    ref = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(params_d) == ref
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_d)):
        assert a.shape == b.shape

    h_e, X_e = edge_model.apply(params, eb, method=GotenNet.from_batch)
    h_d, X_d = dense_model.apply(params, db)

    h_e, X_e = np.asarray(h_e), np.asarray(X_e)
    h_d, X_d = np.asarray(h_d), np.asarray(X_d)
    # compare real atoms: edge layout is concatenated, dense is [G, M]
    off = 0
    for g, gr in enumerate(graphs):
        m = len(gr["z"])
        np.testing.assert_allclose(h_d[g, :m], h_e[off:off + m],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(X_d[g, :m], X_e[off:off + m],
                                   rtol=2e-4, atol=2e-5)
        off += m


def test_dense_neighbor_cap_matches_edge_list():
    """Beyond-cap density: the dense layout's in-forward nearest-k cap
    computes the same graph as the host edge builder (regression: the
    dense layout silently ignored max_num_neighbors, so condensed-phase
    systems with degree > cap diverged across layouts; the reference
    caps per-node degree at 32, layers.py:1589-1590)."""
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4, max_num_neighbors=8)
    rng = np.random.default_rng(3)
    # 24 atoms in a tight cluster: every node's degree >> the cap of 8
    graphs = [dict(z=rng.integers(1, 10, size=24),
                   pos=rng.standard_normal((24, 3)) * 1.2, y=[0.0])]
    eb = collate_graphs(graphs, 24, 512, 1, cutoff=cfg.cutoff,
                        max_num_neighbors=8)
    # sanity: the cap binds (24 real nodes, degree capped at 8 + loop)
    n_edges = int(np.asarray(eb.edge_mask).sum())
    assert n_edges == 24 * 9
    db = collate_dense(graphs, 1, 24)

    edge_model = GotenNet(cfg)
    dense_model = GotenNetDense(cfg)
    params = edge_model.init(jax.random.PRNGKey(0), eb,
                             method=GotenNet.from_batch)
    h_e, X_e = edge_model.apply(params, eb, method=GotenNet.from_batch)
    h_d, X_d = dense_model.apply(params, db)
    np.testing.assert_allclose(np.asarray(h_d)[0], np.asarray(h_e)[:24],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_d)[0], np.asarray(X_e)[:24],
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cfg_kw", [
    dict(),
    dict(sep_dir=False, sep_tensor=False, scale_edge=True),
    # config-grammar generality of the fused kernels (the reference
    # supports lmax<=8, layers.py:783-1494; heads and evec_dim are
    # free knobs): lmax=3 exercises the l=3 degree block in the fused
    # GATA + HTR kernels; num_heads=8 changes every head-indicator
    # matmul (Dh=4); evec_dim != D drops fused_htr to its documented
    # XLA fallback while the fused message kernel stays on
    dict(lmax=3),
    dict(num_heads=8),
    # evec_dim != D requires a linw token (the gate must project C->D,
    # as in the reference's W_edp); fused_htr falls back to its XLA
    # path per its grammar guard while the fused message kernel stays on
    dict(lmax=3, num_heads=2, evec_dim=16, edge_updates="gated_linw"),
])
def test_fused_dense_matches_unfused(cfg_kw):
    """fused=True (Pallas interpret) == unfused dense: outputs AND
    parameter gradients, from one shared parameter tree."""
    import dataclasses

    import jax.numpy as jnp

    kw = dict(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
              num_heads=4)
    kw.update(cfg_kw)
    base = GotenNetConfig(**kw)
    fused_cfg = dataclasses.replace(base, fused=True, fused_htr=True)
    rng = np.random.default_rng(3)
    graphs = _graphs(rng)
    db = collate_dense(graphs, 4, 12)

    m_ref = GotenNetDense(base)
    m_fused = GotenNetDense(fused_cfg)
    params = m_ref.init(jax.random.PRNGKey(0), db)
    params_f = m_fused.init(jax.random.PRNGKey(0), db)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    h_r, X_r = m_ref.apply(params, db)
    h_f, X_f = m_fused.apply(params, db)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_f), np.asarray(X_r),
                               rtol=2e-4, atol=2e-5)

    def loss(model):
        def f(p):
            h, X = model.apply(p, db)
            return jnp.sum(h ** 2) + jnp.sum(X ** 2)
        return f

    g_r = jax.grad(loss(m_ref))(params)
    g_f = jax.grad(loss(m_fused))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_f = jax.tree.leaves(g_f)
    for (path, a), b in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_attention_dropout():
    """Fused path supports attention dropout (mask folded into the
    kernel's per-head scale): stochastic != deterministic, seeds
    differ, and outputs stay finite."""
    import dataclasses

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4, attn_dropout=0.3,
                         fused=True)
    rng = np.random.default_rng(0)
    graphs = _graphs(rng, sizes=(5, 7))
    db = collate_dense(graphs, 2, 8)
    m = GotenNetDense(cfg)
    params = m.init(jax.random.PRNGKey(0), db)
    det = m.apply(params, db, deterministic=True)
    s1 = m.apply(params, db, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    s2 = m.apply(params, db, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(det[0]), np.asarray(s1[0]))
    assert not np.allclose(np.asarray(s1[0]), np.asarray(s2[0]))
    assert np.isfinite(np.asarray(s1[0])).all()
    # deterministic mode ignores dropout entirely: matches unfused
    unfused = GotenNetDense(dataclasses.replace(cfg, fused=False))
    h_u, X_u = unfused.apply(params, db, deterministic=True)
    np.testing.assert_allclose(np.asarray(det[0]), np.asarray(h_u),
                               rtol=2e-4, atol=2e-5)


def test_flatten_nodes_view():
    rng = np.random.default_rng(1)
    graphs = _graphs(rng, sizes=(3, 4))
    db = collate_dense(graphs, 2, 6, y_dim=1)
    fb = flatten_nodes(db)
    assert fb.z.shape == (12,)
    assert int(fb.node_mask.sum()) == 7
    np.testing.assert_array_equal(np.asarray(fb.node_graph[:6]), 0)
    np.testing.assert_array_equal(np.asarray(fb.node_graph[6:]), 1)


def test_dense_with_dropout_trains():
    """Dropout rngs thread through nn.remat + dense layout."""
    import jax.numpy as jnp
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import make_loss_fn

    rng = np.random.default_rng(5)
    graphs = _graphs(rng)
    db = collate_dense(graphs, 4, 12)
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4, attn_dropout=0.25)
    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    model = GotenModel(cfg, task.build_head(), layout="dense")
    params = model.init(jax.random.PRNGKey(0), db)
    loss_fn = make_loss_fn(model, task)
    (l1, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
        params, db, jax.random.PRNGKey(1), False)
    (l2, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        params, db, jax.random.PRNGKey(2), False)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # different dropout masks
    # deterministic path is reproducible
    l3, _ = loss_fn(params, db, None, True)
    l4, _ = loss_fn(params, db, None, True)
    assert float(l3) == float(l4)


def test_dense_forces_match_edge_layout():
    """Force path on the dense layout: -dE/dpos agrees with the edge
    layout (same params), and the force-task loss/grad is finite — the
    MD training capability on the layout that is fastest at MD22 scale
    (reference outputs.py:365-375 autograd semantics)."""
    from gotennet_tpu.data.dataset import (
        BatchLoader, DenseLoader, synthetic_molecules)
    from gotennet_tpu.models.model import (
        GotenModel, HeadConfig, apply_with_forces)
    from gotennet_tpu.tasks.force_task import MD17Task
    from gotennet_tpu.train.trainer import make_loss_fn

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4)
    head = HeadConfig(kind="atomwise", derivative=True)
    ds = synthetic_molecules(4, seed=3, min_atoms=6, max_atoms=10,
                             with_forces=True)
    eb = next(iter(BatchLoader(ds, batch_size=4, cutoff=cfg.cutoff,
                               neighbor_probe="full")))
    db = next(iter(DenseLoader(ds, batch_size=4)))
    edge_model = GotenModel(cfg, head, layout="edge")
    dense_model = GotenModel(cfg, head, layout="dense")
    params = edge_model.init(jax.random.PRNGKey(0), eb)

    f_e = np.asarray(apply_with_forces(edge_model, params, eb)["forces"])
    f_d = np.asarray(apply_with_forces(dense_model, params, db)["forces"])
    ng = np.asarray(eb.node_graph)
    nm = np.asarray(eb.node_mask)
    for g in range(4):
        rows = f_e[(ng == g) & nm]
        np.testing.assert_allclose(f_d[g, :len(rows)], rows,
                                   rtol=2e-4, atol=2e-5)
        # padded atom slots carry zero force
        np.testing.assert_array_equal(f_d[g, len(rows):], 0.0)

    task = MD17Task("aspirin", dataset_meta={"mean": 0.0, "std": 1.0})
    loss_fn = make_loss_fn(dense_model, task)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, db, None, True)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_dense_bucketing_loader():
    """Size-bucketed DenseLoader: per-batch M (multiple of 8, <= global
    cap), every molecule exactly once, materially fewer padded pairs."""
    from gotennet_tpu.data.dataset import DenseLoader, synthetic_molecules
    ds = synthetic_molecules(64, seed=0, min_atoms=6, max_atoms=28)
    loader = DenseLoader(ds, batch_size=8, shuffle=True, seed=1,
                         bucket=True, bucket_window=4)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 8
    ms = {b.max_atoms for b in batches}
    assert len(ms) > 1 and max(ms) <= 32
    assert all(m % 8 == 0 for m in ms)
    total_atoms = sum(int(np.asarray(b.mask).sum()) for b in batches)
    assert total_atoms == sum(len(z) for z in ds.z)
    pairs_b = sum(b.num_graphs * b.max_atoms ** 2 for b in batches)
    pairs_f = sum(b.num_graphs * b.max_atoms ** 2
                  for b in DenseLoader(ds, batch_size=8))
    assert pairs_b < 0.8 * pairs_f


def test_dense_padding_invariance():
    """The dense model's outputs for real atoms are independent of the
    batch's M padding — the invariance size bucketing relies on."""
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4)
    rng = np.random.default_rng(5)
    graphs = _graphs(rng, sizes=(5, 7, 9))
    small = collate_dense(graphs, 3, 16)
    big = collate_dense(graphs, 3, 32)
    model = GotenNetDense(cfg)
    params = model.init(jax.random.PRNGKey(0), small)
    h_s, X_s = model.apply(params, small)
    h_b, X_b = model.apply(params, big)
    for g, gr in enumerate(graphs):
        m = len(gr["z"])
        np.testing.assert_allclose(np.asarray(h_s)[g, :m],
                                   np.asarray(h_b)[g, :m],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(X_s)[g, :m],
                                   np.asarray(X_b)[g, :m],
                                   rtol=1e-5, atol=1e-6)


def test_trainer_accum_with_bucketed_loader(tmp_path):
    """Gradient accumulation over a bucketed loader: chunks of
    different M are padded to a common shape by pad_stack and training
    proceeds."""
    import jax as _jax

    from gotennet_tpu.data.dataset import DenseLoader, synthetic_molecules
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1,
                         n_rbf=8, num_heads=4)
    ds = synthetic_molecules(32, seed=0, min_atoms=5, max_atoms=20)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head(), layout="dense")
    loader = DenseLoader(ds, batch_size=4, shuffle=True, seed=1,
                         bucket=True, bucket_window=2)
    trainer = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=2, scheduler="none", grad_accum_steps=2,
        workdir=str(tmp_path), log_every=1000))
    params = model.init(_jax.random.PRNGKey(0), next(iter(loader)))
    params, hist = trainer.fit(params, loader, loader)
    assert np.isfinite(hist[-1]["val_loss"])


def test_dense_rotation_equivariance():
    rng = np.random.default_rng(6)
    graphs = _graphs(rng)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = [dict(g, pos=g["pos"] @ q.T) for g in graphs]
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4)
    model = GotenNetDense(cfg)
    db = collate_dense(graphs, 4, 12)
    dbr = collate_dense(rot, 4, 12)
    params = model.init(jax.random.PRNGKey(1), db)
    h, X = model.apply(params, db)
    hr, Xr = model.apply(params, dbr)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(h), rtol=1e-4,
                               atol=1e-4)
    # l=1 block rotates as a vector
    np.testing.assert_allclose(
        np.asarray(Xr)[..., 0:3, :],
        np.einsum("ab,gnbc->gnac", q, np.asarray(X)[..., 0:3, :]),
        rtol=1e-4, atol=1e-4)


def test_scan_layers_matches_unrolled():
    """scan_layers=True (one lax.scan over the homogeneous layers,
    stacked params) computes the same function as the unrolled stack:
    roll_layer_params converts the unrolled init, outputs and parameter
    gradients agree, and the round-trip through unroll is exact."""
    import dataclasses

    import jax.numpy as jnp

    from gotennet_tpu.graph.dense_batch import collate_dense
    from gotennet_tpu.utils.params import (
        roll_layer_params,
        unroll_layer_params,
    )

    rng = np.random.default_rng(0)
    batch = collate_dense(_graphs(rng), num_graphs=4, max_atoms=10)
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=3, lmax=2,
                         n_rbf=8, num_heads=4)
    m0 = GotenNetDense(cfg)
    p0 = m0.init(jax.random.PRNGKey(0), batch)
    h0, X0 = m0.apply(p0, batch)

    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    ms = GotenNetDense(cfg_s)
    ps = roll_layer_params(p0, cfg.n_interactions)
    assert (jax.tree.structure(ps)
            == jax.tree.structure(ms.init(jax.random.PRNGKey(0), batch)))
    hs, Xs = ms.apply(ps, batch)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(h0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(X0),
                               rtol=1e-5, atol=1e-5)

    # parameter gradients agree through the conversion
    def loss_u(p):
        h, X = m0.apply(p, batch)
        return jnp.sum(h ** 2) + jnp.sum(X ** 2)

    def loss_s(p):
        h, X = ms.apply(p, batch)
        return jnp.sum(h ** 2) + jnp.sum(X ** 2)

    g_u = jax.grad(loss_u)(p0)
    g_s = unroll_layer_params(jax.grad(loss_s)(ps), cfg.n_interactions)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # exact round-trip
    back = unroll_layer_params(ps, cfg.n_interactions)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_node_dtype_bf16_close_to_f32():
    """node_dtype=bf16 (MXU-rate node projections, PERF.md r05) keeps
    the same f32 parameter tree and stays within bf16 rounding of the
    f32 path; residual streams (h, X) remain f32 arrays."""
    import dataclasses

    import jax.numpy as jnp

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=3, lmax=2,
                         n_rbf=8, num_heads=4)
    rng = np.random.default_rng(7)
    graphs = _graphs(rng)
    db = collate_dense(graphs, 4, 12)
    m32 = GotenNetDense(cfg)
    m16 = GotenNetDense(dataclasses.replace(cfg, node_dtype=jnp.bfloat16))
    params = m32.init(jax.random.PRNGKey(0), db)
    assert (jax.tree_util.tree_structure(
        m16.init(jax.random.PRNGKey(0), db))
        == jax.tree_util.tree_structure(params))
    h32, X32 = m32.apply(params, db)
    h16, X16 = m16.apply(params, db)
    assert h16.dtype == jnp.float32 and X16.dtype == jnp.float32
    scale_h = float(np.abs(np.asarray(h32)).max())
    scale_x = float(np.abs(np.asarray(X32)).max())
    assert np.abs(np.asarray(h16) - np.asarray(h32)).max() < 0.05 * scale_h
    assert np.abs(np.asarray(X16) - np.asarray(X32)).max() < 0.05 * scale_x


def test_dense_packing_matches_unpacked():
    """Block-diagonal packing (collate_dense_packed): several molecules
    per M-slot slab with cross-molecule pairs masked must reproduce the
    unpacked per-molecule outputs exactly — representation, per-graph
    property, loss, and forces."""
    import dataclasses

    import jax.numpy as jnp

    from gotennet_tpu.graph.dense_batch import (
        collate_dense_packed,
        pack_molecules,
    )
    from gotennet_tpu.models.model import GotenModel, HeadConfig
    from gotennet_tpu.models.model import apply_with_forces

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4, scale_edge=True)
    rng = np.random.default_rng(11)
    sizes = (5, 7, 9, 4, 6)
    graphs = _graphs(rng, sizes=sizes)
    for i, g in enumerate(graphs):
        g["y"] = [float(i + 1)]
        g["dy"] = rng.standard_normal((len(g["z"]), 3)).astype(np.float32)

    db_u = collate_dense(graphs, len(graphs), 12, with_forces=True)
    P = 3
    db_p = collate_dense_packed(graphs, num_slabs=3, max_atoms=16,
                                mols_per_slab=P, with_forces=True)
    slabs = pack_molecules(sizes, 16, P)

    model = GotenModel(cfg, HeadConfig(kind="atomwise", derivative=True),
                       layout="dense")
    params = model.init(jax.random.PRNGKey(0), db_u)
    out_u = apply_with_forces(model, params, db_u)
    out_p = apply_with_forces(model, params, db_p)

    # per-molecule property: packed graph axis is slab * P + local
    offs = np.cumsum([0] + list(sizes))
    prop_u = np.asarray(out_u["property"])
    prop_p = np.asarray(out_p["property"])
    f_u = np.asarray(out_u["forces"]).reshape(len(graphs), 12, 3)
    f_p = np.asarray(out_p["forces"]).reshape(3, 16, 3)
    for s, members in enumerate(slabs):
        off = 0
        for local, i in enumerate(members):
            m = sizes[i]
            np.testing.assert_allclose(
                prop_p[s * P + local], prop_u[i], rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(
                f_p[s, off:off + m], f_u[i, :m], rtol=2e-3, atol=2e-4)
            off += m

    # loss over the packed batch equals the unpacked loss (targets
    # flatten [G, P, T] -> [G*P, T] with the mask excluding empty slots)
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import make_loss_fn
    e_model = GotenModel(cfg, HeadConfig(kind="atomwise"), layout="dense")
    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    loss_fn = make_loss_fn(e_model, task)
    l_u, _ = loss_fn(params, db_u, None, True)
    l_p, _ = loss_fn(params, db_p, None, True)
    np.testing.assert_allclose(float(l_p), float(l_u), rtol=2e-4)


def test_dense_loader_pack_covers_dataset():
    """The packing DenseLoader yields every molecule exactly once with
    targets attached to the right (slab, local) slots."""
    from gotennet_tpu.data.dataset import DenseLoader, synthetic_molecules

    ds = synthetic_molecules(37, seed=3, min_atoms=6, max_atoms=24)
    loader = DenseLoader(ds, batch_size=8, shuffle=True, seed=5,
                         max_atoms=32, pack=True)
    seen_y = []
    for b in loader:
        assert b.seg is not None
        gm = np.asarray(b.graph_mask)
        ys = np.asarray(b.y)
        seen_y.extend(ys[gm].reshape(-1).tolist())
        # every real atom slot's seg points at a real molecule slot
        mask = np.asarray(b.mask)
        seg = np.asarray(b.seg)
        for s in range(b.num_graphs):
            for local in np.unique(seg[s][mask[s]]):
                assert gm[s, local]
    assert len(seen_y) == len(ds)
    np.testing.assert_allclose(sorted(seen_y),
                               sorted(np.asarray(ds.y).reshape(-1)),
                               rtol=1e-6)


@pytest.mark.parametrize("aggr", ["mean", "max"])
def test_dense_aggr_mean_max_matches_edge_list(aggr):
    """GATA.aggregate mean/max (reference gotennet.py:613-657) in the
    dense layout: mean divides by real-pair counts, max reduces the
    complete per-pair message (dir + tensor terms jointly) — both must
    match the edge layout's segment reductions."""
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4, aggr=aggr)
    rng = np.random.default_rng(17)
    graphs = _graphs(rng)
    eb = collate_graphs(graphs, 32, 256, 4, cutoff=cfg.cutoff,
                        max_num_neighbors=32)
    db = collate_dense(graphs, 4, 12)
    edge_model = GotenNet(cfg)
    dense_model = GotenNetDense(cfg)
    params = edge_model.init(jax.random.PRNGKey(0), eb,
                             method=GotenNet.from_batch)
    h_e, X_e = edge_model.apply(params, eb, method=GotenNet.from_batch)
    h_d, X_d = dense_model.apply(params, db)
    h_e, X_e = np.asarray(h_e), np.asarray(X_e)
    h_d, X_d = np.asarray(h_d), np.asarray(X_d)
    off = 0
    for g, gr in enumerate(graphs):
        m = len(gr["z"])
        np.testing.assert_allclose(h_d[g, :m], h_e[off:off + m],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(X_d[g, :m], X_e[off:off + m],
                                   rtol=2e-4, atol=2e-5)
        off += m


def test_merge_proj_matches_per_projection():
    """merge_proj=True (grouped wide matmuls, PERF.md round 5) computes
    the same function as the per-projection path: identical init
    (values, not just structure — same param paths => same RNG keys),
    matching outputs and parameter gradients."""
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    batch = collate_dense(_graphs(rng), 4, 12)
    for kw in (dict(), dict(sep_htr=False),
               # evec_dim != D needs a lin_w projection back to D
               # (same constraint as the reference's gamma_w)
               dict(evec_dim=16, edge_updates="gated_linw_mlp")):
        cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                             n_rbf=8, num_heads=4, merge_proj=True, **kw)
        cfg0 = dataclasses.replace(cfg, merge_proj=False)
        m1, m0 = GotenNetDense(cfg), GotenNetDense(cfg0)
        p1 = m1.init(jax.random.PRNGKey(7), batch)
        p0 = m0.init(jax.random.PRNGKey(7), batch)
        assert jax.tree.structure(p1) == jax.tree.structure(p0)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        h1, X1 = m1.apply(p1, batch)
        h0, X0 = m0.apply(p0, batch)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X0),
                                   rtol=1e-5, atol=1e-5)

        def loss(m):
            def f(p):
                h, X = m.apply(p, batch)
                return jnp.sum(h ** 2) + jnp.sum(X ** 2)
            return f

        g1 = jax.grad(loss(m1))(p1)
        g0 = jax.grad(loss(m0))(p0)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
