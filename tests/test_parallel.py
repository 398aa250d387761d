"""Data- and edge-parallel execution on a virtual 8-device CPU mesh:
forward equivalence, gradient equivalence vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.models.model import GotenModel, HeadConfig
from gotennet_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_graph_batch,
    stack_batches,
)
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.optim import make_optimizer
from gotennet_tpu.train.trainer import make_loss_fn

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                     num_heads=4, attn_dropout=0.0)


def _loader(n=32, bs=4):
    ds = synthetic_molecules(n, seed=0, min_atoms=5, max_atoms=9)
    return BatchLoader(ds, batch_size=bs, cutoff=CFG.cutoff,
                       node_capacity=40, edge_capacity=512)


def test_mesh_construction():
    mesh = make_mesh((4, 2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "edge")
    mesh = make_mesh((-1, 2))
    assert mesh.devices.shape == (4, 2)


def test_edge_parallel_forward_matches_single():
    """Forward with the edge list sharded over 4 devices == unsharded."""
    mesh = make_mesh((1, 4), axis_names=("data", "edge"))
    batch = next(iter(_loader()))
    cfg_par = GotenNetConfig(**{**CFG.__dict__, "edge_axis": "edge"})
    model = GotenNet(CFG)
    model_par = GotenNet(cfg_par)
    params = model.init(jax.random.PRNGKey(0), batch,
                        method=GotenNet.from_batch)
    h_ref, X_ref = model.apply(params, batch, method=GotenNet.from_batch)

    edge = P("edge")
    node = P()
    bspec = type(batch)(
        z=node, pos=node, node_graph=node, edge_src=edge, edge_dst=edge,
        node_mask=node, edge_mask=edge, graph_mask=node, y=node, dy=None)

    def fwd(b):
        return model_par.apply(params, b, method=GotenNet.from_batch)

    mapped = jax.shard_map(fwd, mesh=mesh, in_specs=(bspec,),
                           out_specs=(P(), P()), check_vma=False)
    h_par, X_par = jax.jit(mapped)(batch)
    np.testing.assert_allclose(np.asarray(h_par), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X_par), np.asarray(X_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mesh_shape,edge_axis", [
    ((8, 1), None),       # pure data parallel
    ((4, 2), "edge"),     # data x edge parallel
])
def test_parallel_train_step_matches_serial(mesh_shape, edge_axis):
    mesh = make_mesh(mesh_shape)
    n_data = mesh_shape[0]
    loader = _loader(n=n_data * 4, bs=4)
    batches = list(loader)[:n_data]

    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    cfg = GotenNetConfig(**{**CFG.__dict__, "edge_axis": edge_axis})
    model = GotenModel(cfg, task.build_head())
    model_serial = GotenModel(CFG, task.build_head())
    params = model_serial.init(jax.random.PRNGKey(0), batches[0])
    tx = make_optimizer(1e-3, 0.0, grad_clip=None)
    opt_state = tx.init(params)

    # serial reference first (the parallel step donates params/opt_state)
    loss_fn_serial = make_loss_fn(model_serial, task)

    def total_loss(p):
        losses = [loss_fn_serial(p, b, jax.random.PRNGKey(0), True)[0]
                  for b in batches]
        return sum(losses) / len(losses)

    loss_ref, grads_ref = jax.value_and_grad(total_loss)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    import optax
    p_ref = optax.apply_updates(params, updates)

    loss_fn = make_loss_fn(model, task)
    step = make_parallel_train_step(loss_fn, tx, mesh, edge_axis=edge_axis)
    stacked = shard_graph_batch(stack_batches(batches), mesh,
                                edge_axis=edge_axis)
    p_par, _, loss_par = step(params, opt_state, stacked,
                              jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(loss_par), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_par), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
