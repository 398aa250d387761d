"""Output heads + force path: finite-difference gradients, rotation
behavior, atomref/standardization."""

import jax
import jax.numpy as jnp
import numpy as np

from gotennet_tpu.graph.neighborlist import collate_graphs
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel, HeadConfig, apply_with_forces

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                     num_heads=4)


def _batch(rng, sizes=(5, 6), **kw):
    graphs = [
        dict(z=rng.integers(1, 10, size=m),
             pos=rng.standard_normal((m, 3)) * 1.5, y=[1.0])
        for m in sizes
    ]
    return collate_graphs(graphs, 16, 128, 2, cutoff=CFG.cutoff, **kw)


def test_atomwise_atomref_and_standardization():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    atomref = np.zeros((100, 1), np.float32)
    atomref[1:10] = rng.standard_normal((9, 1))
    m0 = GotenModel(CFG, HeadConfig(kind="atomwise", mean=0.0, stddev=1.0))
    m1 = GotenModel(CFG, HeadConfig(kind="atomwise", mean=2.0, stddev=3.0,
                                    atomref=atomref))
    params = m0.init(jax.random.PRNGKey(0), batch)
    y0 = m0.apply(params, batch)["property"]
    y1 = m1.apply(params, batch)["property"]
    # y1 = 3*yi + 2 per atom + atomref sum
    z = np.asarray(batch.z)
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    for g in range(2):
        sel = nm & (ng == g)
        ref_sum = atomref[z[sel], 0].sum()
        n_atoms = sel.sum()
        np.testing.assert_allclose(
            np.asarray(y1)[g, 0],
            3.0 * np.asarray(y0)[g, 0] + 2.0 * n_atoms + ref_sum,
            rtol=1e-4, atol=1e-4)


def test_dipole_rotation_invariant_magnitude():
    rng = np.random.default_rng(1)
    sizes = (5, 6)
    graphs = [dict(z=rng.integers(1, 10, size=m),
                   pos=rng.standard_normal((m, 3)) * 1.5, y=[1.0])
              for m in sizes]
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = [dict(g, pos=g["pos"] @ q.T) for g in graphs]
    b = collate_graphs(graphs, 16, 128, 2, cutoff=CFG.cutoff)
    br = collate_graphs(rot, 16, 128, 2, cutoff=CFG.cutoff)
    model = GotenModel(CFG, HeadConfig(kind="dipole", mean=None, stddev=None))
    params = model.init(jax.random.PRNGKey(1), b)
    y = model.apply(params, b)["property"]
    yr = model.apply(params, br)["property"]
    np.testing.assert_allclose(np.asarray(yr), np.asarray(y), rtol=1e-4,
                               atol=1e-5)


def test_ese_head_runs():
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    model = GotenModel(CFG, HeadConfig(kind="electronic_spatial_extent",
                                       activation="ssp"))
    params = model.init(jax.random.PRNGKey(2), batch)
    y = model.apply(params, batch)["property"]
    assert np.isfinite(np.asarray(y)).all() and y.shape == (2, 1)


def test_forces_match_finite_differences():
    rng = np.random.default_rng(3)
    batch = _batch(rng, sizes=(4,))
    model = GotenModel(CFG, HeadConfig(kind="atomwise", derivative=True))
    params = model.init(jax.random.PRNGKey(3), batch)
    out = apply_with_forces(model, params, batch)
    forces = np.asarray(out["forces"])

    def energy(pos_flat):
        b = batch.replace(pos=pos_flat.reshape(batch.pos.shape))
        return float(np.asarray(
            model.apply(params, b)["property"]).sum())

    pos0 = np.asarray(batch.pos).ravel().astype(np.float64)
    eps = 1e-3
    # probe a handful of coordinates of real atoms
    for idx in [0, 1, 5, 10, 11]:
        dp = np.zeros_like(pos0)
        dp[idx] = eps
        num = (energy(pos0 + dp) - energy(pos0 - dp)) / (2 * eps)
        np.testing.assert_allclose(-num, forces.ravel()[idx], rtol=5e-2,
                                   atol=5e-4)


def test_force_equivariance():
    """Forces rotate with the molecule."""
    rng = np.random.default_rng(4)
    graphs = [dict(z=rng.integers(1, 10, size=5),
                   pos=rng.standard_normal((5, 3)) * 1.5, y=[1.0])]
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = [dict(g, pos=g["pos"] @ q.T) for g in graphs]
    b = collate_graphs(graphs, 8, 64, 1, cutoff=CFG.cutoff)
    br = collate_graphs(rot, 8, 64, 1, cutoff=CFG.cutoff)
    model = GotenModel(CFG, HeadConfig(kind="atomwise", derivative=True))
    params = model.init(jax.random.PRNGKey(5), b)
    f = np.asarray(apply_with_forces(model, params, b)["forces"])
    fr = np.asarray(apply_with_forces(model, params, br)["forces"])
    np.testing.assert_allclose(fr[:5], f[:5] @ q.T, rtol=1e-3, atol=1e-4)
