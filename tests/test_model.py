"""Representation-core correctness: E(3)-equivariance, padding
invariance, permutation invariance, and config variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gotennet_tpu.graph.neighborlist import collate_graphs
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.ops.spherical import degree_slices

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                     num_heads=4)


def _graphs(rng, sizes=(5, 7)):
    return [
        dict(z=rng.integers(1, 10, size=m), pos=rng.standard_normal((m, 3)) * 1.5,
             y=[0.0])
        for m in sizes
    ]


def _forward(cfg, graphs, num_nodes=24, num_edges=160, num_graphs=3, seed=0):
    batch = collate_graphs(graphs, num_nodes, num_edges, num_graphs,
                           cutoff=cfg.cutoff)
    model = GotenNet(cfg)
    params = model.init(jax.random.PRNGKey(seed), batch, method=GotenNet.from_batch)
    h, X = model.apply(params, batch, method=GotenNet.from_batch)
    return batch, params, np.asarray(h), np.asarray(X)


def test_padding_invariance():
    """Real-node outputs must not depend on padding capacities."""
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    model = GotenNet(CFG)
    b1 = collate_graphs(graphs, 16, 128, 2, cutoff=CFG.cutoff)
    b2 = collate_graphs(graphs, 40, 512, 5, cutoff=CFG.cutoff)
    params = model.init(jax.random.PRNGKey(0), b1, method=GotenNet.from_batch)
    h1, X1 = model.apply(params, b1, method=GotenNet.from_batch)
    h2, X2 = model.apply(params, b2, method=GotenNet.from_batch)
    n = 12  # total real nodes
    np.testing.assert_allclose(np.asarray(h1)[:n], np.asarray(h2)[:n],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(X1)[:n], np.asarray(X2)[:n],
                               rtol=2e-5, atol=2e-5)


def test_rotation_equivariance():
    """h invariant; per-degree X norms invariant under rigid rotation."""
    rng = np.random.default_rng(1)
    graphs = _graphs(rng)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = [dict(g, pos=g["pos"] @ q.T) for g in graphs]

    model = GotenNet(CFG)
    b = collate_graphs(graphs, 16, 128, 2, cutoff=CFG.cutoff)
    br = collate_graphs(rot, 16, 128, 2, cutoff=CFG.cutoff)
    params = model.init(jax.random.PRNGKey(1), b, method=GotenNet.from_batch)
    h, X = model.apply(params, b, method=GotenNet.from_batch)
    hr, Xr = model.apply(params, br, method=GotenNet.from_batch)

    np.testing.assert_allclose(np.asarray(hr), np.asarray(h),
                               rtol=1e-4, atol=1e-4)
    X, Xr = np.asarray(X), np.asarray(Xr)
    for lo, hi in degree_slices(CFG.lmax):
        n = np.linalg.norm(X[:, lo:hi, :], axis=1)
        nr = np.linalg.norm(Xr[:, lo:hi, :], axis=1)
        np.testing.assert_allclose(nr, n, rtol=1e-4, atol=1e-4)
    # l=1 block rotates as a vector: X_r(l=1) == R_sh @ X(l=1), where
    # R_sh acts in (x, y, z) component order
    perm = np.asarray([[0, 1, 2]])  # components already ordered x,y,z
    r_sh = q  # for l=1 the SH components are just the Cartesian coords
    np.testing.assert_allclose(
        Xr[:, 0:3, :], np.einsum("ab,nbc->nac", r_sh, X[:, 0:3, :]),
        rtol=1e-4, atol=1e-4)


def test_translation_invariance():
    rng = np.random.default_rng(2)
    graphs = _graphs(rng)
    shifted = [dict(g, pos=g["pos"] + np.asarray([10.0, -3.0, 7.0])) for g in graphs]
    model = GotenNet(CFG)
    b = collate_graphs(graphs, 16, 128, 2, cutoff=CFG.cutoff)
    bs = collate_graphs(shifted, 16, 128, 2, cutoff=CFG.cutoff)
    params = model.init(jax.random.PRNGKey(2), b, method=GotenNet.from_batch)
    h, X = model.apply(params, b, method=GotenNet.from_batch)
    hs, Xs = model.apply(params, bs, method=GotenNet.from_batch)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(h), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(X), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("cfg", [
    GotenNetConfig(n_atom_basis=32, n_interactions=1, lmax=1, n_rbf=8,
                   num_heads=4, sep_dir=False, sep_tensor=False),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=3, n_rbf=8,
                   num_heads=4, scale_edge=True,
                   edge_updates="gated_linw_mlp"),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                   num_heads=4, layernorm="layer", steerable_norm="norm",
                   aggr="mean", sep_htr=False),
    GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                   num_heads=4, radial_basis="BesselBasis", aggr="max"),
])
def test_config_variants_run(cfg):
    rng = np.random.default_rng(3)
    _, _, h, X = _forward(cfg, _graphs(rng))
    assert np.isfinite(h).all() and np.isfinite(X).all()
    assert X.shape[1] == cfg.sh_dim


def test_graph_independence():
    """A molecule's output is unchanged by other molecules in the batch."""
    rng = np.random.default_rng(4)
    g1, g2 = _graphs(rng)
    model = GotenNet(CFG)
    b_single = collate_graphs([g1], 16, 128, 2, cutoff=CFG.cutoff)
    b_pair = collate_graphs([g1, g2], 16, 128, 2, cutoff=CFG.cutoff)
    params = model.init(jax.random.PRNGKey(4), b_single,
                        method=GotenNet.from_batch)
    h1, _ = model.apply(params, b_single, method=GotenNet.from_batch)
    h2, _ = model.apply(params, b_pair, method=GotenNet.from_batch)
    m = len(g1["z"])
    np.testing.assert_allclose(np.asarray(h1)[:m], np.asarray(h2)[:m],
                               rtol=2e-5, atol=2e-5)


def test_fused_config_grammar_guards():
    """fused=True is only valid for the kernel-supported grammar:
    silu/swish activation (any spelling) and aggr='add'; anything else
    is an explicit config error pointing at fused=False."""
    import pytest

    from gotennet_tpu.models.gotennet import GotenNetConfig

    GotenNetConfig(n_atom_basis=32, num_heads=4, fused=True,
                   activation="SiLU")  # case-insensitive, no error
    with pytest.raises(ValueError, match="hardcodes silu"):
        GotenNetConfig(n_atom_basis=32, num_heads=4, fused=True,
                       activation="relu")
    with pytest.raises(ValueError, match="aggr='add'"):
        GotenNetConfig(n_atom_basis=32, num_heads=4, fused=True,
                       aggr="mean")
