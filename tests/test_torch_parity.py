"""Cross-framework parity: JAX models vs the pure-torch oracle of the
reference math, through the reference-format state-dict converter.

This is the practical substitute for running the mounted PyTorch
reference directly (its import needs torch_geometric, absent here):
the oracle re-derives the reference semantics in torch, the converter
maps our params to reference state-dict naming, and the outputs must
agree.  Validates model math, parameter naming, and weight layouts in
one shot — a converter bug or a misread of the reference shows up as a
mismatch.
"""

import jax
import numpy as np
import pytest

from gotennet_tpu.graph.neighborlist import collate_graphs
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.utils.torch_convert import (
    params_to_state_dict,
    state_dict_to_params,
)
from tests.torch_oracle import reference_forward


def _graphs(rng, sizes=(5, 7)):
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


# Every edge_updates token, both pre-norms, all aggrs, all bases —
# each oracle-checked, not just dense-vs-edge self-checked
# (≙ reference gotennet.py:139-292 config grammar).
ORACLE_CONFIGS = [
    _cfg(),
    _cfg(n_interactions=3, lmax=1, sep_dir=False, sep_tensor=False,
         scale_edge=True),
    _cfg(edge_updates="norej"),
    _cfg(edge_updates="gated_linw"),
    _cfg(edge_updates="gatedt_linwa_ln"),
    _cfg(edge_updates="act_linw_postln"),
    _cfg(edge_updates="mlp", edge_ln="layer"),
    _cfg(edge_updates="mlpa"),
    _cfg(layernorm="layer", steerable_norm="layer"),
    _cfg(aggr="mean"),
    _cfg(aggr="max"),
    _cfg(radial_basis="GaussianRBF"),
    _cfg(radial_basis="BesselBasis"),
    _cfg(sep_htr=False),           # full-axis rejection
    _cfg(sep_htr=False, edge_updates="norej"),
]


@pytest.mark.parametrize(
    "cfg", ORACLE_CONFIGS,
    ids=lambda c: f"eu={c.edge_updates}_ln={c.layernorm}{c.steerable_norm}"
                  f"_aggr={c.aggr}_rbf={c.radial_basis}_sh={c.sep_htr}"
                  f"_sd={c.sep_dir}")
def test_jax_matches_torch_oracle(cfg):
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    batch = collate_graphs(graphs, 16, 128, 2, cutoff=cfg.cutoff)

    model = GotenNet(cfg)
    params = model.init(jax.random.PRNGKey(0), batch,
                        method=GotenNet.from_batch)
    h_jax, X_jax = model.apply(params, batch, method=GotenNet.from_batch)

    sd = params_to_state_dict(params, cfg)
    # run the oracle on the real (unpadded) edges
    em = np.asarray(batch.edge_mask)
    h_t, X_t = reference_forward(
        sd, cfg, np.asarray(batch.z), np.asarray(batch.pos),
        np.asarray(batch.edge_src)[em], np.asarray(batch.edge_dst)[em])

    n_real = sum(len(g["z"]) for g in graphs)
    np.testing.assert_allclose(np.asarray(h_jax)[:n_real],
                               h_t.numpy()[:n_real], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(X_jax)[:n_real],
                               X_t.numpy()[:n_real], rtol=2e-4, atol=2e-4)


def test_state_dict_round_trip():
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4)
    rng = np.random.default_rng(1)
    batch = collate_graphs(_graphs(rng), 16, 128, 2, cutoff=cfg.cutoff)
    model = GotenNet(cfg)
    params = model.init(jax.random.PRNGKey(2), batch,
                        method=GotenNet.from_batch)
    sd = params_to_state_dict(params, cfg, prefix="representation.")
    tree = state_dict_to_params(sd, cfg)
    restored = {"params": tree}
    h0, X0 = model.apply(params, batch, method=GotenNet.from_batch)
    h1, X1 = model.apply(restored, batch, method=GotenNet.from_batch)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X0), rtol=1e-6)


def test_load_reference_lightning_checkpoint(tmp_path):
    """A fabricated reference-format .ckpt round-trips into our model."""
    import os
    import torch

    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                         n_rbf=8, num_heads=4)
    rng = np.random.default_rng(3)
    batch = collate_graphs(_graphs(rng), 16, 128, 2, cutoff=cfg.cutoff)
    model = GotenNet(cfg)
    params = model.init(jax.random.PRNGKey(4), batch,
                        method=GotenNet.from_batch)
    sd = params_to_state_dict(params, cfg, prefix="representation.")
    ckpt = {
        "hyper_parameters": {
            "cutoff": 5.0,
            "representation": {
                "__target__": "gotennet.models.representation.gotennet.GotenNetWrapper",
                "n_atom_basis": 32, "n_interactions": 2, "lmax": 2,
                "n_rbf": 8, "num_heads": 4,
            },
        },
        "state_dict": {k: torch.as_tensor(v.copy()) for k, v in sd.items()},
    }
    path = os.path.join(str(tmp_path), "ref.ckpt")
    torch.save(ckpt, path)

    from gotennet_tpu.utils.torch_convert import load_reference_checkpoint
    cfg2, params2 = load_reference_checkpoint(path)
    assert cfg2.n_atom_basis == 32 and cfg2.lmax == 2
    h0, X0 = model.apply(params, batch, method=GotenNet.from_batch)
    h1, X1 = GotenNet(cfg2).apply(params2, batch, method=GotenNet.from_batch)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-6)


def test_fused_kernels_match_torch_oracle():
    """The Pallas kernels (message + HTR, interpret mode) reproduce the
    reference math directly: GotenNetDense(fused=True, fused_htr=True)
    vs the independent torch re-derivation, through the reference
    state-dict converter (not just fused-vs-unfused self-checks)."""
    import dataclasses

    from gotennet_tpu.graph.dense_batch import collate_dense
    from gotennet_tpu.models.gotennet_dense import GotenNetDense

    cfg = dataclasses.replace(_cfg(), fused=True, fused_htr=True)
    rng = np.random.default_rng(0)
    graphs = _graphs(rng)
    db = collate_dense(graphs, 2, 8)
    model = GotenNetDense(cfg)
    params = model.init(jax.random.PRNGKey(0), db)
    h_jax, X_jax = model.apply(params, db)

    sd = params_to_state_dict(params, cfg)
    batch = collate_graphs(graphs, 16, 128, 2, cutoff=cfg.cutoff)
    em = np.asarray(batch.edge_mask)
    h_t, X_t = reference_forward(
        sd, cfg, np.asarray(batch.z), np.asarray(batch.pos),
        np.asarray(batch.edge_src)[em], np.asarray(batch.edge_dst)[em])
    h_t, X_t = h_t.numpy(), X_t.numpy()
    off = 0
    for g, gr in enumerate(graphs):
        m = len(gr["z"])
        np.testing.assert_allclose(np.asarray(h_jax)[g, :m],
                                   h_t[off:off + m], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(X_jax)[g, :m],
                                   X_t[off:off + m], rtol=2e-4, atol=2e-4)
        off += m
