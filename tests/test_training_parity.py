"""End-to-end parity with the reference's TRAINING math, not just the
forward pass: full-model (representation + head) forward parity, and an
N-step optimization run — AdamW(eps 1e-7, weight decay), grad-clip 5.0,
linear LR warmup, MSE loss (≙ reference goten_model.py:276-578) — where
both frameworks start from converter-matched initialization on identical
synthetic batches and must agree per step on loss, gradients, and final
parameters.  Catches grad-path and LR-schedule divergence that
forward-allclose misses.
"""

import math

import jax
import numpy as np
import pytest
import torch

from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel, HeadConfig
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.trainer import Trainer, TrainerConfig, make_loss_fn
from gotennet_tpu.utils.torch_convert import (
    head_config_from_state_dict,
    load_reference_model,
    model_params_to_state_dict,
    state_dict_to_model_params,
)
from tests.torch_oracle import (
    TorchGotenModel,
    atomwise_head,
    dipole_head,
    ese_head,
    reference_forward,
)

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2, n_rbf=8,
                     num_heads=4, attn_dropout=0.0)


def _loader(n=12, bs=4, seed=0, min_atoms=5, max_atoms=9):
    ds = synthetic_molecules(n, seed=seed, min_atoms=min_atoms,
                             max_atoms=max_atoms)
    return BatchLoader(ds, batch_size=bs, cutoff=CFG.cutoff)


def _real_views(batch):
    """Unpadded views for the torch oracle: real nodes are contiguous
    at the front, real edges index only real nodes."""
    nm = np.asarray(batch.node_mask)
    em = np.asarray(batch.edge_mask)
    n_real = int(nm.sum())
    return (np.asarray(batch.z)[:n_real], np.asarray(batch.pos)[:n_real],
            np.asarray(batch.edge_src)[em], np.asarray(batch.edge_dst)[em],
            np.asarray(batch.node_graph)[:n_real],
            int(np.asarray(batch.graph_mask).sum()))


def _head_out_torch(model, sd, batch):
    z, pos, src, dst, bi, n_g = _real_views(batch)
    rep = {k[len("representation."):]: v for k, v in sd.items()
           if k.startswith("representation.")}
    h, X = reference_forward(rep, model.cfg, z, pos, src, dst)
    bi_t = torch.as_tensor(bi, dtype=torch.long)
    pos_t = torch.as_tensor(pos)
    if model.head.kind == "atomwise":
        return atomwise_head(sd, h, z, bi_t, n_g,
                             n_layers=model.head.n_layers)
    if model.head.kind == "dipole":
        return dipole_head(sd, h, X, pos_t, bi_t, n_g,
                           n_hidden=model.head.n_hidden or
                           model.cfg.n_atom_basis)
    return ese_head(sd, h, z, pos_t, bi_t, n_g,
                    n_layers=model.head.n_layers)


@pytest.mark.parametrize("head", [
    HeadConfig(kind="atomwise", mean=0.3, stddev=1.7, activation="silu"),
    HeadConfig(kind="atomwise", mean=-1.0, stddev=2.0, activation="silu",
               atomref=np.linspace(-1, 1, 100, dtype=np.float32)[:, None]),
    HeadConfig(kind="dipole", n_hidden=16, activation="silu"),
    HeadConfig(kind="electronic_spatial_extent", activation="ssp"),
])
def test_full_model_forward_parity(head):
    """GotenModel (representation + head) == torch oracle through the
    full-model state-dict converter, for every head family."""
    model = GotenModel(CFG, head)
    batch = next(iter(_loader()))
    params = model.init(jax.random.PRNGKey(0), batch)
    y_jax = np.asarray(model.apply(params, batch)["property"])

    sd = model_params_to_state_dict(params, CFG, head)
    if head.kind == "electronic_spatial_extent":
        from gotennet_tpu.models.heads import ATOMIC_MASSES
        sd["output_modules.0.atomic_mass"] = ATOMIC_MASSES
    y_t = _head_out_torch(model, sd, batch).detach().numpy()
    n_g = y_t.shape[0]
    np.testing.assert_allclose(y_jax[:n_g], y_t, rtol=2e-4, atol=2e-4)


def test_head_state_dict_roundtrip():
    """params -> reference naming -> params is the identity for the
    full model (head included)."""
    head = HeadConfig(kind="atomwise", mean=0.5, stddev=2.0,
                      activation="silu")
    model = GotenModel(CFG, head)
    batch = next(iter(_loader()))
    params = model.init(jax.random.PRNGKey(1), batch)
    sd = model_params_to_state_dict(params, CFG, head)
    tree = state_dict_to_model_params(sd, CFG, head)
    y0 = model.apply(params, batch)["property"]
    y1 = model.apply({"params": tree}, batch)["property"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)


def test_head_config_inference():
    """HeadConfig round-trips through reference state-dict naming."""
    head = HeadConfig(kind="atomwise", mean=0.25, stddev=3.0,
                      activation="silu",
                      atomref=np.arange(100, dtype=np.float32)[:, None])
    model = GotenModel(CFG, head)
    batch = next(iter(_loader()))
    params = model.init(jax.random.PRNGKey(2), batch)
    sd = model_params_to_state_dict(params, CFG, head)
    inferred = head_config_from_state_dict(sd)
    assert inferred.kind == "atomwise"
    assert inferred.mean == pytest.approx(0.25)
    assert inferred.stddev == pytest.approx(3.0)
    assert inferred.n_layers == head.n_layers
    np.testing.assert_array_equal(inferred.atomref[:, 0],
                                  np.arange(100, dtype=np.float32))

    dip = HeadConfig(kind="dipole", n_hidden=16, activation="silu")
    mdip = GotenModel(CFG, dip)
    pd = mdip.init(jax.random.PRNGKey(3), batch)
    sdd = model_params_to_state_dict(pd, CFG, dip)
    inf2 = head_config_from_state_dict(sdd)
    assert inf2.kind == "dipole" and inf2.n_hidden == 16


def test_load_reference_model_full(tmp_path):
    """A fabricated full reference Lightning checkpoint (representation
    + Atomwise head + buffers) loads into an end-to-end GotenModel that
    predicts identically — from_pretrained is real for whole models."""
    import os

    head = HeadConfig(kind="atomwise", mean=0.3, stddev=1.7,
                      activation="silu",
                      atomref=np.linspace(0, 1, 100,
                                          dtype=np.float32)[:, None])
    model = GotenModel(CFG, head)
    batch = next(iter(_loader()))
    params = model.init(jax.random.PRNGKey(4), batch)
    sd = model_params_to_state_dict(params, CFG, head)
    ckpt = {
        "hyper_parameters": {
            "task": "QM9", "label": 7, "cutoff": 5.0,
            "representation": {
                "__target__": "gotennet.models.representation.gotennet."
                              "GotenNetWrapper",
                "n_atom_basis": 32, "n_interactions": 2, "lmax": 2,
                "n_rbf": 8, "num_heads": 4,
            },
        },
        "state_dict": {k: torch.as_tensor(np.asarray(v).copy())
                       for k, v in sd.items()},
    }
    path = os.path.join(str(tmp_path), "full.ckpt")
    torch.save(ckpt, path)

    model2, params2, hp = load_reference_model(path)
    assert hp["label"] == 7
    assert model2.head.mean == pytest.approx(0.3)
    assert model2.head.stddev == pytest.approx(1.7)
    y0 = model.apply(params, batch)["property"]
    y1 = model2.apply(params2, batch)["property"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)


def test_training_parity_vs_torch():
    """8 optimizer steps of both frameworks from converter-matched init
    on identical batches: AdamW(lr 2e-3, eps 1e-7, wd 0.01), global-norm
    clip 5.0, linear warmup over 4 steps, MSE loss.  Per-step losses,
    step-0 gradients, and final parameters must agree."""
    head = HeadConfig(kind="atomwise", mean=0.1, stddev=1.5,
                      activation="silu")
    model = GotenModel(CFG, head)
    task = QM9Task("U0", dataset_meta={"mean": 0.1, "std": 1.5},
                   task_config={"task_loss": "MSELoss"})
    loader = _loader(n=12, bs=4)
    batches = list(loader)
    params = model.init(jax.random.PRNGKey(0), batches[0])

    base_lr, wd, clip, warmup = 2e-3, 0.01, 5.0, 4
    n_steps = 8

    # ---- torch side --------------------------------------------------
    sd0 = model_params_to_state_dict(params, CFG, head)
    tmodel = TorchGotenModel(sd0, CFG, n_head_layers=head.n_layers)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=base_lr, eps=1e-7,
                            weight_decay=wd)
    torch_losses, torch_grads0 = [], None
    for step in range(n_steps):
        b = batches[step % len(batches)]
        z, pos, src, dst, bi, n_g = _real_views(b)
        y_true = torch.as_tensor(np.asarray(b.y)[:n_g, :1])
        opt.zero_grad()
        pred = tmodel(z, pos, src, dst, bi, n_g)
        loss = ((pred - y_true) ** 2).mean()
        loss.backward()
        if step == 0:
            torch_grads0 = {k: g.detach().numpy().copy()
                            for k, g in tmodel.grads_by_key().items()}
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), clip)
        for group in opt.param_groups:  # linear warmup (reference
            group["lr"] = base_lr * min(1.0, (step + 1) / warmup)
        opt.step()
        torch_losses.append(float(loss))

    # ---- jax side (the shipped Trainer step) ---------------------------
    tcfg = TrainerConfig(lr=base_lr, weight_decay=wd, grad_clip=clip,
                         lr_warmup_steps=warmup, scheduler="none",
                         workdir="/tmp/parity_run")
    trainer = Trainer(model, task, tcfg)
    p = jax.tree.map(lambda x: x.copy(), params)
    opt_state = trainer.tx.init(p)
    rng = jax.random.PRNGKey(0)
    jax_losses = []
    for step in range(n_steps):
        b = batches[step % len(batches)]
        p, opt_state, rng, logs = trainer._train_step(
            p, opt_state, b, rng, trainer.lr_scale(step))
        jax_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4,
                               atol=1e-5)

    # step-0 gradients match through the converter (buffers excluded)
    loss_fn = make_loss_fn(trainer.model, task)
    g = jax.grad(lambda pp: loss_fn(pp, batches[0], None, True)[0])(params)
    g_sd = model_params_to_state_dict(g, CFG, head)
    for k, tg in torch_grads0.items():
        np.testing.assert_allclose(
            g_sd[k], tg, rtol=2e-3, atol=1e-6,
            err_msg=f"gradient mismatch at {k}")

    # final parameters agree after 8 heterogeneous-LR steps
    p_sd = model_params_to_state_dict(p, CFG, head)
    for k in torch_grads0:
        final_t = dict(zip(tmodel._param_keys,
                           (x.detach().numpy() for x in tmodel.plist)))[k]
        np.testing.assert_allclose(p_sd[k], final_t, rtol=2e-3, atol=2e-5,
                                   err_msg=f"param drift at {k}")


def test_training_parity_warmup_matters():
    """Sanity check on the harness itself: breaking the LR schedule on
    one side must break the parity (guards against a vacuous test)."""
    head = HeadConfig(kind="atomwise", mean=0.1, stddev=1.5,
                      activation="silu")
    model = GotenModel(CFG, head)
    batches = list(_loader(n=8, bs=4))
    params = model.init(jax.random.PRNGKey(0), batches[0])
    sd0 = model_params_to_state_dict(params, CFG, head)
    tmodel = TorchGotenModel(sd0, CFG)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=2e-3, eps=1e-7)
    losses_nowarm = []
    for step in range(4):
        b = batches[step % len(batches)]
        z, pos, src, dst, bi, n_g = _real_views(b)
        y_true = torch.as_tensor(np.asarray(b.y)[:n_g, :1])
        opt.zero_grad()
        loss = ((tmodel(z, pos, src, dst, bi, n_g) - y_true) ** 2).mean()
        loss.backward()
        opt.step()  # full LR from step 0 — no warmup
        losses_nowarm.append(float(loss))

    task = QM9Task("U0", dataset_meta={"mean": 0.1, "std": 1.5},
                   task_config={"task_loss": "MSELoss"})
    trainer = Trainer(model, task, TrainerConfig(
        lr=2e-3, grad_clip=None, lr_warmup_steps=4, scheduler="none",
        workdir="/tmp/parity_run2"))
    p = jax.tree.map(lambda x: x.copy(), params)
    opt_state = trainer.tx.init(p)
    rng = jax.random.PRNGKey(0)
    jl = []
    for step in range(4):
        b = batches[step % len(batches)]
        p, opt_state, rng, logs = trainer._train_step(
            p, opt_state, b, rng, trainer.lr_scale(step))
        jl.append(float(logs["loss"]))
    # warmup-suppressed updates learn more slowly -> later losses differ
    assert not math.isclose(jl[-1], losses_nowarm[-1], rel_tol=1e-3)


def test_use_ema_in_loss_parity_vs_torch(tmp_path):
    """use_ema_in_loss reproduces the reference's EMA-substituted
    training loss (goten_model.py:479-497): the backprop'd loss at step
    t>0 is rate*loss_t + (1-rate)*EMA_{t-1} with the EMA detached, so
    gradients scale by ema_rate.  8 optimizer steps from converter-
    matched init must agree on the logged (smoothed) losses and the
    final parameters."""
    head = HeadConfig(kind="atomwise", mean=0.1, stddev=1.5,
                      activation="silu")
    model = GotenModel(CFG, head)
    task = QM9Task("U0", dataset_meta={"mean": 0.1, "std": 1.5},
                   task_config={"task_loss": "MSELoss"})
    batches = list(_loader(n=12, bs=4))
    params = model.init(jax.random.PRNGKey(0), batches[0])
    base_lr, clip, rate, n_steps = 2e-3, 5.0, 0.3, 8

    # ---- torch side: the reference calculate_loss semantics ----------
    sd0 = model_params_to_state_dict(params, CFG, head)
    tmodel = TorchGotenModel(sd0, CFG, n_head_layers=head.n_layers)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=base_lr, eps=1e-7)
    ema = None
    torch_logged = []
    for step in range(n_steps):
        b = batches[step % len(batches)]
        z, pos, src, dst, bi, n_g = _real_views(b)
        y_true = torch.as_tensor(np.asarray(b.y)[:n_g, :1])
        opt.zero_grad()
        loss_i = ((tmodel(z, pos, src, dst, bi, n_g) - y_true) ** 2).mean()
        if ema is None:
            ema = loss_i.detach()           # first batch: store, no sub
        else:
            loss_i = rate * loss_i + (1 - rate) * ema
            ema = loss_i.detach()
        loss_i.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), clip)
        opt.step()
        torch_logged.append(float(loss_i))

    # ---- jax side: Trainer with use_ema_in_loss ----------------------
    tcfg = TrainerConfig(lr=base_lr, grad_clip=clip, scheduler="none",
                         ema_rate=rate, ema_stages=("train",),
                         use_ema_in_loss=True,
                         workdir=str(tmp_path))
    trainer = Trainer(model, task, tcfg)
    p = jax.tree.map(lambda x: x.copy(), params)
    opt_state = trainer.tx.init(p)
    rng = jax.random.PRNGKey(0)
    jax_logged = []
    for step in range(n_steps):
        b = batches[step % len(batches)]
        scale = trainer._ema_grad_scale()   # fit()'s host-side sequence
        p, opt_state, rng, logs = trainer._train_step(
            p, opt_state, b, rng, 1.0, scale)
        jax_logged.append(trainer._stage_ema("train", float(logs["loss"])))

    assert trainer._ema_grad_scale() == rate  # engaged after step 0
    np.testing.assert_allclose(jax_logged, torch_logged, rtol=5e-4,
                               atol=1e-5)
    p_sd = model_params_to_state_dict(p, CFG, head)
    final_t = dict(zip(tmodel._param_keys,
                       (x.detach().numpy() for x in tmodel.plist)))
    for k in final_t:
        np.testing.assert_allclose(p_sd[k], final_t[k], rtol=2e-3,
                                   atol=2e-5, err_msg=f"param drift at {k}")


def test_cli_test_evaluates_reference_ckpt(tmp_path):
    """cli.test on a published-format Lightning .ckpt: full model is
    rebuilt (head included), label inferred from hyper_parameters —
    the pre-wired real-data parity path."""
    import os

    from gotennet_tpu.cli import CONFIG_DIR, test as cli_test
    from gotennet_tpu.utils.config import load_config

    head = HeadConfig(kind="atomwise", mean=0.2, stddev=1.3,
                      activation="silu")
    model = GotenModel(CFG, head)
    batch = next(iter(_loader()))
    params = model.init(jax.random.PRNGKey(5), batch)
    sd = model_params_to_state_dict(params, CFG, head)
    ckpt = {
        "hyper_parameters": {
            "task": "QM9", "label": 7, "cutoff": 5.0,
            "representation": {"n_atom_basis": 32, "n_interactions": 2,
                               "lmax": 2, "n_rbf": 8, "num_heads": 4},
        },
        "state_dict": {k: torch.as_tensor(np.asarray(v).copy())
                       for k, v in sd.items()},
    }
    path = os.path.join(str(tmp_path), "QM9_small_U0.ckpt")
    torch.save(ckpt, path)

    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/eval",
                       f"checkpoint={path}"])
    cfg.pop("label", None)   # must come from the checkpoint
    os.makedirs(cfg["workdir"], exist_ok=True)
    results = cli_test(cfg)
    assert np.isfinite(results["MeanAbsoluteError"])
