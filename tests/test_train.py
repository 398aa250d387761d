"""Training system: tiny-dataset overfit, checkpoint round-trip,
scheduler/EMA semantics, alias validation."""

import os

import jax
import numpy as np
import pytest

from gotennet_tpu.data.dataset import BatchLoader, make_splits, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel, HeadConfig
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.optim import PlateauState, plateau_update, warmup_scale
from gotennet_tpu.train.trainer import Trainer, TrainerConfig

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1, n_rbf=8,
                     num_heads=4, attn_dropout=0.0)


def _setup(tmp_path, n=24):
    ds = synthetic_molecules(n, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(CFG, task.build_head())
    loader = BatchLoader(ds, batch_size=8, cutoff=CFG.cutoff, shuffle=True)
    tcfg = TrainerConfig(lr=5e-3, max_epochs=30, workdir=str(tmp_path),
                         log_every=1000, scheduler="none")
    return model, task, loader, tcfg


def test_overfit_tiny(tmp_path):
    model, task, loader, tcfg = _setup(tmp_path)
    trainer = Trainer(model, task, tcfg)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    first = trainer.evaluate(params, loader)["val_loss"]
    params, history = trainer.fit(params, loader, loader)
    last = history[-1]["val_loss"]
    assert np.isfinite(last)
    assert last < first * 0.25, f"no learning: {first} -> {last}"


def test_checkpoint_roundtrip(tmp_path):
    from gotennet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    model, task, loader, _ = _setup(tmp_path)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(1), batch)
    y0 = model.apply(params, batch)["property"]
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, params, step=7, model=model)
    model2, params2, step = load_checkpoint(path)
    assert step == 7
    assert model2.cfg == model.cfg
    y1 = model2.apply(params2, batch)["property"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)


def test_plateau_and_warmup():
    st = PlateauState(factor=0.5, patience=1, min_lr=1e-6)
    st = plateau_update(st, 1.0, base_lr=1e-3)  # best=1.0
    assert st.scale == 1.0
    st = plateau_update(st, 2.0, base_lr=1e-3)  # bad 1
    assert st.scale == 1.0 and st.num_bad == 1
    st = plateau_update(st, 2.0, base_lr=1e-3)  # bad 2 > patience -> decay
    assert st.scale == 0.5 and st.num_bad == 0
    st = plateau_update(st, 0.5, base_lr=1e-3)  # improves
    assert st.best == 0.5 and st.scale == 0.5

    assert warmup_scale(0, 10) == pytest.approx(0.1)
    assert warmup_scale(9, 10) == 1.0
    assert warmup_scale(0, 0) == 1.0


def test_make_splits_roundtrip(tmp_path):
    p = os.path.join(str(tmp_path), "splits.npz")
    tr, va, te = make_splits(100, 60, 20, None, seed=1, save_path=p)
    assert len(tr) == 60 and len(va) == 20 and len(te) == 20
    assert len(set(tr) | set(va) | set(te)) == 100
    tr2, va2, te2 = make_splits(100, 1, 1, 1, seed=99, splits_path=p)
    np.testing.assert_array_equal(tr, tr2)

    tr, va, te = make_splits(100, 0.5, 0.3, None, seed=1)
    assert len(tr) == 50 and len(va) == 30 and len(te) == 20


def test_alias_validation():
    from gotennet_tpu.utils.hub import resolve_checkpoint
    with pytest.raises(ValueError):
        resolve_checkpoint("bogus")
    with pytest.raises(ValueError):
        resolve_checkpoint("QM9_gigantic_homo")
    with pytest.raises(ValueError):
        resolve_checkpoint("rMD17_small_aspirin")  # rMD17 has 'base' only
    with pytest.raises(ValueError):
        resolve_checkpoint("QM9_small_nonexistent")


def test_force_training_step(tmp_path):
    """Grad-of-grad: one optimization step on an energy+force loss."""
    from gotennet_tpu.tasks.force_task import MD17Task
    ds = synthetic_molecules(8, seed=1, min_atoms=5, max_atoms=8,
                             with_forces=True)
    task = MD17Task("aspirin", dataset_meta={"mean": 0.0, "std": 1.0})
    model = GotenModel(CFG, task.build_head())
    loader = BatchLoader(ds, batch_size=4, cutoff=CFG.cutoff)
    tcfg = TrainerConfig(lr=1e-3, max_epochs=2, workdir=str(tmp_path),
                         scheduler="none")
    trainer = Trainer(model, task, tcfg)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(2), batch)
    params, history = trainer.fit(params, loader, loader)
    assert np.isfinite(history[-1]["val_loss"])
    assert "MeanAbsoluteError_force" in history[-1]


def test_grad_accumulation_matches_big_batch(tmp_path):
    """4 accumulated chunks == the averaged-gradient update."""
    import jax
    import jax.numpy as jnp
    import optax
    from gotennet_tpu.train.optim import make_optimizer
    from gotennet_tpu.train.trainer import make_loss_fn

    model, task, loader, _ = _setup(tmp_path, n=16)
    batches = list(loader)[:2]
    params = model.init(jax.random.PRNGKey(0), batches[0])
    loss_fn = make_loss_fn(model, task)

    # reference first: the trainer step donates params/opt_state buffers
    def total(p):
        return sum(loss_fn(p, b, None, True)[0] for b in batches) / 2
    g = jax.grad(total)(params)
    tx = make_optimizer(1e-3, 0.0, grad_clip=None)
    u, _ = tx.update(g, tx.init(params), params)
    p_ref = optax.apply_updates(params, u)

    tcfg = TrainerConfig(lr=1e-3, workdir=str(tmp_path), scheduler="none",
                         grad_accum_steps=2, grad_clip=None)
    trainer = Trainer(model, task, tcfg)
    opt_state = trainer.tx.init(params)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    p1, _, _, logs = trainer._train_step(params, opt_state, stacked,
                                         jax.random.PRNGKey(3), 1.0)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_trailing_remainder(tmp_path):
    """n_batches % grad_accum != 0: the trailing batch still trains —
    _chunked pads the final group with all-masked chunks and
    _accum_grads averages over the real ones only, so the last update
    equals a plain single-batch step."""
    import jax
    import optax
    from gotennet_tpu.train.trainer import _chunked, make_loss_fn

    model, task, loader, _ = _setup(tmp_path, n=24)
    batches = list(loader)[:3]          # 3 batches, accum 2 -> remainder 1
    params = model.init(jax.random.PRNGKey(0), batches[0])

    groups = list(_chunked(iter(batches), 2))
    assert len(groups) == 2, "trailing remainder was dropped"
    # the pad chunk is fully masked
    assert np.asarray(groups[1].graph_mask)[1].sum() == 0

    # reference first (the trainer step donates params/opt_state):
    # plain single-batch update on the tail batch
    loss_fn = make_loss_fn(model, task)
    g_ref = jax.grad(lambda p: loss_fn(p, batches[2], None, True)[0])(params)

    tcfg = TrainerConfig(lr=1e-3, workdir=str(tmp_path), scheduler="none",
                         grad_accum_steps=2, grad_clip=None)
    trainer = Trainer(model, task, tcfg)
    u, _ = trainer.tx.update(g_ref, trainer.tx.init(params), params)
    p_ref = optax.apply_updates(params, u)
    l_ref = float(loss_fn(params, batches[2], None, True)[0])

    opt_state = trainer.tx.init(params)
    p1, _, _, logs = trainer._train_step(params, opt_state, groups[1],
                                         jax.random.PRNGKey(3), 1.0)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # and the logged loss is the tail batch's own loss, not halved
    assert float(logs["loss"]) == pytest.approx(l_ref, rel=1e-4)


def test_resume_from_last_checkpoint(tmp_path):
    model, task, loader, tcfg = _setup(tmp_path)
    tcfg.max_epochs = 2
    trainer = Trainer(model, task, tcfg)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    params, _ = trainer.fit(params, loader, loader)

    # resume continues the epoch counter: max_epochs is the TOTAL
    tcfg2 = TrainerConfig(**{**tcfg.__dict__, "resume": True,
                             "max_epochs": 3})
    trainer2 = Trainer(model, task, tcfg2)
    fresh = model.init(jax.random.PRNGKey(99), next(iter(loader)))
    resumed, hist = trainer2.fit(fresh, loader, loader)
    # resumed training starts from the saved params, not `fresh`
    assert np.isfinite(hist[-1]["val_loss"])
    assert [h["epoch"] for h in hist] == [2]
    # step counter resumed past the first run's steps
    assert hist[-1]["step"] > 3


def test_full_state_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume reproduces the uninterrupted run's trajectory:
    optimizer moments, plateau/EMA state, epoch counter, RNG and batch
    order all survive the checkpoint (≙ Lightning ckpt_path,
    reference training_pipeline.py:44-50,132)."""
    model, task, loader, tcfg = _setup(tmp_path)
    base = {**tcfg.__dict__, "scheduler": "plateau", "ema_rate": 0.2,
            "lr_patience": 0, "lr_decay": 0.5}
    params0 = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    cfg_a = TrainerConfig(**{**base, "max_epochs": 4,
                             "workdir": str(tmp_path / "A")})
    params_a, hist_a = Trainer(model, task, cfg_a).fit(
        params0, loader, loader)

    cfg_b1 = TrainerConfig(**{**base, "max_epochs": 2,
                              "workdir": str(tmp_path / "B")})
    Trainer(model, task, cfg_b1).fit(params0, loader, loader)

    # the saved checkpoint carries real optimizer moments
    from gotennet_tpu.train.checkpoint import load_train_state
    trainer_b = Trainer(model, task, TrainerConfig(
        **{**base, "max_epochs": 4, "workdir": str(tmp_path / "B"),
           "resume": True}))
    template = trainer_b.tx.init(params0)
    opt_restored, ts = load_train_state(
        os.path.join(cfg_b1.workdir, "ckpt_last"), template)
    assert opt_restored is not None
    assert ts["epoch"] == 1
    assert any(np.abs(np.asarray(leaf)).sum() > 0
               for leaf in jax.tree.leaves(opt_restored))

    params_b, hist_b = trainer_b.fit(params0, loader, loader)
    assert [h["epoch"] for h in hist_b] == [2, 3]
    for h_a, h_b in zip(hist_a[2:], hist_b):
        np.testing.assert_allclose(h_a["val_loss"], h_b["val_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(h_a["lr_scale"], h_b["lr_scale"],
                                   rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
