"""Multi-device Trainer path (data x edge mesh), monitor split, and
per-stage loss EMA — all on the virtual 8-device CPU mesh."""

import json
import os

import jax
import numpy as np

from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.trainer import Trainer, TrainerConfig

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1, n_rbf=8,
                     num_heads=4, attn_dropout=0.0)


def _setup(tmp_path, n=16, **tkw):
    ds = synthetic_molecules(n, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(CFG, task.build_head())
    loader = BatchLoader(ds, batch_size=4, cutoff=CFG.cutoff,
                         shuffle=False)
    tcfg = TrainerConfig(lr=1e-3, max_epochs=1, workdir=str(tmp_path),
                         log_every=1000, scheduler="none", **tkw)
    return model, task, loader, tcfg


def _allclose_trees(a, b, rtol=1e-4, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_data_parallel_matches_grad_accum(tmp_path):
    """dp=2 over 2 batches == grad_accum=2 over the same 2 batches:
    both average the per-chunk gradients before one AdamW update."""
    model, task, loader, _ = _setup(tmp_path / "a")
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_acc = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", grad_accum_steps=2,
        workdir=str(tmp_path / "acc")))
    p_acc, h_acc = t_acc.fit(params, loader, loader)

    t_dp = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", data_parallel=2,
        workdir=str(tmp_path / "dp")))
    p_dp, h_dp = t_dp.fit(params, loader, loader)

    _allclose_trees(p_acc, p_dp)
    assert np.isclose(h_acc[-1]["val_loss"], h_dp[-1]["val_loss"],
                      rtol=1e-4)


def test_edge_parallel_matches_single_device(tmp_path):
    """Edge-partitioned training (ep=2) produces the same update as the
    single-device step: segment reductions psum over the edge axis."""
    model, task, loader, _ = _setup(tmp_path / "a")
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_ser = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none",
        workdir=str(tmp_path / "ser")))
    p_ser, _ = t_ser.fit(params, loader, loader)

    t_ep = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", edge_parallel=2,
        workdir=str(tmp_path / "ep")))
    p_ep, _ = t_ep.fit(params, loader, loader)

    _allclose_trees(p_ser, p_ep)


def test_parallel_eval_matches_serial(tmp_path):
    """Sharded evaluation (incl. the partial trailing group fallback)
    reproduces single-device metrics exactly."""
    model, task, loader, tcfg = _setup(tmp_path / "x", n=20)  # 5 batches
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    t_ser = Trainer(model, task, TrainerConfig(
        lr=1e-3, workdir=str(tmp_path / "s")))
    t_par = Trainer(model, task, TrainerConfig(
        lr=1e-3, data_parallel=2, workdir=str(tmp_path / "p")))
    # 5 batches over dp=2 -> 2 full groups + 1 fallback batch
    m_ser = t_ser.evaluate(params, loader)
    m_par = t_par.evaluate(params, loader)
    for k in m_ser:
        np.testing.assert_allclose(m_par[k], m_ser[k], rtol=1e-5,
                                   err_msg=k)


def test_monitor_split_checkpoint_vs_early_stop(tmp_path, monkeypatch):
    """Checkpoint selection follows monitor_checkpoint (MAE) while
    early-stop/plateau follow monitor (val_loss) — the reference's
    qm9.yaml:33-39 split."""
    model, task, loader, _ = _setup(tmp_path)
    tcfg = TrainerConfig(
        lr=1e-3, max_epochs=3, scheduler="none", workdir=str(tmp_path),
        monitor="val_loss", monitor_checkpoint="MeanAbsoluteError",
        early_stopping_patience=10)
    trainer = Trainer(model, task, tcfg)
    # scripted validation metrics: val_loss best at epoch 1,
    # MAE best at epoch 2
    script = iter([
        {"val_loss": 1.0, "MeanAbsoluteError": 1.0,
         "MeanSquaredError": 1.0},
        {"val_loss": 0.5, "MeanAbsoluteError": 2.0,
         "MeanSquaredError": 1.0},
        {"val_loss": 0.7, "MeanAbsoluteError": 0.2,
         "MeanSquaredError": 1.0},
    ])
    monkeypatch.setattr(trainer, "evaluate",
                        lambda *a, **k: dict(next(script)))
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    trainer.fit(params, loader, loader)

    with open(os.path.join(str(tmp_path), "ckpt_best", "meta.json")) as f:
        best_meta = json.load(f)
    with open(os.path.join(str(tmp_path), "ckpt_last", "meta.json")) as f:
        last_meta = json.load(f)
    # best checkpoint was written at the LAST epoch (MAE minimum),
    # even though val_loss worsened after epoch 1
    assert best_meta["step"] == last_meta["step"]
    # checkpoint meta carries task/label for the test pipeline
    assert best_meta["task"] == "QM9" and best_meta["label"] == "U0"


def test_per_stage_loss_ema(tmp_path):
    """EMA replaces values per stage with the reference recursion
    ema <- rate*x + (1-rate)*ema (goten_model.py:479-497), keyed by
    stage, only for stages in ema_stages."""
    model, task, loader, _ = _setup(tmp_path)
    tcfg = TrainerConfig(lr=1e-3, workdir=str(tmp_path), ema_rate=0.5,
                         ema_stages=("train", "validation"))
    trainer = Trainer(model, task, tcfg)
    assert trainer._stage_ema("train", 4.0) == 4.0          # seeds
    assert trainer._stage_ema("train", 2.0) == 3.0          # 0.5*2+0.5*4
    assert trainer._stage_ema("validation", 10.0) == 10.0   # separate key
    assert trainer._stage_ema("validation", 2.0) == 6.0
    assert trainer._stage_ema("test", 100.0) == 100.0       # not in stages
    assert trainer._stage_ema("test", 0.0) == 0.0           # pass-through
    assert set(trainer.ema) == {"train_loss", "validation_loss"}


def test_csv_logger_backend(tmp_path):
    """CSV backend writes one file per phase so train and val_epoch
    records (disjoint key sets) both keep all their columns."""
    from gotennet_tpu.utils.logging import make_logger
    lg = make_logger(str(tmp_path), "csv")
    lg.log({"phase": "train", "step": 1, "loss": 0.5})
    lg.log({"phase": "val_epoch", "step": 1, "mae": 0.9, "lr_scale": 1.0})
    lg.log({"phase": "train", "step": 2, "loss": 0.25})
    lg.close()
    csv_lines = open(os.path.join(str(tmp_path), "metrics_train.csv")) \
        .read().strip().splitlines()
    assert csv_lines[0] == "loss,phase,step"
    assert csv_lines[1] == "0.5,train,1"
    assert csv_lines[2] == "0.25,train,2"
    val_lines = open(os.path.join(str(tmp_path),
                                  "metrics_val_epoch.csv")) \
        .read().strip().splitlines()
    assert val_lines[0] == "lr_scale,mae,phase,step"
    assert val_lines[1] == "1.0,0.9,val_epoch,1"
    # JSONL mirror always written
    jl = [json.loads(l) for l in
          open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert jl[-1]["loss"] == 0.25


def test_multi_backend_logger(tmp_path):
    """Comma-separated backends (≙ reference many_loggers.yaml):
    csv activates alongside gated backends whose packages are absent
    (neptune/comet degrade to a warning, JSONL+CSV still written)."""
    from gotennet_tpu.utils.logging import make_logger
    lg = make_logger(str(tmp_path), "csv,neptune,comet")
    lg.log({"phase": "train", "step": 1, "loss": 1.5})
    lg.close()
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "metrics_train.csv"))
    jl = [json.loads(l) for l in
          open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert jl[-1]["loss"] == 1.5


def test_data_parallel_fused_dense(tmp_path):
    """Data-parallel training of the fused-kernel dense model (Pallas
    interpret on the CPU mesh) == single-device grad-accum training:
    the custom_vjp composes with shard_map/psum."""
    import dataclasses

    from gotennet_tpu.data.dataset import DenseLoader

    cfg = dataclasses.replace(CFG, fused=True, remat=False)
    ds = synthetic_molecules(16, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head(), layout="dense")
    loader = DenseLoader(ds, batch_size=4, shuffle=False)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    t_acc = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", grad_accum_steps=2,
        workdir=str(tmp_path / "acc")))
    p_acc, h_acc = t_acc.fit(params, loader, loader)

    t_dp = Trainer(model, task, TrainerConfig(
        lr=1e-3, max_epochs=1, scheduler="none", data_parallel=2,
        workdir=str(tmp_path / "dp")))
    p_dp, h_dp = t_dp.fit(params, loader, loader)

    _allclose_trees(p_acc, p_dp, rtol=2e-4, atol=1e-5)
    assert np.isclose(h_acc[-1]["val_loss"], h_dp[-1]["val_loss"],
                      rtol=2e-4)
