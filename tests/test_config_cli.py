"""Config composition, overrides, interpolation; end-to-end smoke run
through the CLI train pipeline on synthetic data."""

import json
import os

import numpy as np
import pytest
import yaml

from gotennet_tpu.cli import CONFIG_DIR, main, train
from gotennet_tpu.utils.config import apply_overrides, load_config, merge, resolve


def test_defaults_compose():
    cfg = load_config(CONFIG_DIR, "train.yaml")
    assert cfg["model"]["representation"]["n_atom_basis"] == 256
    assert cfg["datamodule"]["batch_size"] == 32
    assert cfg["trainer"]["max_epochs"] == 1000
    assert cfg["label"] == "U0"
    # interpolation: workdir uses name/label
    assert cfg["workdir"] == "runs/gotennet_U0"


def test_experiment_overlay_and_overrides():
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=qm9_u0", "label=homo",
                       "model.representation.lmax=3",
                       "model.lr=3e-4"])
    assert cfg["model"]["lr_warmup_steps"] == 10000   # from experiment
    assert cfg["model"]["representation"]["n_rbf"] == 64
    assert cfg["label"] == "homo"                     # override wins
    assert cfg["model"]["representation"]["lmax"] == 3
    assert cfg["model"]["lr"] == pytest.approx(3e-4)  # YAML-typed float


def test_merge_and_resolve():
    base = {"a": {"b": 1, "c": 2}, "d": "${a.b}", "e": "x${a.c}y"}
    out = resolve(merge(base, {"a": {"b": 5}}))
    assert out["a"] == {"b": 5, "c": 2}
    assert out["d"] == 5          # whole-string keeps type
    assert out["e"] == "x2y"

    cfg = apply_overrides({"m": {}}, ["m.lr=1e-5", "m.flag=true", "m.s=abc"])
    assert cfg["m"]["lr"] == pytest.approx(1e-5)
    assert cfg["m"]["flag"] is True
    assert cfg["m"]["s"] == "abc"


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("MY_TEST_VAR", "/tmp/x")
    out = resolve({"p": "${oc.env:MY_TEST_VAR}"})
    assert out["p"] == "/tmp/x"


def test_cli_smoke_train(tmp_path):
    """Full pipeline: config -> data -> model -> 3 epochs -> test."""
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run"])
    results = train(cfg)
    assert "MeanAbsoluteError" in results
    assert np.isfinite(results["val_loss"])
    assert os.path.exists(os.path.join(str(tmp_path), "run", "config.json"))
    assert os.path.exists(os.path.join(str(tmp_path), "run",
                                       "test_results.json"))
    assert os.path.isdir(os.path.join(str(tmp_path), "run", "ckpt_best"))


def test_cli_smoke_dense_layout(tmp_path):
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "model.layout=dense",
                       "model.representation.pair_dtype=bf16"])
    results = train(cfg)
    assert np.isfinite(results["val_loss"])


def test_cli_smoke_force_training(tmp_path):
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "task=rMD17", "datamodule.with_forces=true",
                       "trainer.max_epochs=2"])
    results = train(cfg)
    assert "MeanAbsoluteError_force" in results
    assert np.isfinite(results["MeanAbsoluteError_force"])


def test_cli_rejects_unknown_config_keys(tmp_path):
    """Orphaned config keys fail fast instead of being silently ignored."""
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "trainer.gpus=4"])
    with pytest.raises(ValueError, match="gpus"):
        train(cfg)
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run2",
                       "model.output.width=64"])
    with pytest.raises(ValueError, match="width"):
        train(cfg)


def test_cli_output_block_changes_head(tmp_path):
    """model.output.{n_hidden,n_layers} reach the head (were orphaned)."""
    from gotennet_tpu.cli import _build_data, _build_model_and_trainer
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "model.output.n_hidden=48",
                       "model.output.n_layers=3"])
    _, _, _, meta = _build_data(cfg, cfg["label"])
    model, _, _ = _build_model_and_trainer(cfg, meta)
    assert model.head.n_hidden == 48 and model.head.n_layers == 3
    import jax
    from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
    ds = synthetic_molecules(4, seed=0)
    loader = BatchLoader(ds, batch_size=4, cutoff=model.cfg.cutoff)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    out_net = params["params"]["head"]["out_net"]
    # 3 layers with hidden width 48: dense_0/1 out = 48
    assert out_net["dense_0"]["linear"]["kernel"].shape[1] == 48
    assert out_net["dense_1"]["linear"]["kernel"].shape == (48, 48)
    assert out_net["dense_2"]["linear"]["kernel"].shape == (48, 1)


def test_cli_test_uses_checkpoint_architecture(tmp_path):
    """cli.test evaluates the checkpoint's own model + label even when
    the current config describes a different architecture (regression:
    the round-1 trainer baked the config-built model into the jitted
    eval closure)."""
    from gotennet_tpu.cli import test as cli_test

    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "trainer.max_epochs=1", "label=homo"])
    train(cfg)
    ckpt = os.path.join(str(tmp_path), "run", "ckpt_best")

    # deliberately different architecture + no label in the test config
    tcfg = load_config(CONFIG_DIR, "train.yaml",
                       ["experiment=smoke", f"workdir={tmp_path}/eval",
                        "model.representation.n_atom_basis=64",
                        "model.representation.n_interactions=1",
                        f"checkpoint={ckpt}"])
    os.makedirs(tcfg["workdir"], exist_ok=True)
    results = cli_test(tcfg)
    assert np.isfinite(results["val_loss"])
    # label was inferred from the checkpoint, not defaulted
    meta = json.load(open(os.path.join(ckpt, "meta.json")))
    assert meta["label"] == "homo"


def test_cli_test_label_precedence(tmp_path):
    """The checkpoint's label beats train.yaml's default ("U0"), while
    an explicit CLI label= override beats the checkpoint (regression:
    `cfg.get("label") or meta.get("label")` always resolved to the
    config default, so homo checkpoints evaluated against U0 targets)."""
    from gotennet_tpu.cli import test as cli_test

    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run",
                       "trainer.max_epochs=1", "label=homo"])
    train(cfg)
    ckpt = os.path.join(str(tmp_path), "run", "ckpt_best")

    evaluated = []
    import gotennet_tpu.cli as cli_mod
    orig = cli_mod._build_data

    def spy(cfg, label):
        evaluated.append(label)
        return orig(cfg, label)

    cli_mod._build_data = spy
    try:
        # no CLI label: checkpoint's "homo" must win over train.yaml "U0"
        tcfg = load_config(CONFIG_DIR, "train.yaml",
                           ["experiment=smoke",
                            f"workdir={tmp_path}/eval1",
                            f"checkpoint={ckpt}"])
        os.makedirs(tcfg["workdir"], exist_ok=True)
        cli_test(tcfg)
        assert evaluated[-1] == "homo"

        # explicit CLI label: override wins over the checkpoint
        tcfg = load_config(CONFIG_DIR, "train.yaml",
                           ["experiment=smoke",
                            f"workdir={tmp_path}/eval2",
                            "label=lumo", f"checkpoint={ckpt}"])
        os.makedirs(tcfg["workdir"], exist_ok=True)
        cli_test(tcfg)
        assert evaluated[-1] == "lumo"
    finally:
        cli_mod._build_data = orig


def test_normalize_positions_centers_on_com(tmp_path):
    """datamodule.normalize_positions subtracts the center of mass at
    load time (reference datamodule.py:19-31) — previously an accepted
    key implemented by nothing."""
    from gotennet_tpu.cli import _build_data
    from gotennet_tpu.models.heads import ATOMIC_MASSES

    base = ["experiment=smoke", f"workdir={tmp_path}/run"]
    cfg_off = load_config(CONFIG_DIR, "train.yaml", base)
    cfg_on = load_config(CONFIG_DIR, "train.yaml",
                         base + ["datamodule.normalize_positions=true"])
    tr_off, *_ = _build_data(cfg_off, cfg_off["label"])
    tr_on, *_ = _build_data(cfg_on, cfg_on["label"])
    masses = np.asarray(ATOMIC_MASSES)
    assert len(tr_on.ds.z) > 0
    for z, p_on, p_off in zip(tr_on.ds.z, tr_on.ds.pos, tr_off.ds.pos):
        w = masses[np.asarray(z)][:, None]
        com_off = (w * p_off).sum(0) / w.sum()
        np.testing.assert_allclose(p_on, p_off - com_off, atol=1e-5)
        com_on = (w * p_on).sum(0) / w.sum()
        np.testing.assert_allclose(com_on, 0.0, atol=1e-4)


def test_cli_parity_packet(tmp_path):
    """`cli parity checkpoints=a.ckpt,b.ckpt` evaluates fabricated
    reference-format Lightning checkpoints through the converter and
    appends the MAE markdown table to the out file — the one-command
    BASELINE.md packet for when published checkpoints land."""
    import jax
    import torch

    from gotennet_tpu.cli import parity
    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.model import GotenModel, HeadConfig
    from gotennet_tpu.utils.torch_convert import model_params_to_state_dict
    from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules

    cfg_small = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=2,
                               n_rbf=8, num_heads=4)
    cks = []
    for i, label_idx in enumerate((7, 2)):        # U0, homo
        head = HeadConfig(kind="atomwise", mean=0.0, stddev=1.0,
                          activation="silu")
        model = GotenModel(cfg_small, head)
        batch = next(iter(BatchLoader(synthetic_molecules(4, seed=i),
                                      batch_size=4, cutoff=cfg_small.cutoff)))
        params = model.init(jax.random.PRNGKey(i), batch)
        sd = model_params_to_state_dict(params, cfg_small, head)
        ckpt = {
            "hyper_parameters": {
                "task": "QM9", "label": label_idx, "cutoff": 5.0,
                "representation": {
                    "__target__": "gotennet.models.representation."
                                  "gotennet.GotenNetWrapper",
                    "n_atom_basis": 32, "n_interactions": 2, "lmax": 2,
                    "n_rbf": 8, "num_heads": 4,
                },
            },
            "state_dict": {k: torch.as_tensor(np.asarray(v).copy())
                           for k, v in sd.items()},
        }
        path = os.path.join(str(tmp_path), f"ref_{label_idx}.ckpt")
        torch.save(ckpt, path)
        cks.append(path)

    out = os.path.join(str(tmp_path), "BASELINE_test.md")
    cfg = load_config(CONFIG_DIR, "train.yaml",
                      ["experiment=smoke", f"workdir={tmp_path}/run"])
    results = parity(cfg, cks, out=out)
    assert len(results) == 2
    assert all(np.isfinite(r["MeanAbsoluteError"]) for r in results)
    text = open(out).read()
    assert "| Checkpoint | MAE |" in text
    assert cks[0] in text and cks[1] in text
    # per-checkpoint workdirs hold the raw JSON
    assert os.path.exists(os.path.join(
        str(tmp_path), "run", "parity",
        cks[0].replace("/", "_").replace(":", "_"), "test_results.json"))
