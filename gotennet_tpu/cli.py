"""Train / test CLI pipelines.

Equivalents of the reference console scripts ``train_gotennet`` /
``test_gotennet`` (/root/reference/gotennet/scripts/{train,test}.py +
training_pipeline.py / testing_pipeline.py):

    python -m gotennet_tpu.cli train experiment=qm9_u0 label=homo
    python -m gotennet_tpu.cli test checkpoint=runs/x/ckpt_best
    python -m gotennet_tpu.cli sweep experiment=smoke model.representation.lmax=1,2
    python -m gotennet_tpu.cli parity checkpoints=QM9_small_homo,QM9_small_U0

Composes the YAML config tree (utils/config.py), builds the data
pipeline + task + model + trainer, runs fit and/or evaluation, and
writes metrics + checkpoints into the run dir.  ``parity`` evaluates
published reference checkpoints (alias/URL/.ckpt via the converter)
and appends the MAE table to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Optional

import jax
import numpy as np

from gotennet_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _build_data(cfg: Dict, label: str):
    """Returns (train_loader, val_loader, test_loader, dataset_meta)."""
    from gotennet_tpu.data.dataset import (
        BatchLoader,
        make_splits,
        standardize_energy,
        synthetic_molecules,
    )
    dm = cfg["datamodule"]
    workdir = cfg["workdir"]
    os.makedirs(workdir, exist_ok=True)
    # set when the dataset itself is already split across hosts
    # (Molecule3D NPZ shards): loader-level batch sharding must not
    # apply a second split on top
    host_sharded = False

    if dm["dataset"] == "QM9":
        from gotennet_tpu.data.qm9 import load_qm9
        ds = load_qm9(dm["dataset_root"], label=label)
    elif dm["dataset"] in ("rMD17", "MD17", "MD22"):
        from gotennet_tpu.data.md17 import load_md_dataset
        ds = load_md_dataset(dm["dataset_root"], label,
                             max_frames=dm.get("max_frames"))
    elif dm["dataset"] == "Molecule3D":
        from gotennet_tpu.data.molecule3d import is_shard_dir, load_molecule3d
        host, n_hosts = 0, 1
        if cfg["trainer"].get("distributed"):
            host, n_hosts = jax.process_index(), jax.process_count()
        host_sharded = n_hosts > 1 and is_shard_dir(dm["dataset_root"])
        ds = load_molecule3d(dm["dataset_root"], label=label,
                             max_molecules=dm.get("max_molecules"),
                             host=host if host_sharded else 0,
                             n_hosts=n_hosts if host_sharded else 1)
    elif dm["dataset"] == "synthetic":
        ds = synthetic_molecules(dm.get("n_molecules", 256),
                                 seed=dm.get("seed", 1),
                                 min_atoms=dm.get("min_atoms", 6),
                                 max_atoms=dm.get("max_atoms", 24),
                                 box=dm.get("box", 4.0),
                                 with_forces=dm.get("with_forces", False))
    else:
        raise ValueError(f"Unknown dataset {dm['dataset']!r}")

    if dm.get("normalize_positions"):
        from gotennet_tpu.data.dataset import center_positions
        ds = center_positions(ds)

    idx_train, idx_val, idx_test = make_splits(
        len(ds), dm["train_size"], dm["val_size"], dm.get("test_size"),
        dm.get("seed", 1), os.path.join(workdir, "splits.npz"),
        dm.get("splits"))

    mean = std = None
    if dm.get("standardize"):
        use_ar = dm.get("prior_model") == "Atomref"
        mean, std = standardize_energy(ds, idx_train, use_atomref=use_ar)

    layout = cfg["model"].get("layout", "edge")
    if layout == "ell":
        from gotennet_tpu.data.dataset import ELLLoader
        cutoff = cfg["model"]["representation"]["cutoff"]
        mk = dict(cutoff=cutoff,
                  max_num_neighbors=dm.get("max_num_neighbors", 32),
                  neighbor_probe=dm.get("neighbor_probe", 64),
                  # windowed one-hot gathers over spatially-sorted
                  # atoms — the 10^3-atom formulation (PERF.md)
                  spatial_sort=dm.get("spatial_sort", False),
                  block_rows=dm.get("block_rows"))
        train_loader = ELLLoader(ds.subset(idx_train), dm["batch_size"],
                                 shuffle=True, seed=dm.get("seed", 1),
                                 **mk)
        val_loader = ELLLoader(ds.subset(idx_val),
                               dm.get("inference_batch_size",
                                      dm["batch_size"]), **mk)
        test_loader = ELLLoader(ds.subset(idx_test),
                                dm.get("inference_batch_size",
                                       dm["batch_size"]), **mk)
    elif layout == "dense":
        from gotennet_tpu.data.dataset import DenseLoader
        max_atoms = max((len(z) for z in ds.z), default=8)
        mk = dict(max_atoms=((max_atoms + 7) // 8) * 8,
                  bucket=dm.get("bucket", False),
                  pack=dm.get("pack", False))
        train_loader = DenseLoader(ds.subset(idx_train), dm["batch_size"],
                                   shuffle=True, seed=dm.get("seed", 1),
                                   **mk)
        val_loader = DenseLoader(ds.subset(idx_val),
                                 dm.get("inference_batch_size",
                                        dm["batch_size"]), **mk)
        test_loader = DenseLoader(ds.subset(idx_test),
                                  dm.get("inference_batch_size",
                                         dm["batch_size"]), **mk)
    else:
        cutoff = cfg["model"]["representation"]["cutoff"]
        mk = dict(cutoff=cutoff,
                  max_num_neighbors=dm.get("max_num_neighbors", 32),
                  neighbor_probe=dm.get("neighbor_probe", 64))
        train_loader = BatchLoader(ds.subset(idx_train), dm["batch_size"],
                                   shuffle=True, seed=dm.get("seed", 1),
                                   **mk)
        val_loader = BatchLoader(ds.subset(idx_val),
                                 dm.get("inference_batch_size",
                                        dm["batch_size"]), **mk)
        test_loader = BatchLoader(ds.subset(idx_test),
                                  dm.get("inference_batch_size",
                                         dm["batch_size"]), **mk)
    if cfg["trainer"].get("distributed") and not host_sharded:
        # per-host loader sharding (≙ torch DistributedSampler; train
        # drops trailing batches so every host runs the same number of
        # steps, eval wraps around so collective counts stay aligned).
        # Skipped when the dataset is pre-sharded per host (Molecule3D
        # NPZ shards) — there, equal per-host shard sizes are the
        # operator's responsibility (save_shards emits fixed-size
        # shards, so only the tail shard differs).
        world, rank = jax.process_count(), jax.process_index()
        if world > 1:
            train_loader.set_shard(world, rank)
            val_loader.set_shard(world, rank, pad=True)
            test_loader.set_shard(world, rank, pad=True)
    meta = {"mean": mean, "std": std, "atomref": ds.atomref}
    return train_loader, val_loader, test_loader, meta


# Every key each config section may carry — unknown keys are rejected
# so orphaned (parsed-by-nothing) config can't silently accumulate.
_MODEL_KEYS = {
    "lr", "lr_decay", "lr_patience", "lr_minlr", "lr_warmup_steps",
    "weight_decay", "grad_clip", "scheduler", "cosine_t_max", "ema_rate",
    "ema_stages", "use_ema_in_loss", "task_loss", "task_config", "layout",
    "representation",
    "output",
}
_OUTPUT_KEYS = {"n_hidden", "n_layers", "activation"}
_TRAINER_KEYS = {
    "max_epochs", "early_stopping_patience", "monitor",
    "monitor_checkpoint", "log_every", "logger", "tensorboard", "resume",
    "grad_accum_steps", "data_parallel", "edge_parallel", "distributed",
}
_DATAMODULE_KEYS = {
    "dataset", "dataset_root", "batch_size", "inference_batch_size",
    "standardize", "train_size", "val_size", "test_size", "splits",
    "seed", "max_num_neighbors", "prior_model", "normalize_positions",
    "n_molecules", "with_forces", "max_frames", "neighbor_probe",
    "max_molecules", "bucket", "pack", "spatial_sort", "block_rows",
    "min_atoms", "max_atoms", "box",
}


def _check_keys(section: Dict, allowed: set, name: str) -> None:
    unknown = sorted(set(section) - allowed)
    if unknown:
        raise ValueError(
            f"unknown config key(s) {unknown} in '{name}'; "
            f"allowed: {sorted(allowed)}")


def _build_trainer_config(cfg: Dict):
    """TrainerConfig from the composed config (model LR block +
    trainer block), with unknown-key rejection."""
    from gotennet_tpu.train.trainer import TrainerConfig

    mc = cfg["model"]
    tr = cfg["trainer"]
    _check_keys(tr, _TRAINER_KEYS, "trainer")
    return TrainerConfig(
        lr=mc.get("lr", 1e-4), weight_decay=mc.get("weight_decay", 0.0),
        grad_clip=mc.get("grad_clip", 5.0),
        lr_warmup_steps=mc.get("lr_warmup_steps", 0),
        scheduler=mc.get("scheduler", "plateau"),
        lr_decay=mc.get("lr_decay", 0.8),
        lr_patience=mc.get("lr_patience", 15),
        lr_minlr=mc.get("lr_minlr", 1e-7),
        cosine_t_max=mc.get("cosine_t_max", 1_000_000),
        max_epochs=tr.get("max_epochs", 1000),
        early_stopping_patience=tr.get("early_stopping_patience", 150),
        monitor=tr.get("monitor", "val_loss"),
        monitor_checkpoint=tr.get("monitor_checkpoint"),
        ema_rate=mc.get("ema_rate", 0.0),
        ema_stages=tuple(mc.get("ema_stages",
                                ("train", "validation"))),
        use_ema_in_loss=mc.get("use_ema_in_loss", False),
        seed=cfg.get("seed", 1),
        log_every=tr.get("log_every", 50),
        workdir=cfg["workdir"],
        logger=tr.get("logger", "jsonl"),
        tensorboard=tr.get("tensorboard", False),
        resume=tr.get("resume", False),
        grad_accum_steps=tr.get("grad_accum_steps", 1),
        data_parallel=tr.get("data_parallel", 1),
        edge_parallel=tr.get("edge_parallel", 1),
        distributed=tr.get("distributed", False),
    )


def _build_model_and_trainer(cfg: Dict, meta: Dict):
    import dataclasses

    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks import TASK_DICT
    from gotennet_tpu.train.trainer import Trainer

    import jax.numpy as jnp

    mc = cfg["model"]
    _check_keys(mc, _MODEL_KEYS, "model")
    _check_keys(cfg["datamodule"], _DATAMODULE_KEYS, "datamodule")
    rep = {k: v for k, v in mc["representation"].items()}
    for key in ("pair_dtype", "node_dtype"):
        if rep.get(key) in ("bf16", "bfloat16"):
            rep[key] = jnp.bfloat16
        else:
            rep.pop(key, None)
    # the dense layout enforces the neighbor cap inside the forward
    # pass; keep it in sync with the datamodule's loader-side cap
    rep.setdefault("max_num_neighbors",
                   cfg["datamodule"].get("max_num_neighbors", 32))
    gcfg = GotenNetConfig(**rep)
    task_cls = TASK_DICT[cfg["task"]]
    tkw = {"task_loss": mc.get("task_loss", "L1Loss")}
    tkw.update(mc.get("task_config") or {})
    task = task_cls(cfg["label"], dataset_meta=meta, task_config=tkw)
    head = task.build_head()
    out_cfg = dict(mc.get("output") or {})
    _check_keys(out_cfg, _OUTPUT_KEYS, "model.output")
    if out_cfg:  # head width/depth overrides (≙ reference output_config)
        head = dataclasses.replace(head, **out_cfg)
    model = GotenModel(gcfg, head, layout=mc.get("layout", "edge"))

    tcfg = _build_trainer_config(cfg)
    return model, task, Trainer(model, task, tcfg)


def _print_config(cfg: Dict, indent: int = 0) -> None:
    """Plain-text config tree (reference's Rich print_config capability,
    utils/__init__.py:97-149)."""
    for k, v in cfg.items():
        if isinstance(k, str) and k.startswith("_"):
            continue  # bookkeeping keys (_overrides)
        if isinstance(v, dict):
            print("  " * indent + f"{k}:")
            _print_config(v, indent + 1)
        else:
            print("  " * indent + f"{k}: {v}")


def train(cfg: Dict) -> Dict[str, float]:
    if cfg["trainer"].get("distributed"):
        # multi-HOST bootstrap: must run before any other jax call so
        # jax.devices() is the global set (≙ Lightning DDP launcher)
        from gotennet_tpu.parallel import initialize_distributed
        info = initialize_distributed()
        print(f"distributed: process {info['process_index']}"
              f"/{info['process_count']}, "
              f"{info['global_devices']} global devices")
    _print_config(cfg)
    label = cfg["label"]
    train_loader, val_loader, test_loader, meta = _build_data(cfg, label)
    model, task, trainer = _build_model_and_trainer(cfg, meta)

    with open(os.path.join(cfg["workdir"], "config.json"), "w") as f:
        json.dump({k: v for k, v in cfg.items()}, f, indent=1, default=str)

    params = model.init(jax.random.PRNGKey(cfg.get("seed", 1)),
                        next(iter(val_loader)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model parameters: {n_params:,}")

    if cfg.get("train", True):
        params, history = trainer.fit(params, train_loader, val_loader)
        # test the best checkpoint, like the reference
        # (training_pipeline.py:145-155), not the final params
        best = os.path.join(cfg["workdir"], "ckpt_best")
        if os.path.isdir(best):
            from gotennet_tpu.train.checkpoint import load_checkpoint
            _, params, _ = load_checkpoint(best)

    results = {}
    if cfg.get("test", True):
        results = trainer.evaluate(params, test_loader, phase="test")
        print("test:", json.dumps(results))
        with open(os.path.join(cfg["workdir"], "test_results.json"),
                  "w") as f:
            json.dump(results, f, indent=1)
    return results


def test(cfg: Dict) -> Dict[str, float]:
    """Evaluate a checkpoint (path or hub alias).

    The checkpoint is authoritative (reference testing_pipeline.py:43-45):
    the model architecture, layout, neighbor cutoff, and — unless
    overridden on the CLI — the label and task are all taken from the
    checkpoint's own metadata, so a checkpoint trained under any config
    evaluates as itself, never as the current config's architecture.
    """
    import copy

    from gotennet_tpu.tasks import TASK_DICT
    from gotennet_tpu.train.checkpoint import load_checkpoint, load_meta
    from gotennet_tpu.train.trainer import Trainer
    from gotennet_tpu.utils.hub import resolve_checkpoint

    ckpt = resolve_checkpoint(cfg["checkpoint"])
    if os.path.isfile(ckpt) and ckpt.endswith(".ckpt"):
        # published reference Lightning checkpoint: rebuild the FULL
        # model (representation + head) via the converter — this is the
        # real-data parity path for BASELINE.md
        # (test checkpoint=QM9_small_homo)
        from gotennet_tpu.utils.torch_convert import load_reference_model
        from gotennet_tpu.tasks.qm9 import QM9_TARGETS
        model, params, hp = load_reference_model(ckpt)
        ref_label = hp.get("label")
        if isinstance(ref_label, int):
            ref_label = QM9_TARGETS[ref_label]
        meta = {"label": ref_label, "task": hp.get("task", "QM9")}
    else:
        model, params, step = load_checkpoint(ckpt)
        if model is None:
            raise ValueError(f"checkpoint {ckpt} has no embedded config")
        meta = load_meta(ckpt)

    # label/task inferred from the checkpoint; an *explicit* CLI
    # override wins, but the config-tree default (train.yaml always
    # defines label: "U0") must not shadow the checkpoint's own label —
    # otherwise `test checkpoint=QM9_small_homo` would evaluate the homo
    # model against U0 targets (reference testing_pipeline.py:43-45)
    cli_keys = set(cfg.get("_overrides") or ())
    label = ((cfg.get("label") if "label" in cli_keys else None)
             or meta.get("label") or cfg.get("label") or "U0")
    task_name = ((cfg.get("task") if "task" in cli_keys else None)
                 or meta.get("task") or cfg.get("task", "QM9"))

    # data pipeline must match the checkpoint's geometry, not train.yaml
    cfg = copy.deepcopy(cfg)
    cfg["model"]["representation"]["cutoff"] = model.cfg.cutoff
    cfg["model"]["layout"] = model.layout
    _, _, test_loader, dmeta = _build_data(cfg, label)

    task = TASK_DICT[task_name](
        label, dataset_meta=dmeta,
        task_config={"task_loss": cfg["model"].get("task_loss", "L1Loss")})
    tcfg = _build_trainer_config(cfg)
    trainer = Trainer(model, task, tcfg)  # checkpoint's model, not cfg's
    results = trainer.evaluate(params, test_loader, phase="test")
    print("test:", json.dumps(results))
    with open(os.path.join(cfg["workdir"], "test_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def parity(cfg: Dict, checkpoints: List[str],
           out: str = "BASELINE.md") -> List[Dict[str, float]]:
    """Evaluate each checkpoint via :func:`test` and append a markdown
    MAE table to ``out`` — the one-command real-data parity packet
    (≙ reference README.md:199-210 `test_gotennet checkpoint=...`,
    run for every published alias at once)."""
    import copy
    import datetime

    rows = []
    for ck in checkpoints:
        c = copy.deepcopy(cfg)
        c["checkpoint"] = ck
        c["workdir"] = os.path.join(cfg["workdir"], "parity",
                                    ck.replace("/", "_").replace(":", "_"))
        os.makedirs(c["workdir"], exist_ok=True)
        results = test(c)
        rows.append((ck, results))

    stamp = datetime.date.today().isoformat()
    lines = [
        "",
        f"## Measured reference-checkpoint parity ({stamp})",
        "",
        "Produced by `cli parity checkpoints="
        + ",".join(checkpoints) + "`.",
        "",
        "| Checkpoint | MAE | MSE | val_loss |",
        "|---|---|---|---|",
    ]
    for ck, r in rows:
        lines.append(
            f"| {ck} | {r.get('MeanAbsoluteError', float('nan')):.6g} "
            f"| {r.get('MeanSquaredError', float('nan')):.6g} "
            f"| {r.get('val_loss', float('nan')):.6g} |")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"parity: wrote {len(rows)} rows to {out}")
    return [r for _, r in rows]


def main_train(argv: Optional[List[str]] = None) -> int:
    """Console-script entry (`train_gotennet`, mirrors the reference's
    pyproject.toml:76)."""
    return main(["train"] + list(sys.argv[1:] if argv is None else argv))


def main_test(argv: Optional[List[str]] = None) -> int:
    """Console-script entry (`test_gotennet`)."""
    return main(["test"] + list(sys.argv[1:] if argv is None else argv))


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    # persistent XLA cache: every launch after the first skips the
    # ~45-70 s step compilation (GOTENNET_XLA_CACHE=0 disables)
    from gotennet_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    mode = argv[0]
    overrides = argv[1:]
    root = "train.yaml"
    if mode == "train":
        train(load_config(CONFIG_DIR, root, overrides))
    elif mode == "test":
        test(load_config(CONFIG_DIR, root, overrides))
    elif mode == "sweep":
        # grid: comma-separated values expand to a cartesian product.
        # random search: sampler=random n_trials=N plus distribution
        # expressions (loguniform/uniform/int/choice) in the overrides.
        # adaptive: sampler=adaptive — sequential TPE-style density-
        # ratio sampling (≙ reference Optuna sweeper).
        from gotennet_tpu.utils.sweep import (
            run_adaptive_search,
            run_random_search,
            run_sweep,
        )
        meta = {"sampler": "grid", "n_trials": "8", "seed": "0",
                "metric": "MeanAbsoluteError",
                "sweep_dir": "runs/sweep"}
        trial_ovs = []
        for ov in overrides:
            key, _, val = ov.partition("=")
            if key in meta:
                meta[key] = val
            else:
                trial_ovs.append(ov)
        load = lambda extra: load_config(CONFIG_DIR, root, extra)
        if meta["sampler"] == "random":
            run_random_search(train, load, trial_ovs,
                              n_trials=int(meta["n_trials"]),
                              seed=int(meta["seed"]),
                              sweep_dir=meta["sweep_dir"],
                              metric=meta["metric"])
        elif meta["sampler"] == "adaptive":
            run_adaptive_search(train, load, trial_ovs,
                                n_trials=int(meta["n_trials"]),
                                seed=int(meta["seed"]),
                                sweep_dir=meta["sweep_dir"],
                                metric=meta["metric"])
        else:
            run_sweep(train, load, trial_ovs,
                      sweep_dir=meta["sweep_dir"], metric=meta["metric"])
    elif mode == "parity":
        # real-data parity packet: evaluate published reference
        # checkpoints (aliases, URLs, or .ckpt paths — the converter
        # handles the Lightning format) and append the MAE table to a
        # markdown file.  The moment gdb9.sdf + a published checkpoint
        # are reachable this one command fills BASELINE.md:
        #   cli parity checkpoints=QM9_small_homo,QM9_small_U0 \
        #       datamodule.root=data/qm9
        cks, out, rest = None, "BASELINE.md", []
        for ov in overrides:
            key, _, val = ov.partition("=")
            if key == "checkpoints":
                cks = val.split(",")
            elif key == "out":
                out = val
            else:
                rest.append(ov)
        if not cks:
            raise SystemExit("parity needs checkpoints=alias1,alias2,...")
        parity(load_config(CONFIG_DIR, root, rest), cks, out)
    else:
        raise SystemExit(
            f"unknown mode {mode!r}; use train|test|sweep|parity")
    return 0


if __name__ == "__main__":
    sys.exit(main())
