"""Checkpoint save/load with the model config serialized alongside.

Mirrors the reference's config-in-checkpoint capability (Lightning
``save_hyperparameters`` + lazy representation rebuild,
/root/reference/gotennet/models/goten_model.py:116-126): a checkpoint
directory is self-describing — ``load_checkpoint`` rebuilds the full
``GotenModel`` (representation + head) without any external config.

Storage: orbax for the param pytree, JSON for the configs, NPZ for the
atomref table.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel, HeadConfig

__all__ = ["save_checkpoint", "load_checkpoint", "load_meta"]


def _config_to_json(model: GotenModel) -> dict:
    cfg = dataclasses.asdict(model.cfg)
    # dtypes and sharding axes aren't JSON; they are runtime policy,
    # not architecture — a checkpoint must load on any device topology
    cfg.pop("dtype", None)
    cfg.pop("pair_dtype", None)
    cfg.pop("edge_axis", None)
    head = dataclasses.asdict(model.head)
    head.pop("atomref", None)
    head["activation"] = str(head["activation"]) if not isinstance(
        head["activation"], str) else head["activation"]
    return {"representation": cfg, "head": head, "layout": model.layout,
            "has_atomref": model.head.atomref is not None}


def save_checkpoint(path: str, params, step: int = 0,
                    model: Optional[GotenModel] = None,
                    extra_meta: Optional[dict] = None) -> None:
    """``extra_meta`` carries run context (task name, label) so the test
    pipeline can rebuild the evaluation setup from the checkpoint alone
    (reference infers cfg.label from the loaded model,
    testing_pipeline.py:43-45)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    params_path = os.path.join(path, "params")
    ckptr.save(params_path, jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    meta = {"step": int(step), "format_version": 1}
    if model is not None:
        meta.update(_config_to_json(model))
        if model.head.atomref is not None:
            np.savez(os.path.join(path, "atomref.npz"),
                     atomref=np.asarray(model.head.atomref))
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_meta(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
        return json.load(f)


def load_checkpoint(path: str) -> Tuple[Optional[GotenModel], dict, int]:
    """Returns ``(model_or_None, params, step)``; the model is rebuilt
    when the checkpoint carries its config.  Run context beyond the
    model (task/label) is available via ``load_meta``."""
    path = os.path.abspath(path)
    meta = load_meta(path)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    model = None
    if "representation" in meta:
        cfg = GotenNetConfig(**meta["representation"])
        head_kw = dict(meta["head"])
        if meta.get("has_atomref"):
            head_kw["atomref"] = np.load(
                os.path.join(path, "atomref.npz"))["atomref"]
        model = GotenModel(cfg, HeadConfig(**head_kw),
                           layout=meta.get("layout", "edge"))
    return model, params, meta.get("step", 0)
