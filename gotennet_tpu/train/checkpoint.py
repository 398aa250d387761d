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

__all__ = ["save_checkpoint", "load_checkpoint", "load_meta",
           "load_train_state"]


def _flatten_dict(d: dict, prefix: str = ""):
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _flatten_dict(v, key)
        else:
            yield key, np.asarray(v)


def _unflatten_dict(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _save_tree(path: str, tree) -> None:
    """orbax in single-process runs; a flat NPZ when jax.distributed is
    active.  Orbax's save path runs cross-process synchronization, so a
    rank-zero-only save under multi-host would deadlock — plain NPZ
    written by rank 0 has no collectives (params are replicated, so
    rank 0's copy is the copy)."""
    if jax.process_count() > 1:
        np.savez(path + ".npz", **dict(_flatten_dict(tree)))
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def _load_tree(path: str):
    if os.path.exists(path + ".npz"):
        with np.load(path + ".npz") as f:
            return _unflatten_dict({k: f[k] for k in f.files})
    return ocp.StandardCheckpointer().restore(path)


def _config_to_json(model: GotenModel) -> dict:
    cfg = dataclasses.asdict(model.cfg)
    # dtypes and sharding axes aren't JSON; they are runtime policy,
    # not architecture — a checkpoint must load on any device topology
    cfg.pop("dtype", None)
    cfg.pop("pair_dtype", None)
    cfg.pop("node_dtype", None)
    cfg.pop("edge_axis", None)
    head = dataclasses.asdict(model.head)
    head.pop("atomref", None)
    head["activation"] = str(head["activation"]) if not isinstance(
        head["activation"], str) else head["activation"]
    return {"representation": cfg, "head": head, "layout": model.layout,
            "has_atomref": model.head.atomref is not None}


def save_checkpoint(path: str, params, step: int = 0,
                    model: Optional[GotenModel] = None,
                    extra_meta: Optional[dict] = None,
                    opt_state=None,
                    train_state: Optional[dict] = None) -> None:
    """``extra_meta`` carries run context (task name, label) so the test
    pipeline can rebuild the evaluation setup from the checkpoint alone
    (reference infers cfg.label from the loaded model,
    testing_pipeline.py:43-45).

    ``opt_state`` (any pytree — saved as ordered leaves, restored
    against a live template) and ``train_state`` (JSON-able dict:
    epoch, EMA, plateau scheduler, best metrics, RNG key) make the
    checkpoint a *full* training state, so ``resume`` continues the
    exact trajectory — the capability of Lightning's ``ckpt_path``
    (reference training_pipeline.py:44-50,132), which restores
    optimizer moments, scheduler state, epoch counter and RNG."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    _save_tree(os.path.join(path, "params"), jax.device_get(params))
    if opt_state is not None:
        # structure-free storage: ordered leaves keyed by index; the
        # loader unflattens against tx.init(params), so optax version
        # or wrapper changes fail loudly (leaf-count mismatch), never
        # silently misassign moments
        leaves = jax.tree.leaves(jax.device_get(opt_state))
        tree = {f"{i:05d}": np.asarray(leaf)
                for i, leaf in enumerate(leaves)}
        _save_tree(os.path.join(path, "opt_state"), tree)
    meta = {"step": int(step), "format_version": 2,
            "has_opt_state": opt_state is not None}
    if train_state is not None:
        meta["train_state"] = train_state
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


def load_train_state(path: str, opt_state_template):
    """Restore ``(opt_state, train_state_dict)`` from a checkpoint.

    ``opt_state_template`` (e.g. ``tx.init(params)``) supplies the
    pytree structure and leaf dtypes; the stored ordered leaves are
    unflattened into it.  Returns ``(None, ...)`` for the optimizer
    state when the checkpoint predates format_version 2 or the leaf
    count no longer matches (different optimizer config)."""
    import jax.numpy as jnp

    path = os.path.abspath(path)
    meta = load_meta(path)
    opt_state = None
    if meta.get("has_opt_state"):
        tree = _load_tree(os.path.join(path, "opt_state"))
        stored = [tree[k] for k in sorted(tree)]
        t_leaves, treedef = jax.tree.flatten(opt_state_template)
        if len(stored) == len(t_leaves):
            leaves = [jnp.asarray(s).astype(t.dtype)
                      if hasattr(t, "dtype") else s
                      for s, t in zip(stored, t_leaves)]
            opt_state = jax.tree.unflatten(treedef, leaves)
    return opt_state, meta.get("train_state")


def load_checkpoint(path: str) -> Tuple[Optional[GotenModel], dict, int]:
    """Returns ``(model_or_None, params, step)``; the model is rebuilt
    when the checkpoint carries its config.  Run context beyond the
    model (task/label) is available via ``load_meta``."""
    path = os.path.abspath(path)
    meta = load_meta(path)
    params = _load_tree(os.path.join(path, "params"))
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
