"""Parameter conversion between this framework and reference-format
PyTorch state dicts.

The reference stores Lightning checkpoints whose ``state_dict`` uses
keys like ``representation.gata_list.0.W_q.weight`` with torch
``[out, in]`` linear layouts (see /root/reference/gotennet/models/
representation/gotennet.py:904-946 for the naming it strips/loads).
This module maps those names to/from our flax param tree (JAX
``[in, out]`` kernels), enabling

  * loading published pretrained GotenNet checkpoints into this
    framework (``state_dict_to_params``), and
  * exporting our training results for reference-side tooling
    (``params_to_state_dict``).

Buffers that the reference registers but never trains with default
configs (radial-basis means/betas, cutoff constants) are constants
here and are skipped.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from gotennet_tpu.models.gotennet import GotenNetConfig, parse_edge_updates

__all__ = ["params_to_state_dict", "state_dict_to_params",
           "head_mapping", "model_params_to_state_dict",
           "state_dict_to_model_params", "head_config_from_state_dict",
           "load_reference_checkpoint", "load_reference_model"]


def _dense(torch_name, jax_tree, bias=True, norm=False):
    """Mapping entries for torch Linear (+optional LayerNorm) <-> Dense."""
    out = [(f"{torch_name}.weight", jax_tree + ("linear", "kernel"), "T")]
    if bias:
        out.append((f"{torch_name}.bias", jax_tree + ("linear", "bias"), ""))
    if norm:
        out.append((f"{torch_name}.norm.weight", jax_tree + ("norm", "scale"), ""))
        out.append((f"{torch_name}.norm.bias", jax_tree + ("norm", "bias"), ""))
    return out


def _mlp(torch_name, jax_tree, n_layers, norm_hidden=False):
    out = []
    for i in range(n_layers):
        out += _dense(f"{torch_name}.dense_layers.{i}",
                      jax_tree + (f"layers_{i}",),
                      norm=(norm_hidden and i < n_layers - 1))
    return out


def _mapping(cfg: GotenNetConfig):
    """Full (torch_key, jax_path, transform) list for a representation."""
    info = parse_edge_updates(cfg.edge_updates)
    m = []
    m.append(("A_na.weight", ("A_na",), ""))
    m.append(("node_init.A_nbr.weight", ("node_init", "A_nbr"), ""))
    # reference W_ndp is a 1-layer MLP; ours is a single Dense
    m += _dense("node_init.W_ndp.dense_layers.0", ("node_init", "W_ndp"))
    m += _mlp("node_init.W_nrd_nru", ("node_init", "W_nrd_nru"), 2,
              norm_hidden=True)
    m += _dense("edge_init.W_erp", ("edge_init", "W_erp"))

    for i in range(cfg.n_interactions):
        g = f"gata_list.{i}"
        j = (f"gata_{i}",)
        m += _dense(f"{g}.gamma_s.0", j + ("gamma_s_0",))
        m += _dense(f"{g}.gamma_s.1", j + ("gamma_s_1",))
        m += _dense(f"{g}.W_q", j + ("W_q",))
        m += _dense(f"{g}.W_k", j + ("W_k",))
        m += _dense(f"{g}.gamma_v.0", j + ("gamma_v_0",))
        m += _dense(f"{g}.gamma_v.1", j + ("gamma_v_1",))
        m += _dense(f"{g}.W_re", j + ("W_re",))
        m += _dense(f"{g}.W_rs", j + ("W_rs",))
        last = i == cfg.n_interactions - 1
        if not last and cfg.edge_updates:
            n_gamma_t = 2 if (info["mlp"] or info["mlpa"]) else 1
            m += _mlp(f"{g}.gamma_t", j + ("gamma_t",), n_gamma_t,
                      norm_hidden=bool(cfg.edge_ln))
            m += _dense(f"{g}.W_vq", j + ("W_vq",), bias=False)
            if cfg.sep_htr:
                for l in range(cfg.lmax):
                    m += _dense(f"{g}.W_vk.{l}", j + (f"W_vk_{l}",),
                                bias=False)
            else:
                m += _dense(f"{g}.W_vk", j + ("W_vk",), bias=False)
            if info["lin_w"] > 0:
                m += _dense(f"{g}.W_edp", j + ("W_edp",),
                            norm=(info["lin_ln"] == 2))
        if cfg.layernorm:
            m.append((f"{g}.layernorm.weight", j + ("layernorm", "scale"), ""))
            m.append((f"{g}.layernorm.bias", j + ("layernorm", "bias"), ""))

        e = f"eqff_list.{i}"
        je = (f"eqff_{i}",)
        m += _dense(f"{e}.gamma_m.0", je + ("gamma_m_0",))
        m += _dense(f"{e}.gamma_m.1", je + ("gamma_m_1",))
        m += _dense(f"{e}.W_vu", je + ("W_vu",), bias=False)
    return m


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def params_to_state_dict(params: Dict, cfg: GotenNetConfig,
                         prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax params (under key 'params', representation subtree at root
    or under 'representation') -> reference-format state dict."""
    tree = params.get("params", params)
    if "representation" in tree:
        tree = tree["representation"]
    out = {}
    for torch_key, jax_path, tf in _mapping(cfg):
        arr = np.asarray(_get(tree, jax_path))
        if tf == "T":
            arr = arr.T
        out[prefix + torch_key] = arr
    return out


def state_dict_to_params(sd: Dict[str, np.ndarray], cfg: GotenNetConfig,
                         strip_prefix: str = "representation.") -> Dict:
    """Reference-format state dict -> flax representation param tree."""
    tree: Dict = {}
    for torch_key, jax_path, tf in _mapping(cfg):
        key = torch_key
        if strip_prefix and (strip_prefix + key) in sd:
            key = strip_prefix + key
        arr = np.asarray(sd[key], np.float32)
        if tf == "T":
            arr = arr.T
        _set(tree, jax_path, arr)
    return tree


def load_reference_checkpoint(path: str):
    """Load a reference Lightning checkpoint (.ckpt) into this
    framework: returns ``(cfg, {'params': tree})`` for the bare
    ``GotenNet`` representation (nest the tree under 'representation'
    to feed a ``GotenModel``).

    The checkpoint carries its representation hyper-parameters
    (reference ``save_hyperparameters``, goten_model.py:116) — the
    same config-in-checkpoint capability our own orbax checkpoints
    have — so no external configuration is needed.  Output-head
    weights are reference-version specific and are not converted yet.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = ckpt.get("hyper_parameters", {})
    rep_cfg = dict(hp.get("representation", {}))
    for k in ("_target_", "__target__", "cutoff_fn"):
        rep_cfg.pop(k, None)
    rep_cfg.setdefault("cutoff", float(hp.get("cutoff", 5.0)))
    known = {f.name for f in dataclasses.fields(GotenNetConfig)}
    cfg = GotenNetConfig(**{k: v for k, v in rep_cfg.items() if k in known})

    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt["state_dict"].items()}
    tree = state_dict_to_params(sd, cfg)
    return cfg, {"params": tree}
