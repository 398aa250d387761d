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
    if cfg.trainable_rbf:
        # reference GaussianRBF(trainable=True) lifts offsets+widths,
        # ExpNormalSmearing(trainable=True) lifts means+betas
        # (layers.py:307-322, 714-726); our RadialBasis.make mirrors
        # the names under the 'radial_basis' scope
        key = cfg.radial_basis.lower().replace("-", "").replace("_", "")
        fields = (("offsets", "widths") if key == "gaussianrbf"
                  else ("means", "betas"))
        for f in fields:
            m.append((f"radial_basis.{f}", ("radial_basis", f), ""))
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
                if info["lin_ln"] == 1:
                    # the 'ln' LayerNorm is index 0 of the gamma_w
                    # Sequential (reference gotennet.py:270-276)
                    m.append((f"{g}.gamma_w.0.weight",
                              j + ("gamma_w_ln", "scale"), ""))
                    m.append((f"{g}.gamma_w.0.bias",
                              j + ("gamma_w_ln", "bias"), ""))
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


def head_mapping(head, prefix: str = "output_modules.0."):
    """(torch_key, jax_path, transform) entries for an output head.

    Reference naming (outputs.py): Atomwise/ESE ``out_net`` is
    ``Sequential(GetItem, SchnetMLP)`` and SchnetMLP wraps its Dense
    stack in an inner ``out_net`` Sequential (layers.py:225-273), hence
    the ``out_net.1.out_net.{i}`` keys; Dipole holds two
    GatedEquivariantBlocks in ``equivariant_layers`` (outputs.py:418-425)
    with ``mix_vectors`` (bias-free) + ``scalar_net.{0,1}``.
    """
    m = []
    if head.kind in ("atomwise", "electronic_spatial_extent"):
        for i in range(head.n_layers):
            m += _dense(f"{prefix}out_net.1.out_net.{i}",
                        ("head", "out_net", f"dense_{i}"))
    elif head.kind == "dipole":
        for k in range(2):
            g = f"{prefix}equivariant_layers.{k}"
            j = ("head", f"eq_{k}")
            m += _dense(f"{g}.mix_vectors", j + ("mix_vectors",),
                        bias=False)
            m += _dense(f"{g}.scalar_net.0", j + ("scalar_net_0",))
            m += _dense(f"{g}.scalar_net.1", j + ("scalar_net_1",))
    else:
        raise ValueError(f"no reference mapping for head kind "
                         f"{head.kind!r}")
    return m


def model_params_to_state_dict(params: Dict, cfg: GotenNetConfig,
                               head) -> Dict[str, np.ndarray]:
    """Full GotenModel params (representation + head) -> reference
    Lightning state-dict naming, including the head's standardization
    buffers (ScaleShift mean/stddev, layers.py:172-202) and frozen
    atomref embedding."""
    tree = params.get("params", params)
    out = {}
    for torch_key, jax_path, tf in _mapping(cfg):
        arr = np.asarray(_get(tree["representation"], jax_path))
        out["representation." + torch_key] = arr.T if tf == "T" else arr
    for torch_key, jax_path, tf in head_mapping(head):
        # head paths are rooted at the model tree: ('head', ...)
        arr = np.asarray(_get(tree, jax_path))
        out[torch_key] = arr.T if tf == "T" else arr
    if head.kind in ("atomwise", "electronic_spatial_extent"):
        out["output_modules.0.standardize.mean"] = np.asarray(
            [head.mean], np.float32)
        out["output_modules.0.standardize.stddev"] = np.asarray(
            [head.stddev], np.float32)
        if head.atomref is not None:
            table = np.asarray(head.atomref, np.float32)
            if table.ndim == 1:
                table = table[:, None]
            out["output_modules.0.atomref.weight"] = table
    return out


def state_dict_to_model_params(sd: Dict[str, np.ndarray],
                               cfg: GotenNetConfig, head) -> Dict:
    """Reference-format full state dict -> flax GotenModel param tree
    ``{'representation': ..., 'head': ...}``."""
    tree: Dict = {"representation": state_dict_to_params(sd, cfg)}
    for torch_key, jax_path, tf in head_mapping(head):
        arr = np.asarray(sd[torch_key], np.float32)
        if tf == "T":
            arr = arr.T
        _set(tree, jax_path, arr)
    return tree


def head_config_from_state_dict(sd: Dict[str, np.ndarray],
                                derivative: bool = False):
    """Infer a HeadConfig from reference state-dict keys: the head kind
    from its parameter signature, MLP depth/widths from the Dense
    shapes, standardization from the ScaleShift buffers, atomref from
    the frozen embedding.  Activations follow the reference QM9Task
    wiring (QM9Task.py:156-199: silu for Atomwise/Dipole, default
    shifted-softplus for ESE)."""
    from gotennet_tpu.models.model import HeadConfig

    pre = "output_modules.0."
    if f"{pre}equivariant_layers.0.mix_vectors.weight" in sd:
        nh = sd[f"{pre}equivariant_layers.0.mix_vectors.weight"].shape[0] // 2
        return HeadConfig(kind="dipole", n_hidden=int(nh),
                          activation="silu")
    kind = ("electronic_spatial_extent"
            if f"{pre}atomic_mass" in sd else "atomwise")
    widths = []
    i = 0
    while f"{pre}out_net.1.out_net.{i}.weight" in sd:
        widths.append(sd[f"{pre}out_net.1.out_net.{i}.weight"].shape[0])
        i += 1
    if not widths:
        raise ValueError("state dict has no recognizable output head")
    n_layers = len(widths)
    n_in = sd[f"{pre}out_net.1.out_net.0.weight"].shape[1]
    # pyramidal (n_hidden=None) iff each hidden width halves the input
    pyramidal = all(widths[j] == n_in // (2 ** (j + 1))
                    for j in range(n_layers - 1))
    n_hidden = None if pyramidal else tuple(int(w) for w in widths[:-1])
    mean = float(sd.get(f"{pre}standardize.mean", np.zeros(1))[0])
    stddev = float(sd.get(f"{pre}standardize.stddev", np.ones(1))[0])
    atomref = sd.get(f"{pre}atomref.weight")
    return HeadConfig(
        kind=kind, n_out=int(widths[-1]), n_layers=n_layers,
        n_hidden=n_hidden, mean=mean, stddev=stddev,
        atomref=np.asarray(atomref, np.float32)
        if atomref is not None else None,
        activation="silu" if kind == "atomwise" else "ssp",
        derivative=derivative)


def _parse_reference_ckpt(path: str):
    """(GotenNetConfig, numpy state dict, hyper_parameters) from a
    reference Lightning .ckpt.  The checkpoint carries its
    representation hyper-parameters (reference ``save_hyperparameters``,
    goten_model.py:116) — the same config-in-checkpoint capability our
    own orbax checkpoints have — so no external configuration is
    needed."""
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
    return cfg, sd, hp


def load_reference_checkpoint(path: str):
    """Load a reference Lightning checkpoint (.ckpt) into this
    framework: returns ``(cfg, {'params': tree})`` for the bare
    ``GotenNet`` representation.  Use ``load_reference_model`` for the
    full model including the output head."""
    cfg, sd, _ = _parse_reference_ckpt(path)
    return cfg, {"params": state_dict_to_params(sd, cfg)}


def load_reference_model(path: str):
    """Load a reference Lightning checkpoint as a complete, ready-to-run
    ``GotenModel`` — representation AND output head — mirroring the
    reference's ``from_pretrained`` end-to-end rebuild
    (goten_model.py:160-168; head weights live in the same state_dict,
    outputs.py:96-542).  Returns ``(model, {'params': tree}, hp)``.
    """
    from gotennet_tpu.models.model import GotenModel

    cfg, sd, hp = _parse_reference_ckpt(path)
    derivative = str(hp.get("task", "QM9")) in ("rMD17", "MD17", "MD22")
    head = head_config_from_state_dict(sd, derivative=derivative)
    tree = state_dict_to_model_params(sd, cfg, head)
    return GotenModel(cfg, head), {"params": tree}, hp
