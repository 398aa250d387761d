"""Composed-YAML configuration system.

Light-weight replacement for the reference's Hydra/OmegaConf stack
(/root/reference/gotennet/configs/**), keeping the capabilities the
project actually uses (SURVEY.md section 5):

  * group composition — a root config lists ``defaults`` naming one
    YAML per group directory (model/, datamodule/, trainer/, ...);
  * experiment overlays — ``experiment=<name>`` deep-merges
    ``experiment/<name>.yaml`` on top (the `@package _global_` idiom);
  * dotted CLI overrides — ``model.representation.lmax=3`` (YAML-parsed
    scalars, so ``lr=1e-5`` is a float and ``edge_updates=true`` a bool);
  * ``${...}`` interpolation against the merged tree and
    ``${oc.env:VAR}`` / ``${env:VAR}`` against the environment;
  * run-dir management and a config dump into the run dir.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Dict, List, Optional

import yaml

__all__ = ["load_config", "merge", "apply_overrides", "resolve"]

_INTERP = re.compile(r"\$\{([^}]+)\}")


def merge(base: Dict, overlay: Dict) -> Dict:
    """Recursive dict merge; overlay wins, dicts merge, others replace."""
    out = copy.deepcopy(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _get_path(tree: Dict, dotted: str):
    node = tree
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            raise KeyError(dotted)
        node = node[part]
    return node


def _set_path(tree: Dict, dotted: str, value) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


_SCI_FLOAT = re.compile(r"[-+]?(\d+\.?\d*|\.\d+)[eE][-+]?\d+")


def _parse_scalar(raw: str):
    """YAML-parse a CLI value; also accept bare scientific notation
    ('3e-4'), which YAML 1.1 treats as a string."""
    value = yaml.safe_load(raw)
    if isinstance(value, str) and _SCI_FLOAT.fullmatch(value.strip()):
        return float(value)
    return value


def apply_overrides(cfg: Dict, overrides: List[str]) -> Dict:
    """Apply ``key.path=value`` strings; values YAML-parsed."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, raw = ov.partition("=")
        _set_path(cfg, key.strip(), _parse_scalar(raw))
    return cfg


def resolve(cfg: Dict) -> Dict:
    """Resolve ``${path.in.tree}`` and ``${env:VAR}`` interpolations."""
    def subst(value, root):
        if isinstance(value, str):
            m = _INTERP.fullmatch(value)
            if m:  # whole-string interpolation keeps the native type
                return lookup(m.group(1), root)
            return _INTERP.sub(lambda mm: str(lookup(mm.group(1), root)),
                               value)
        if isinstance(value, dict):
            return {k: subst(v, root) for k, v in value.items()}
        if isinstance(value, list):
            return [subst(v, root) for v in value]
        return value

    def lookup(expr: str, root):
        if expr.startswith(("oc.env:", "env:")):
            var = expr.split(":", 1)[1]
            name, _, default = var.partition(",")
            return os.environ.get(name.strip(), default.strip() or None)
        return _get_path(root, expr)

    prev = None
    out = cfg
    for _ in range(8):  # nested interpolations
        if out == prev:
            break
        prev = out
        out = subst(out, out)
    return out


def load_config(config_dir: str, root: str = "train.yaml",
                overrides: Optional[List[str]] = None) -> Dict:
    """Compose a config tree from a config directory.

    The root YAML may contain ``defaults: [{group: name}, ...]``; each
    entry loads ``<config_dir>/<group>/<name>.yaml`` into key
    ``group``.  A special override ``experiment=<name>`` deep-merges
    ``experiment/<name>.yaml`` over the whole tree *before* the other
    dotted overrides apply.
    """
    overrides = list(overrides or [])

    def read(p):
        with open(p) as f:
            return yaml.safe_load(f) or {}

    cfg = read(os.path.join(config_dir, root))
    defaults = cfg.pop("defaults", [])
    for entry in defaults:
        if isinstance(entry, str):
            group, name = entry.split("/", 1) if "/" in entry else (entry, None)
        else:
            (group, name), = entry.items()
        if name is None:
            continue
        path = os.path.join(config_dir, group, f"{name}.yaml")
        cfg[group] = merge(cfg.get(group, {}), read(path))

    # experiment overlay
    exp = None
    rest = []
    for ov in overrides:
        if ov.startswith("experiment="):
            exp = ov.split("=", 1)[1]
        else:
            rest.append(ov)
    if exp:
        cfg = merge(cfg, read(os.path.join(config_dir, "experiment",
                                           f"{exp}.yaml")))
    if rest:
        cfg = apply_overrides(cfg, rest)
    cfg = resolve(cfg)
    # record which dotted keys came from the CLI so consumers can tell
    # an explicit override from a config-default value (cli.test uses
    # this to give the checkpoint's label precedence over train.yaml's
    # default, ≙ reference testing_pipeline.py:43-45)
    cfg["_overrides"] = sorted(ov.partition("=")[0].strip() for ov in rest)
    return cfg
