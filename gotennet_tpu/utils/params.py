"""Parameter-tree conversion between the unrolled and layer-scanned
representation stacks.

``GotenNetConfig.scan_layers`` rolls the n-1 homogeneous (GATA+EQFF)
layers into one ``lax.scan`` whose parameters live under a single
``layers`` collection with a stacked leading axis:

    unrolled:   rep/gata_0 ... rep/gata_{n-2}, rep/eqff_0 ...    (+ last)
    scanned:    rep/layers/gata [n-1, ...], rep/layers/eqff [n-1, ...]

The last layer (structurally different: no edge update, reference
gotennet.py:874) keeps its ``gata_{n-1}`` / ``eqff_{n-1}`` names in
both forms.  These helpers convert either direction so checkpoints and
the torch converter (which speak the unrolled naming) interoperate
with scanned models.  Works on the representation subtree of any
layout (edge / dense / ell share the naming scheme).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["roll_layer_params", "unroll_layer_params",
           "convert_layer_params"]


def _rep_view(tree):
    """Locate the representation subtree inside a params pytree:
    accepts {'params': {'representation': ...}}, {'representation':
    ...}, or the representation dict itself."""
    node = tree
    path = []
    for key in ("params", "representation"):
        if isinstance(node, dict) and key in node:
            path.append(key)
            node = node[key]
    return node, path


def _replace(tree, path, new_rep):
    if not path:
        return new_rep
    out = dict(tree)
    cur = out
    for key in path[:-1]:
        cur[key] = dict(cur[key])
        cur = cur[key]
    cur[path[-1]] = new_rep
    return out


def roll_layer_params(params, n_interactions: int):
    """Unrolled ``gata_i``/``eqff_i`` (i < n-1) -> stacked ``layers``
    collection (leading axis n-1).  The last layer is untouched."""
    rep, path = _rep_view(params)
    rep = dict(rep)
    n = n_interactions
    if "layers" in rep:
        return params  # already rolled
    gata = [rep.pop(f"gata_{i}") for i in range(n - 1)]
    eqff = [rep.pop(f"eqff_{i}") for i in range(n - 1)]
    rep["layers"] = {
        "gata": jax.tree.map(lambda *xs: jnp.stack(xs), *gata),
        "eqff": jax.tree.map(lambda *xs: jnp.stack(xs), *eqff),
    }
    return _replace(params, path, rep)


def unroll_layer_params(params, n_interactions: int):
    """Inverse of :func:`roll_layer_params`."""
    rep, path = _rep_view(params)
    rep = dict(rep)
    n = n_interactions
    if "layers" not in rep:
        return params  # already unrolled
    layers = rep.pop("layers")
    for i in range(n - 1):
        rep[f"gata_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                        layers["gata"])
        rep[f"eqff_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                        layers["eqff"])
    return _replace(params, path, rep)


def convert_layer_params(params, n_interactions: int, scan_layers: bool):
    """Bring ``params`` into the form matching ``scan_layers``."""
    if scan_layers:
        return roll_layer_params(params, n_interactions)
    return unroll_layer_params(params, n_interactions)
