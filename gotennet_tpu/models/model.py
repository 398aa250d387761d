"""Combined property-prediction model: representation + output head(s),
with forces via ``jax.grad`` through atomic positions.

Capability equivalent of the reference's LightningModule forward path
(/root/reference/gotennet/models/goten_model.py:276-409) re-shaped for
JAX: the model is a pure function of ``(params, batch)``; the force
path wraps the energy in ``jax.value_and_grad`` w.r.t. ``batch.pos``
(the reference calls torch autograd inside the head,
outputs.py:365-375).  Everything composes under ``jit``/``grad`` —
force training is plain grad-of-grad.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from gotennet_tpu.graph.batch import GraphBatch
from gotennet_tpu.models.gotennet import GotenNet, GotenNetConfig
from gotennet_tpu.models.heads import (
    Atomwise,
    Dipole,
    ElectronicSpatialExtent,
)

__all__ = ["HeadConfig", "GotenModel", "apply_with_forces"]


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Output-head selection and standardization metadata.

    ``kind``: 'atomwise' | 'dipole' | 'electronic_spatial_extent'.
    ``derivative``: if True the task layer also returns
    ``forces = -dE/dpos`` (sign flipped unless ``negative_dr`` False).
    """

    kind: str = "atomwise"
    n_out: int = 1
    n_hidden: Optional[int] = None
    n_layers: int = 2
    activation: Any = "silu"
    mean: float = 0.0
    stddev: float = 1.0
    atomref: Optional[np.ndarray] = None
    aggregation: Optional[str] = "sum"
    derivative: bool = False
    negative_dr: bool = True
    # Dipole head: return ||mu|| (the QM9 'mu' target) instead of the
    # vector (reference Dipole predict_magnitude, outputs.py:418-446).
    predict_magnitude: bool = True

    def __hash__(self):  # atomref array is identity-hashed
        return hash((self.kind, self.n_out, self.n_hidden, self.n_layers,
                     str(self.activation), self.mean, self.stddev,
                     id(self.atomref), self.aggregation, self.derivative,
                     self.negative_dr, self.predict_magnitude))


class GotenModel(fnn.Module):
    """Representation + one output head -> result dict.

    Returns at least ``{'property': [G, n_out]}`` plus head-specific
    extras; also exposes the raw ``(h, X)`` under ``representation`` /
    ``vector_representation`` like the reference batch attributes.

    ``layout`` selects the representation implementation:
    'edge' (flat edge list — large molecules, edge partitioning),
    'dense' (batched [G, M, M] blocks — small molecules, MXU-bound), or
    'ell' (padded [N, K] neighbor rows — large molecules with bounded
    degree, scatter-free). All share one parameter tree; checkpoints
    are interchangeable.
    """

    cfg: GotenNetConfig
    head: HeadConfig
    layout: str = "edge"

    @fnn.compact
    def __call__(self, batch,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        if self.layout not in ("edge", "dense", "ell"):
            raise ValueError(f"Unknown layout {self.layout!r}; "
                             "choose edge | dense | ell")
        if self.layout == "dense":
            from gotennet_tpu.graph.dense_batch import flatten_nodes
            from gotennet_tpu.models.gotennet_dense import GotenNetDense
            # resolve pos_grads=None to the head's needs: only force
            # heads differentiate positions (apply_with_forces), so
            # energy-only training skips g_rl/g_env in the fused VJP
            cfg = self.cfg
            if cfg.pos_grads is None:
                cfg = dataclasses.replace(
                    cfg, pos_grads=self.head.derivative)
            h, X = GotenNetDense(cfg, name="representation")(
                batch, deterministic=deterministic)
            g, m = h.shape[:2]
            h = h.reshape(g * m, -1)
            X = X.reshape(g * m, X.shape[2], X.shape[3])
            batch = flatten_nodes(batch)
        elif self.layout == "ell":
            from gotennet_tpu.models.gotennet_ell import GotenNetELL
            h, X = GotenNetELL(self.cfg, name="representation")(
                batch, deterministic=deterministic)
        else:
            h, X = GotenNet(self.cfg, name="representation").from_batch(
                batch, deterministic=deterministic)
        hc = self.head
        if hc.kind == "atomwise":
            out = Atomwise(
                n_in=self.cfg.n_atom_basis, n_out=hc.n_out,
                n_layers=hc.n_layers, n_hidden=hc.n_hidden,
                activation=hc.activation, aggregation=hc.aggregation,
                mean=hc.mean, stddev=hc.stddev, atomref=hc.atomref,
                name="head")(batch, h, X)
        elif hc.kind == "dipole":
            out = Dipole(
                n_in=self.cfg.n_atom_basis, n_hidden=hc.n_hidden,
                activation=hc.activation,
                predict_magnitude=hc.predict_magnitude,
                mean=hc.mean, stddev=hc.stddev, name="head")(batch, h, X)
        elif hc.kind == "electronic_spatial_extent":
            out = ElectronicSpatialExtent(
                n_in=self.cfg.n_atom_basis, n_layers=hc.n_layers,
                n_hidden=hc.n_hidden, activation=hc.activation,
                name="head")(batch, h, X)
        else:
            raise ValueError(f"Unknown head kind {hc.kind!r}")
        out["representation"] = h
        out["vector_representation"] = X
        return out


def apply_with_forces(model: GotenModel, params, batch: GraphBatch,
                      deterministic: bool = True,
                      rngs=None) -> Dict[str, jnp.ndarray]:
    """Run the model and add ``forces = -dE/dpos`` when the head asks
    for derivatives.  The edge list is static; distances/vectors are
    recomputed from ``pos`` inside the model, so the gradient is exact
    (same contract as the reference's autograd path)."""
    if not model.head.derivative:
        return model.apply(params, batch, deterministic=deterministic,
                           rngs=rngs)

    def energy_fn(pos):
        out = model.apply(params, batch.replace(pos=pos),
                          deterministic=deterministic, rngs=rngs)
        return jnp.sum(out["property"]), out

    (_, out), dy = jax.value_and_grad(energy_fn, has_aux=True)(batch.pos)
    if model.cfg.edge_axis is not None:
        # graph-sharded execution (edge partitioning / ELL row
        # sharding inside shard_map): each device's dE/dpos carries
        # only its own pair shard's contributions, scaled by the
        # shard count through the in-forward psum transpose — pmean
        # over the axis restores the exact full-graph forces
        dy = jax.lax.pmean(dy, model.cfg.edge_axis)
    sign = -1.0 if model.head.negative_dr else 1.0
    # node_mask is [N] (edge/ell) or [G, M] (dense); mask the last axis
    out["forces"] = sign * dy * batch.node_mask[..., None]
    return out
