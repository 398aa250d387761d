"""Output heads: atomwise properties, dipole, electronic spatial extent.

TPU-native equivalents of the reference heads
(/root/reference/gotennet/models/components/outputs.py).  Heads are
flax modules mapping ``(batch, h, X)`` to a dict of per-graph
predictions; forces are not computed here — the task layer wraps the
whole energy function in ``jax.grad`` w.r.t. positions (reference
computes them with torch autograd inside the head, outputs.py:365-375).

The 119-entry atomic-mass table replaces the reference's ``ase`` import
(outputs.py:3,513).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from gotennet_tpu.graph.batch import GraphBatch
from gotennet_tpu.graph.segment import segment_sum
from gotennet_tpu.nn.dense import Dense
from gotennet_tpu.ops.activations import get_activation, shifted_softplus

__all__ = [
    "SchnetMLP",
    "GatedEquivariantBlock",
    "Atomwise",
    "Dipole",
    "ElectronicSpatialExtent",
    "ATOMIC_MASSES",
]

# IUPAC 2021 standard atomic weights, index = atomic number (0 = dummy).
# Same table as ase.data.atomic_masses (used by the reference's ESE head).
ATOMIC_MASSES = np.asarray([
    1.008, 1.008, 4.002602, 6.94, 9.0121831, 10.81, 12.011, 14.007, 15.999,
    18.998403163, 20.1797, 22.98976928, 24.305, 26.9815385, 28.085,
    30.973761998, 32.06, 35.45, 39.948, 39.0983, 40.078, 44.955908, 47.867,
    50.9415, 51.9961, 54.938044, 55.845, 58.933194, 58.6934, 63.546, 65.38,
    69.723, 72.63, 74.921595, 78.971, 79.904, 83.798, 85.4678, 87.62,
    88.90584, 91.224, 92.90637, 95.95, 97.90721, 101.07, 102.9055, 106.42,
    107.8682, 112.414, 114.818, 118.71, 121.76, 127.6, 126.90447, 131.293,
    132.90545196, 137.327, 138.90547, 140.116, 140.90766, 144.242, 144.91276,
    150.36, 151.964, 157.25, 158.92535, 162.5, 164.93033, 167.259, 168.93422,
    173.054, 174.9668, 178.49, 180.94788, 183.84, 186.207, 190.23, 192.217,
    195.084, 196.966569, 200.592, 204.38, 207.2, 208.9804, 208.98243,
    209.98715, 222.01758, 223.01974, 226.02541, 227.02775, 232.0377,
    231.03588, 238.02891, 237.04817, 244.06421, 243.06138, 247.07035,
    247.07031, 251.07959, 252.083, 257.09511, 258.09843, 259.101, 262.11,
    267.122, 268.126, 271.134, 270.133, 269.1338, 278.156, 281.165, 281.166,
    285.177, 286.182, 289.19, 289.194, 293.204, 293.208, 294.214,
], dtype=np.float32)


class SchnetMLP(fnn.Module):
    """Pyramidal MLP with halving hidden widths (reference SchnetMLP,
    layers.py:225-273): default n_layers=2 gives [n_in, n_in//2, n_out]
    with activation on all but the final layer."""

    n_in: int
    n_out: int
    n_hidden: Optional[int] = None
    n_layers: int = 2
    activation: Any = shifted_softplus

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        if self.n_hidden is None:
            dims = []
            c = self.n_in
            for _ in range(self.n_layers):
                dims.append(c)
                c = c // 2
            dims.append(self.n_out)
        else:
            nh = self.n_hidden
            hidden = [nh] * (self.n_layers - 1) if isinstance(nh, int) else list(nh)
            dims = [self.n_in] + hidden + [self.n_out]
        for i in range(len(dims) - 2):
            x = Dense(dims[i + 1], activation=act, name=f"dense_{i}")(x)
        return Dense(dims[-1], activation=None,
                     name=f"dense_{len(dims) - 2}")(x)


def _safe_norm(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """L2 norm with exact forward AND zero (not NaN) gradient at v=0.

    Padded node/graph slots carry exactly-zero vectors; plain
    ``jnp.linalg.norm`` there backpropagates 0/0=NaN which poisons the
    whole gradient even though the slot's cotangent is zero (NaN*0).
    The reference never pads (PyG dynamic shapes, outputs.py:82,463),
    so this is a static-shape necessity, not a math change: real rows
    are untouched."""
    n2 = jnp.sum(v * v, axis=axis)
    nonzero = n2 > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, n2, 1.0)), 0.0)


class GatedEquivariantBlock(fnn.Module):
    """PaiNN-style gated block (reference outputs.py:24-92): mixes
    vector channels with two bias-free linear maps, feeds [s ; ||V||]
    through a scalar net, and gates the W vectors by scalar outputs."""

    n_sin: int
    n_vin: int
    n_sout: int
    n_vout: int
    n_hidden: int
    activation: Any = "silu"
    sactivation: Any = None

    @fnn.compact
    def __call__(self, scalars, vectors):
        act = get_activation(self.activation)
        vmix = Dense(2 * self.n_vout, use_bias=False, activation=None,
                     name="mix_vectors")(vectors)  # [N, 3, 2*vout]
        v_V, v_W = vmix[..., :self.n_vout], vmix[..., self.n_vout:]
        v_Vn = _safe_norm(v_V, axis=-2)  # [N, vout]
        ctx = jnp.concatenate([scalars, v_Vn], axis=-1)
        x = Dense(self.n_hidden, activation=act, name="scalar_net_0")(ctx)
        x = Dense(self.n_sout + self.n_vout, activation=None,
                  name="scalar_net_1")(x)
        s_out, gate = x[..., :self.n_sout], x[..., self.n_sout:]
        v_out = gate[..., None, :] * v_W
        sact = get_activation(self.sactivation)
        if sact is not None:
            s_out = sact(s_out)
        return s_out, v_out


class Atomwise(fnn.Module):
    """Per-atom MLP -> standardize -> +atomref -> masked graph sum
    (+optionally per-atom contributions).  Reference Atomwise,
    outputs.py:232-376; ``mean`` is added per atom through ScaleShift.
    """

    n_in: int
    n_out: int = 1
    n_layers: int = 2
    n_hidden: Optional[int] = None
    activation: Any = shifted_softplus
    aggregation: Optional[str] = "sum"
    mean: float = 0.0
    stddev: float = 1.0
    atomref: Optional[np.ndarray] = None  # [max_z, n_out] or None
    standardize: bool = True
    per_atom_mean: bool = True  # reference Atomwise adds mean per atom

    @fnn.compact
    def __call__(self, batch: GraphBatch, h, X):
        yi = SchnetMLP(self.n_in, self.n_out, self.n_hidden, self.n_layers,
                       self.activation, name="out_net")(h)  # [N, n_out]
        if self.standardize:
            if self.per_atom_mean:
                yi = yi * self.stddev + self.mean
            else:
                yi = yi * self.stddev
        if self.atomref is not None:
            table = jnp.asarray(self.atomref, jnp.float32)
            if table.ndim == 1:
                table = table[:, None]
            yi = yi + table[batch.z]
        if self.aggregation is None:
            return {"property": yi, "contributions": yi}
        y = segment_sum(yi, batch.node_graph, batch.num_graphs,
                        batch.node_mask)
        if self.standardize and not self.per_atom_mean:
            y = y + self.mean
        return {"property": y, "contributions": yi}


class Dipole(fnn.Module):
    """Dipole head (reference outputs.py:379-468): two gated
    equivariant blocks over (h, X l=1), atomic dipoles + position x
    charge offsets, graph sum, optional magnitude."""

    n_in: int
    n_hidden: Optional[int] = None
    activation: Any = "silu"
    predict_magnitude: bool = True
    mean: Optional[float] = None
    stddev: Optional[float] = None

    @fnn.compact
    def __call__(self, batch: GraphBatch, h, X):
        nh = self.n_hidden or self.n_in
        l0, l1 = h, X[:, 0:3, :]  # scalars [N,D], l=1 vectors [N,3,D]
        l0, l1 = GatedEquivariantBlock(
            self.n_in, self.n_in, nh, nh, nh, self.activation,
            sactivation=self.activation, name="eq_0")(l0, l1)
        l0, l1 = GatedEquivariantBlock(
            nh, nh, 1, 1, nh, self.activation, name="eq_1")(l0, l1)
        if self.stddev is not None:
            l0 = self.stddev * l0 + (self.mean or 0.0)
        atomic_dipoles = l1[..., 0]            # [N, 3]
        charges = l0                           # [N, 1]
        y_atom = atomic_dipoles + batch.pos * charges
        y = segment_sum(y_atom, batch.node_graph, batch.num_graphs,
                        batch.node_mask)       # [G, 3]
        y_vector = segment_sum(l1, batch.node_graph, batch.num_graphs,
                               batch.node_mask)
        if self.predict_magnitude:
            y = _safe_norm(y, axis=1)[:, None]
        return {"property": y, "property_vector": y_vector}


class ElectronicSpatialExtent(fnn.Module):
    """<R^2> head (reference ElectronicSpatialExtentV2,
    outputs.py:471-542): mass-weighted molecular center, per-atom
    |pos - c|^2 * MLP(h), graph sum."""

    n_in: int
    n_layers: int = 2
    n_hidden: Optional[int] = None
    activation: Any = shifted_softplus

    @fnn.compact
    def __call__(self, batch: GraphBatch, h, X):
        x = SchnetMLP(self.n_in, 1, self.n_hidden, self.n_layers,
                      self.activation, name="out_net")(h)  # [N, 1]
        mass = jnp.asarray(ATOMIC_MASSES)[batch.z][:, None]  # [N,1]
        mass = mass * batch.node_mask[:, None]
        mpos = segment_sum(mass * batch.pos, batch.node_graph,
                           batch.num_graphs, batch.node_mask)
        msum = segment_sum(mass, batch.node_graph, batch.num_graphs,
                           batch.node_mask)
        c = mpos / jnp.maximum(msum, 1e-12)  # [G, 3]
        rel = batch.pos - c[batch.node_graph]
        yi = jnp.sum(rel ** 2, axis=1, keepdims=True) * x
        y = segment_sum(yi, batch.node_graph, batch.num_graphs,
                        batch.node_mask)
        return {"property": y, "contributions": yi}
