"""Normalization for steerable (degree-l) features.

``TensorLayerNorm`` reimplements the reference's VisNet-style max-min
norm (/root/reference/gotennet/models/components/layers.py:1497-1563)
branch-free: per degree block, the m-axis norm of each channel is
rescaled to [0, 1] across channels per node, and the directions are
re-applied.  The reference's global all-zero early-exit is subsumed —
with the same eps clamping, all-zero inputs already map to zeros.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as fnn

from gotennet_tpu.ops.spherical import degree_slices

__all__ = ["TensorLayerNorm", "tensor_max_min_norm"]

_EPS = 1e-12


def tensor_max_min_norm(block: jnp.ndarray) -> jnp.ndarray:
    """Max-min normalize one degree block ``[..., 2l+1, D]``."""
    dist = jnp.sqrt(jnp.sum(block ** 2, axis=-2, keepdims=True))  # [...,1,D]
    dist = jnp.maximum(dist, _EPS)
    direct = block / dist
    max_val = jnp.max(dist, axis=-1, keepdims=True)  # [N,1,1]
    min_val = jnp.min(dist, axis=-1, keepdims=True)
    delta = max_val - min_val
    delta = jnp.where(delta == 0, jnp.ones_like(delta), delta)
    scaled = (dist - min_val) / delta
    return jnp.maximum(scaled, 0.0) * direct


class TensorLayerNorm(fnn.Module):
    """Per-degree max-min norm of ``X [N, (lmax+1)^2-1, D]`` with an
    optional trainable channel weight."""

    hidden_channels: int
    lmax: int
    trainable: bool = False
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        parts = [
            tensor_max_min_norm(x[..., lo:hi, :])
            for lo, hi in degree_slices(self.lmax)
        ]
        out = jnp.concatenate(parts, axis=-2)
        if self.trainable:
            w = self.param("weight", fnn.initializers.ones,
                           (self.hidden_channels,), self.param_dtype)
            out = out * w
        return out
