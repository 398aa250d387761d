"""Smooth radial cutoff envelopes.

Equivalents of the reference's ``CosineCutoff`` and ``PolynomialCutoff``
(/root/reference/gotennet/models/components/layers.py:83-152), as pure
functions — they fuse into the RBF / attention computations under XLA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["cosine_cutoff", "polynomial_cutoff"]


def cosine_cutoff(r: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """0.5 * (cos(pi r / rc) + 1) for r < rc, else 0."""
    c = 0.5 * (jnp.cos(r * (math.pi / cutoff)) + 1.0)
    return c * (r < cutoff).astype(r.dtype)


def polynomial_cutoff(r: jnp.ndarray, cutoff: float, p: int = 6) -> jnp.ndarray:
    """DimeNet polynomial envelope of exponent ``p >= 2``; zero beyond rc."""
    if p < 2:
        raise ValueError(f"PolynomialCutoff exponent p={p} must be >= 2")
    x = r / cutoff
    out = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * x ** p
        + p * (p + 2.0) * x ** (p + 1)
        - (p * (p + 1.0) / 2.0) * x ** (p + 2)
    )
    return out * (x < 1.0).astype(r.dtype)
