"""Activation functions and string registry.

Mirrors the capability of the reference registry
(/root/reference/gotennet/models/components/layers.py:41-81, 596-701):
case-insensitive lookup ignoring ``-``/``_``/spaces, covering the
activations the configs actually use plus the common torch.nn set.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["shifted_softplus", "swish", "get_activation"]

_LOG2 = math.log(2.0)


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - ln 2 (SchNet's 'ssp', zero at the origin)."""
    return jax.nn.softplus(x) - _LOG2


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) — identical to SiLU."""
    return x * jax.nn.sigmoid(x)


def _normalize(s: str) -> str:
    return s.lower().replace("-", "").replace("_", "").replace(" ", "")


def is_silu_like(name) -> bool:
    """True when ``name`` resolves to silu/swish — the only activation
    the fused Pallas kernels implement (they hardcode x*sigmoid(x) for
    the filter/gate nonlinearities); callers fall back to the XLA path
    otherwise."""
    return isinstance(name, str) and _normalize(name) in ("silu", "swish")


_ACTIVATIONS = {
    "ssp": shifted_softplus,
    "softplus": shifted_softplus,  # reference maps 'softplus' -> shifted
    "shiftedsoftplus": shifted_softplus,
    "silu": jax.nn.silu,
    "swish": swish,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "selu": jax.nn.selu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leakyrelu": jax.nn.leaky_relu,
    "softsign": jax.nn.soft_sign,
    "identity": lambda x: x,
}


def get_activation(
    name: Optional[str | Callable],
) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    """Resolve an activation by name; passes callables through, returns
    ``None`` for ``None``/empty string (meaning: no activation)."""
    if name is None or name == "":
        return None
    if callable(name):
        return name
    key = _normalize(name)
    if key not in _ACTIVATIONS:
        raise ValueError(
            f"Unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[key]
