"""Dense / MLP flax modules with the reference's init registry.

Equivalent capability to the reference's ``Dense``/``MLP``
(/root/reference/gotennet/models/components/layers.py:457-581) and its
weight-init registry (layers.py:363-452): '' (framework default, i.e.
torch Linear's kaiming-uniform), 'zeros', 'xavier_uniform',
'glo_orthogonal', 'he_orthogonal'.  Layer layout is linear -> optional
LayerNorm -> optional activation.

Kernel shapes follow the JAX convention ``[in, out]``; orthogonal inits
are generated in torch's ``[out, in]`` orientation and transposed so the
sampled distribution matches the reference exactly.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

__all__ = ["Dense", "MLP", "get_weight_init"]

Initializer = Callable[..., jnp.ndarray]


def _torch_default_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear's default: kaiming_uniform(a=sqrt(5)) on [out, in]
    = U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _xavier_uniform(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _orthogonal_torch(key, out_features, in_features, dtype):
    """torch.nn.init.orthogonal_ on a [out, in] matrix, transposed to
    [in, out]."""
    q = jax.nn.initializers.orthogonal(column_axis=-1)(
        key, (out_features, in_features), dtype)
    return q.T


def _glorot_orthogonal(scale: float = 2.0) -> Initializer:
    """PyG glorot_orthogonal: orthogonal, then rescaled so
    Var(W) = scale / (fan_in + fan_out)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        w = _orthogonal_torch(key, fan_out, fan_in, dtype)
        var = jnp.var(w)
        w = w * jnp.sqrt(scale / ((fan_in + fan_out) * var))
        return w
    return init


def _he_orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal basis, standardized to zero mean / unit variance per
    torch row-axis, scaled by 1/sqrt(fan_in) (reference
    he_orthogonal_init, layers.py:401-425)."""
    fan_in, fan_out = shape[0], shape[1]
    w = _orthogonal_torch(key, fan_out, fan_in, dtype)  # [in, out]
    # reference standardizes over torch dim=1 == input axis
    mean = jnp.mean(w, axis=0, keepdims=True)
    var = jnp.var(w, axis=0, keepdims=True, ddof=1)
    w = (w - mean) / jnp.sqrt(var + 1e-6)
    return w * (1.0 / math.sqrt(fan_in))


def get_weight_init(name: Optional[str | Callable],
                    gain: Optional[float] = None) -> Initializer:
    """Resolve an initializer by the reference registry's names."""
    if callable(name):
        return name
    if name is None or name == "":
        return _torch_default_init
    if name == "zeros":
        return jax.nn.initializers.zeros
    if name == "xavier_uniform":
        return _xavier_uniform(gain if gain else 1.0)
    if name == "glo_orthogonal":
        return _glorot_orthogonal(2.0)
    if name == "he_orthogonal":
        return _he_orthogonal
    raise ValueError(f"Unknown initialization {name!r}")


class Dense(fnn.Module):
    """Linear -> optional LayerNorm -> optional activation.

    ``norm`` in {'', 'layer'}; batch/instance norms from the reference
    are intentionally not carried over (never used by any config).
    """

    features: int
    use_bias: bool = True
    activation: Optional[Callable] = None
    weight_init: Any = "xavier_uniform"
    bias_init: Any = "zeros"
    norm: str = ""
    gain: Optional[float] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = fnn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=get_weight_init(self.weight_init, self.gain),
            bias_init=get_weight_init(self.bias_init),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear",
        )(x)
        if self.norm == "layer":
            # torch LayerNorm eps for parity
            y = fnn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm")(y)
        elif self.norm:
            raise ValueError(f"Unsupported norm {self.norm!r}")
        if self.activation is not None:
            y = self.activation(y)
        return y


class MLP(fnn.Module):
    """Stack of Dense layers over an explicit dim list.

    Hidden layers get ``activation`` and ``norm``; the final layer gets
    ``last_activation`` and no norm (reference MLP, layers.py:533-581).
    """

    hidden_dims: Sequence[int]  # [in, ..., out]; `in` is inferred, kept for doc
    use_bias: bool = True
    activation: Optional[Callable] = None
    last_activation: Optional[Callable] = None
    weight_init: Any = "xavier_uniform"
    bias_init: Any = "zeros"
    norm: str = ""
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = list(self.hidden_dims)
        for i, d in enumerate(dims[1:-1]):
            x = Dense(d, self.use_bias, self.activation, self.weight_init,
                      self.bias_init, self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype, name=f"layers_{i}")(x)
        x = Dense(dims[-1], self.use_bias, self.last_activation,
                  self.weight_init, self.bias_init, "", dtype=self.dtype,
                  param_dtype=self.param_dtype,
                  name=f"layers_{len(dims) - 2}")(x)
        return x
