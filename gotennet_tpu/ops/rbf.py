"""Radial basis expansions: Gaussian, Bessel, exponential-normal.

Functional equivalents of the reference RBF modules
(/root/reference/gotennet/models/components/layers.py:276-358, 703-746).
Each family ships an ``*Params`` NamedTuple holding the (optionally
trainable) parameters and an ``init`` constructor reproducing the
reference's initial values, so parameters can live either as constants
or inside a flax param tree.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gotennet_tpu.ops.cutoffs import cosine_cutoff

__all__ = [
    "GaussianRBFParams", "gaussian_rbf",
    "BesselBasisParams", "bessel_basis",
    "ExpNormalParams", "expnormal_smearing",
    "get_rbf",
    "RadialBasis",
]


class GaussianRBFParams(NamedTuple):
    offsets: jnp.ndarray  # [n_rbf]
    widths: jnp.ndarray   # [n_rbf]

    @staticmethod
    def init(n_rbf: int, cutoff: float, start: float = 0.0) -> "GaussianRBFParams":
        offsets = np.linspace(start, cutoff, n_rbf, dtype=np.float32)
        width = abs(offsets[1] - offsets[0]) if n_rbf > 1 else 1.0
        widths = np.full(n_rbf, width, np.float32)
        return GaussianRBFParams(jnp.asarray(offsets), jnp.asarray(widths))


def gaussian_rbf(r: jnp.ndarray, params: GaussianRBFParams) -> jnp.ndarray:
    """exp(-(r - mu_k)^2 / (2 w_k^2)); input [...], output [..., n_rbf]."""
    coeff = -0.5 / params.widths ** 2
    diff = r[..., None] - params.offsets
    return jnp.exp(coeff * diff ** 2)


class BesselBasisParams(NamedTuple):
    freqs: jnp.ndarray  # [n_rbf]

    @staticmethod
    def init(n_rbf: int, cutoff: float) -> "BesselBasisParams":
        freqs = np.arange(1, n_rbf + 1, dtype=np.float32) * math.pi / cutoff
        return BesselBasisParams(jnp.asarray(freqs))


def bessel_basis(r: jnp.ndarray, params: BesselBasisParams) -> jnp.ndarray:
    """sin(n pi r / rc) / r, with the 0-distance limit handled as in the
    reference (denominator 1 at r == 0)."""
    ax = r[..., None] * params.freqs
    denom = jnp.where(r == 0, jnp.ones_like(r), r)[..., None]
    return jnp.sin(ax) / denom


class ExpNormalParams(NamedTuple):
    means: jnp.ndarray   # [n_rbf]
    betas: jnp.ndarray   # [n_rbf]
    cutoff: float
    alpha: float

    @staticmethod
    def init(n_rbf: int, cutoff: float) -> "ExpNormalParams":
        start = math.exp(-cutoff)
        means = np.linspace(start, 1.0, n_rbf, dtype=np.float32)
        beta = (2.0 / n_rbf * (1.0 - start)) ** -2
        betas = np.full(n_rbf, beta, np.float32)
        return ExpNormalParams(
            jnp.asarray(means), jnp.asarray(betas), cutoff, 5.0 / cutoff)


def expnormal_smearing(r: jnp.ndarray, params: ExpNormalParams) -> jnp.ndarray:
    """PhysNet/TorchMD-Net exp-normal smearing with a cosine-cutoff
    envelope: cutoff(r) * exp(-beta * (exp(-alpha r) - mu)^2)."""
    env = cosine_cutoff(r, params.cutoff)[..., None]
    arg = jnp.exp(-params.alpha * r)[..., None] - params.means
    return env * jnp.exp(-params.betas * arg ** 2)


def get_rbf(name: str, n_rbf: int, cutoff: float):
    """Resolve an RBF family by the reference's names ('expnorm',
    'BesselBasis', 'GaussianRBF'); returns ``(params, fn)``."""
    key = name.lower().replace("-", "").replace("_", "").replace(" ", "")
    if key == "expnorm":
        return ExpNormalParams.init(n_rbf, cutoff), expnormal_smearing
    if key == "besselbasis":
        return BesselBasisParams.init(n_rbf, cutoff), bessel_basis
    if key == "gaussianrbf":
        return GaussianRBFParams.init(n_rbf, cutoff), gaussian_rbf
    raise ValueError(f"Unknown radial basis {name!r}")


class RadialBasis:
    """Flax-compatible RBF resolver: constants by default, learnable
    parameters with ``trainable=True`` (reference ``GaussianRBF`` /
    ``ExpNormalSmearing`` ``trainable`` flags, layers.py:307-322 and
    714-726: Gaussian lifts offsets+widths, exp-normal lifts
    means+betas; BesselBasis has no trainable parameters).

    Call from inside a flax ``@compact`` method as
    ``RadialBasis.make(self, cfg)`` — trainable parameters live under a
    ``radial_basis`` submodule scope so converted reference checkpoints
    (``representation.radial_basis.means`` etc.) map 1:1."""

    @staticmethod
    def make(module, name: str, n_rbf: int, cutoff: float,
             trainable: bool = False):
        import flax.linen as fnn

        params, fn = get_rbf(name, n_rbf, cutoff)
        if not trainable:
            return params, fn

        class _Lift(fnn.Module):
            @fnn.compact
            def __call__(self):
                if isinstance(params, GaussianRBFParams):
                    return GaussianRBFParams(
                        self.param("offsets", lambda k: params.offsets),
                        self.param("widths", lambda k: params.widths))
                if isinstance(params, ExpNormalParams):
                    return ExpNormalParams(
                        self.param("means", lambda k: params.means),
                        self.param("betas", lambda k: params.betas),
                        params.cutoff, params.alpha)
                raise ValueError(
                    f"radial basis {name!r} has no trainable parameters "
                    "(reference layers.py:328-358 keeps BesselBasis "
                    "frequencies as buffers)")

        return _Lift(name="radial_basis", parent=module)(), fn
