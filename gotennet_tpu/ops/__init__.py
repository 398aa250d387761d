"""Primitive compute ops: activations, cutoffs, radial bases, spherical
harmonics, steerable norms.

TPU-native equivalents of the reference primitive library
(/root/reference/gotennet/models/components/layers.py), implemented as
pure jnp functions so they fuse into surrounding XLA computations.
"""

from gotennet_tpu.ops.activations import get_activation, shifted_softplus, swish
from gotennet_tpu.ops.cutoffs import cosine_cutoff, polynomial_cutoff
from gotennet_tpu.ops.rbf import (
    BesselBasisParams,
    ExpNormalParams,
    GaussianRBFParams,
    bessel_basis,
    expnormal_smearing,
    gaussian_rbf,
    get_rbf,
)
from gotennet_tpu.ops.spherical import (
    degree_index_map,
    degree_slices,
    num_sh_components,
    spherical_harmonics,
)

__all__ = [
    "get_activation",
    "shifted_softplus",
    "swish",
    "cosine_cutoff",
    "polynomial_cutoff",
    "gaussian_rbf",
    "bessel_basis",
    "expnormal_smearing",
    "get_rbf",
    "GaussianRBFParams",
    "BesselBasisParams",
    "ExpNormalParams",
    "spherical_harmonics",
    "num_sh_components",
    "degree_slices",
    "degree_index_map",
]
