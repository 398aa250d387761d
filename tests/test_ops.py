"""Cutoffs, RBFs, activations vs closed forms (reference constants)."""

import math

import jax.numpy as jnp
import numpy as np

from gotennet_tpu.ops.activations import get_activation, shifted_softplus
from gotennet_tpu.ops.cutoffs import cosine_cutoff, polynomial_cutoff
from gotennet_tpu.ops.rbf import (
    BesselBasisParams,
    ExpNormalParams,
    GaussianRBFParams,
    bessel_basis,
    expnormal_smearing,
    gaussian_rbf,
)


def test_cosine_cutoff():
    r = jnp.asarray([0.0, 2.5, 4.999, 5.0, 7.0])
    got = np.asarray(cosine_cutoff(r, 5.0))
    exp = 0.5 * (np.cos(np.asarray(r) * np.pi / 5.0) + 1.0)
    exp[np.asarray(r) >= 5.0] = 0.0
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-7)
    assert got[0] == 1.0 and got[3] == 0.0 and got[4] == 0.0


def test_polynomial_cutoff():
    r = np.linspace(0, 6, 50, dtype=np.float32)
    got = np.asarray(polynomial_cutoff(jnp.asarray(r), 5.0, p=6))
    x = r / 5.0
    exp = (1 - 28 * x**6 + 48 * x**7 - 21 * x**8) * (x < 1)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
    assert abs(got[0] - 1.0) < 1e-6


def test_expnormal_reference_constants():
    """Initial means/betas match the reference's ExpNormalSmearing
    (_initial_params, layers.py:733-737) and the forward value agrees
    with the closed form."""
    p = ExpNormalParams.init(n_rbf=8, cutoff=5.0)
    start = math.exp(-5.0)
    np.testing.assert_allclose(np.asarray(p.means),
                               np.linspace(start, 1.0, 8), rtol=1e-6)
    beta = (2.0 / 8 * (1 - start)) ** -2
    np.testing.assert_allclose(np.asarray(p.betas), beta, rtol=1e-6)
    assert p.alpha == 1.0  # 5/cutoff

    r = np.asarray([0.0, 1.7, 4.2], np.float32)
    got = np.asarray(expnormal_smearing(jnp.asarray(r), p))
    env = 0.5 * (np.cos(r * np.pi / 5.0) + 1.0) * (r < 5.0)
    exp = env[:, None] * np.exp(
        -beta * (np.exp(-r)[:, None] - np.asarray(p.means)) ** 2)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_gaussian_and_bessel():
    g = GaussianRBFParams.init(16, 5.0)
    r = np.asarray([0.3, 2.2], np.float32)
    got = np.asarray(gaussian_rbf(jnp.asarray(r), g))
    width = 5.0 / 15
    exp = np.exp(-0.5 * (r[:, None] - np.asarray(g.offsets)) ** 2 / width**2)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-7)

    b = BesselBasisParams.init(4, 5.0)
    got = np.asarray(bessel_basis(jnp.asarray([0.0, 1.0], jnp.float32), b))
    n = np.arange(1, 5) * np.pi / 5.0
    np.testing.assert_allclose(got[1], np.sin(n) / 1.0, rtol=1e-5)
    # r=0 limit: sin(0)/1 = 0 (denominator clamped to 1)
    np.testing.assert_allclose(got[0], 0.0, atol=1e-7)


def test_activation_registry():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    ssp = get_activation("ssp")
    np.testing.assert_allclose(np.asarray(ssp(jnp.zeros(1))), 0.0, atol=1e-7)
    assert get_activation("SiLU") is not None
    sw = get_activation("swish")
    np.testing.assert_allclose(
        np.asarray(sw(x)), np.asarray(x) / (1 + np.exp(-np.asarray(x))),
        rtol=1e-6)
    assert get_activation(None) is None and get_activation("") is None
    # 'softplus' maps to the *shifted* variant like the reference registry
    assert get_activation("softplus") is shifted_softplus


def test_neighborlist_basic():
    from gotennet_tpu.graph.neighborlist import build_edges_np
    pos = np.asarray([[0, 0, 0], [1.0, 0, 0], [10.0, 0, 0]], np.float32)
    src, dst = build_edges_np(pos, cutoff=5.0, loop=True)
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (1, 0) in pairs and (0, 1) in pairs
    assert (2, 0) not in pairs and (0, 2) not in pairs
    assert (0, 0) in pairs and (2, 2) in pairs  # self-loops
    assert (dst == np.sort(dst)).all()
