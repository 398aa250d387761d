"""Spherical harmonics: closed-form, scipy-oracle, equivariance,
homogeneity and self-loop (zero-vector) behavior.

The oracle derives the reference convention independently: y-zenith real
SH built from scipy's associated Legendre functions, e3nn component
ordering m=-l..l, per-degree scale c_l = 1 (l<=2) / sqrt(2l+1) (l>=3).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import lpmv

from gotennet_tpu.ops.spherical import (
    degree_slices,
    num_sh_components,
    spherical_harmonics,
)


def _oracle(vec: np.ndarray, lmax: int) -> np.ndarray:
    """Independent scipy-based evaluation (unit vectors only)."""
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    phi = np.arctan2(x, z)  # azimuth from +z toward +x
    out = []
    for l in range(1, lmax + 1):
        c_l = 1.0 if l <= 2 else math.sqrt(2 * l + 1)
        for m in range(-l, l + 1):
            am = abs(m)
            # strip scipy's Condon-Shortley phase
            p = ((-1.0) ** am) * lpmv(am, l, y)
            if m == 0:
                comp = p
            else:
                n = math.sqrt(2.0 * math.factorial(l - am)
                              / math.factorial(l + am))
                trig = np.sin(am * phi) if m < 0 else np.cos(am * phi)
                comp = n * p * trig
            out.append(c_l * comp)
    return np.stack(out, axis=-1)


def _unit_vecs(rng, n):
    v = rng.standard_normal((n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float64)


def test_closed_form_low_degrees():
    rng = np.random.default_rng(0)
    v = _unit_vecs(rng, 50)
    sh = np.asarray(spherical_harmonics(jnp.asarray(v, jnp.float64), 2))
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    s3 = math.sqrt(3.0)
    expected = np.stack([
        x, y, z,
        s3 * x * z, s3 * x * y, y ** 2 - 0.5 * (x ** 2 + z ** 2),
        s3 * y * z, (s3 / 2.0) * (z ** 2 - x ** 2),
    ], axis=-1)
    np.testing.assert_allclose(sh, expected, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("lmax", [1, 2, 3, 4, 5, 6, 7, 8])
def test_scipy_oracle(lmax):
    rng = np.random.default_rng(lmax)
    v = _unit_vecs(rng, 64)
    sh = np.asarray(spherical_harmonics(jnp.asarray(v), lmax))
    exp = _oracle(v, lmax)
    assert sh.shape == (64, num_sh_components(lmax))
    np.testing.assert_allclose(sh, exp, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("lmax", [2, 4, 8])
def test_rotation_equivariance(lmax):
    """Degree blocks transform by an orthogonal matrix: pairwise inner
    products within each degree are rotation invariant."""
    rng = np.random.default_rng(42)
    v = _unit_vecs(rng, 32)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    sh = np.asarray(spherical_harmonics(jnp.asarray(v), lmax))
    sh_rot = np.asarray(spherical_harmonics(jnp.asarray(v @ q.T), lmax))
    for lo, hi in degree_slices(lmax):
        gram = sh[:, lo:hi] @ sh[:, lo:hi].T
        gram_rot = sh_rot[:, lo:hi] @ sh_rot[:, lo:hi].T
        np.testing.assert_allclose(gram_rot, gram, rtol=1e-4, atol=1e-4)


def test_homogeneity_and_zero_vector():
    rng = np.random.default_rng(3)
    v = _unit_vecs(rng, 8)
    lmax = 4
    sh1 = np.asarray(spherical_harmonics(jnp.asarray(v), lmax))
    sh2 = np.asarray(spherical_harmonics(jnp.asarray(2.0 * v), lmax))
    for l, (lo, hi) in zip(range(1, lmax + 1), degree_slices(lmax)):
        np.testing.assert_allclose(sh2[:, lo:hi], (2.0 ** l) * sh1[:, lo:hi],
                                   rtol=1e-5)
    # zero vector (self-loop edge) -> exactly zero, with finite gradients
    zero = jnp.zeros((1, 3))
    np.testing.assert_array_equal(
        np.asarray(spherical_harmonics(zero, lmax)), 0.0)
    g = jax.jacobian(lambda u: spherical_harmonics(u, lmax).sum())(zero)
    assert np.isfinite(np.asarray(g)).all()


def test_pole_values():
    """At the y-pole only m=0 components are non-zero, valued c_l."""
    pole = jnp.asarray([[0.0, 1.0, 0.0]])
    lmax = 8
    sh = np.asarray(spherical_harmonics(pole, lmax))[0]
    for l, (lo, hi) in zip(range(1, lmax + 1), degree_slices(lmax)):
        block = sh[lo:hi]
        c_l = 1.0 if l <= 2 else math.sqrt(2 * l + 1)
        center = lo + l - lo  # m=0 sits at index l within the block
        np.testing.assert_allclose(block[l], c_l, rtol=1e-5)
        block = np.delete(block, l)
        np.testing.assert_allclose(block, 0.0, atol=1e-6)
