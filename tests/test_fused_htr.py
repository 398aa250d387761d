"""Fused HTR edge-update Pallas kernel vs differentiable jnp oracle
(interpret mode): forward values and gradients for all 6 inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gotennet_tpu.ops.pallas.fused_htr import make_fused_htr
from gotennet_tpu.ops.spherical import degree_slices


def _oracle(t, eq, ek, rl, W_g, b_g, lmax, sep_htr, rej, gate):
    """jnp mirror of GATADense's expanded-rejection edge update."""
    z = t @ W_g + b_g
    gt = z * jax.nn.sigmoid(z)
    L = rl.shape[-1]
    slices = degree_slices(lmax) if sep_htr else ((0, L),)
    w = 0.0
    for lo, hi in slices:
        S = pq = pk = 0.0
        for m in range(lo, hi):
            eqm = eq[:, :, None, m, :]      # [G, i, 1, C]
            ekm = ek[:, None, :, m, :]      # [G, 1, j, C]
            S = S + eqm * ekm
            if rej:
                rlm = rl[..., m:m + 1]
                pq = pq + eqm * rlm
                pk = pk + ekm * rlm
        if rej:
            r2 = jnp.sum(rl[..., lo:hi] ** 2, axis=-1)[..., None]
            w = w + S - pq * pk * (2.0 - r2)
        else:
            w = w + S
    if gate == "gated":
        w = jax.nn.sigmoid(w)
    elif gate == "gatedt":
        w = jnp.tanh(w)
    elif gate == "act":
        w = jax.nn.silu(w)
    return t + gt * w


def _inputs(seed, G, M, D, lmax):
    rng = np.random.default_rng(seed)
    L = (lmax + 1) ** 2 - 1

    def rand(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.4)

    return (rand(G, M, M, D), rand(G, M, L, D), rand(G, M, L, D),
            rand(G, M, M, L), rand(D, D), rand(D))


@pytest.mark.parametrize("variant,M", [
    (dict(sep_htr=True, rej=True, gate=""), 8),       # flagship
    (dict(sep_htr=False, rej=True, gate="gated"), 8),
    (dict(sep_htr=True, rej=False, gate="gatedt"), 8),
    (dict(sep_htr=False, rej=False, gate="act"), 8),
    # i-tiled grid: fwd TI=36, bwd TI=24
    (dict(sep_htr=True, rej=True, gate=""), 72),
])
def test_fused_htr_matches_oracle(variant, M):
    G, D, lmax = 2, 32, 2
    inputs = _inputs(0, G, M, D, lmax)
    fused = make_fused_htr(lmax, variant["sep_htr"], variant["rej"],
                           variant["gate"], interpret=True)
    out = fused(*inputs)
    exp = _oracle(*inputs, lmax, **variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-4, atol=2e-4)

    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    oracle_fn = lambda *a: _oracle(*a, lmax, **variant)  # noqa: E731
    argn = tuple(range(len(inputs)))
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    names = ["t", "eq", "ek", "rl", "W_g", "b_g"]
    for name, a, b in zip(names, g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}")
