"""Fused Pallas ELL-GATA kernel vs plain-jnp oracle (interpret mode).

The kernel's in-kernel one-hot gathers replace ``x[nbr]`` row lookups;
the oracle uses plain gathers, so agreement also validates the gather
algebra itself.  Hardware validation: GOTENNET_TPU_TESTS=1 runs
tests/hw/fused_ell_hw.py on the real chip.
"""

import math
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gotennet_tpu.ops.pallas.fused_ell import fused_ell_message, make_fused_ell
from gotennet_tpu.ops.spherical import degree_slices


def _jnp_oracle(t, q, k, xg, v, rl, X, env_signed, scale, nbr, W_re,
                b_re, W_rs, b_rs, lmax, H, sep_dir, sep_tensor):
    """Differentiable jnp mirror (plain x[nbr] gathers)."""
    N, K, D = t.shape
    mult = W_rs.shape[1] // D
    valid = env_signed >= 0
    env = jnp.maximum(env_signed, 0.0)
    ta = t @ W_re + b_re
    ta = ta * jax.nn.sigmoid(ta)
    tf = t @ W_rs + b_rs
    Dh = D // H
    k_j = k[nbr]
    logits = jnp.einsum("nhd,nkhd,nkhd->nkh",
                        q.reshape(N, H, Dh), k_j.reshape(N, K, H, Dh),
                        ta.reshape(N, K, H, Dh))
    logits = jnp.where(valid[..., None], logits, -1e30)
    mx = jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))
    ex = jnp.exp(logits - mx) * valid[..., None]
    attn = ex / (ex.sum(axis=1, keepdims=True) + 1e-16)
    attn = attn * (scale if scale.ndim == 3 else scale[..., None])
    e_per = (mult * D) // H
    attn_full = jnp.repeat(attn, e_per, axis=-1)
    o = tf * xg[nbr] * env[..., None] + attn_full * v[nbr]
    d_h = o[..., :D].sum(axis=1)
    off = D
    blocks = []
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_d = o[..., off + (l * D if sep_dir else 0):
                off + (l * D if sep_dir else 0) + D]
        blocks.append(jnp.einsum("nkm,nkd->nmd", rl[..., lo:hi], o_d))
    off += (lmax if sep_dir else 1) * D
    X_j = X[nbr]
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_t = o[..., off + (l * D if sep_tensor else 0):
                off + (l * D if sep_tensor else 0) + D]
        blocks[l] = blocks[l] + jnp.einsum("nkmd,nkd->nmd",
                                           X_j[:, :, lo:hi, :], o_t)
    return d_h, jnp.concatenate(blocks, axis=1)


def _random_inputs(seed, N, K, D, H, lmax, sep_dir, sep_tensor):
    """Random kernel inputs in argument order (shared with tests/hw)."""
    rng = np.random.default_rng(seed)
    L = (lmax + 1) ** 2 - 1
    mult = 3 + (lmax - 1 if sep_dir else 0) + (lmax - 1 if sep_tensor else 0)

    def rand(*s):
        return rng.standard_normal(s).astype(np.float32) * 0.3

    t = rand(N, K, D)
    q, k = rand(N, D), rand(N, D)
    xg, v = rand(N, mult * D), rand(N, mult * D)
    rl = rand(N, K, L)
    X = rand(N, L, D)
    valid = rng.random((N, K)) > 0.3
    valid[:, 0] = True  # every row keeps one real slot
    env = np.where(valid, rng.random((N, K)).astype(np.float32), -1.0)
    scale = np.full((N, K), 1.0 / math.sqrt(D), np.float32)
    nbr = rng.integers(0, N, (N, K)).astype(np.int32)
    W_re, b_re = rand(D, D), rand(D)
    W_rs, b_rs = rand(D, mult * D), rand(mult * D)
    return t, q, k, xg, v, rl, X, env, scale, nbr, W_re, b_re, W_rs, b_rs


@pytest.mark.parametrize("sep,max_pairs,lmax,H", [
    ((True, True), 4096, 2, 4),     # single-block grid
    ((False, False), 4096, 2, 4),
    ((True, True), 128, 2, 4),      # TB=16, NB=3: multi-block accumulators
    # config-grammar generality: higher degree + other head counts
    ((True, True), 4096, 3, 8),
    ((False, True), 4096, 3, 2),
])
def test_fused_ell_matches_oracle(sep, max_pairs, lmax, H):
    sep_dir, sep_tensor = sep
    N, K, D = 48, 8, 32
    inputs = _random_inputs(0, N, K, D, H, lmax, sep_dir, sep_tensor)

    d_h, dX, attn = jax.jit(
        lambda *a: fused_ell_message(
            *a, lmax=lmax, num_heads=H, sep_dir=sep_dir,
            sep_tensor=sep_tensor, interpret=True,
            max_pairs=max_pairs))(*inputs)

    e_dh, e_dX = _jnp_oracle(*[jnp.asarray(a) for a in inputs],
                             lmax, H, sep_dir, sep_tensor)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(e_dh),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(e_dX),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sep,max_pairs,lmax,H", [
    ((True, True), 4096, 2, 4),
    ((False, False), 4096, 2, 4),
    ((True, True), 256, 2, 4),      # bwd TB=16, NB=3
    ((True, True), 4096, 3, 8),     # higher degree + other head counts
])
def test_fused_ell_backward_matches_autodiff(sep, max_pairs, lmax, H):
    """Analytic Pallas VJP == jax.grad of the jnp oracle (all 13 float
    args; nbr is integer with a float0 cotangent)."""
    sep_dir, sep_tensor = sep
    N, K, D = 48, 8, 32
    inputs = tuple(jnp.asarray(a) for a in _random_inputs(
        1, N, K, D, H, lmax, sep_dir, sep_tensor))
    L = (lmax + 1) ** 2 - 1
    rng = np.random.default_rng(7)
    cdh = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((N, L, D)).astype(np.float32))

    fused = make_fused_ell(lmax, H, sep_dir, sep_tensor, interpret=True,
                           max_pairs=max_pairs)

    def loss(fn):
        def f(*a):
            d_h, dX = fn(*a)
            return jnp.sum(d_h * cdh) + jnp.sum(dX * cdX)
        return f

    oracle_fn = lambda *a: _jnp_oracle(  # noqa: E731
        *a, lmax, H, sep_dir, sep_tensor)
    f_out = fused(*inputs)
    o_out = oracle_fn(*inputs)
    np.testing.assert_allclose(np.asarray(f_out[0]), np.asarray(o_out[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_out[1]), np.asarray(o_out[1]),
                               rtol=2e-4, atol=2e-4)

    argn = tuple(i for i in range(len(inputs)) if i != 9)  # skip nbr
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    names = ["t", "q", "k", "xg", "v", "rl", "X", "env", "scale",
             "W_re", "b_re", "W_rs", "b_rs"]
    for name, a, b in zip(names, g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_ell_row_shard_slice():
    """Pair rows decoupled from the table size (multi-chip row
    sharding): the kernel on a destination-row slice against the FULL
    node tables == oracle, forward and VJP (incl. the table gradients,
    which carry only this slice's contributions)."""
    sep_dir = sep_tensor = True
    N, K, D, H, lmax = 48, 8, 32, 4, 2
    full = tuple(jnp.asarray(a) for a in _random_inputs(
        3, N, K, D, H, lmax, sep_dir, sep_tensor))
    lo, hi = 16, 40  # NR = 24: a middle row block, tables stay [48]
    row_args = {0, 5, 7, 8, 9}  # t, rl, env, scale, nbr
    inputs = tuple(a[lo:hi] if i in row_args or i == 1 else a
                   for i, a in enumerate(full))  # q (1) is row-keyed
    L = (lmax + 1) ** 2 - 1
    rng = np.random.default_rng(11)
    cdh = jnp.asarray(rng.standard_normal((hi - lo, D)).astype(np.float32))
    cdX = jnp.asarray(
        rng.standard_normal((hi - lo, L, D)).astype(np.float32))

    fused = make_fused_ell(lmax, H, sep_dir, sep_tensor, interpret=True,
                           max_pairs=128)  # TB=16: multi-block grid
    oracle_fn = lambda *a: _jnp_oracle(  # noqa: E731
        *a, lmax, H, sep_dir, sep_tensor)

    f_out = fused(*inputs)
    o_out = oracle_fn(*inputs)
    np.testing.assert_allclose(np.asarray(f_out[0]), np.asarray(o_out[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_out[1]), np.asarray(o_out[1]),
                               rtol=2e-4, atol=2e-4)

    def loss(fn):
        def f(*a):
            d_h, dX = fn(*a)
            return jnp.sum(d_h * cdh) + jnp.sum(dX * cdX)
        return f

    argn = tuple(i for i in range(len(inputs)) if i != 9)
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    names = ["t", "q", "k", "xg", "v", "rl", "X", "env", "scale",
             "W_re", "b_re", "W_rs", "b_rs"]
    for name, a, b in zip(names, g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name} (row-sharded)")


def test_fused_ell_per_head_scale():
    """Per-head [N, K, H] scale (attention-dropout folding): fwd + VJP
    vs oracle."""
    sep_dir = sep_tensor = True
    N, K, D, H, lmax = 24, 8, 32, 4, 2
    inputs = list(jnp.asarray(a) for a in _random_inputs(
        2, N, K, D, H, lmax, sep_dir, sep_tensor))
    rng = np.random.default_rng(11)
    keep = rng.random((N, K, H)) > 0.25
    base = np.asarray(inputs[8])[..., None]
    inputs[8] = jnp.asarray((base * keep / 0.75).astype(np.float32))
    inputs = tuple(inputs)
    L = (lmax + 1) ** 2 - 1
    cdh = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((N, L, D)).astype(np.float32))

    fused = make_fused_ell(lmax, H, sep_dir, sep_tensor, interpret=True)
    oracle_fn = lambda *a: _jnp_oracle(  # noqa: E731
        *a, lmax, H, sep_dir, sep_tensor)

    f_out = fused(*inputs)
    o_out = oracle_fn(*inputs)
    np.testing.assert_allclose(np.asarray(f_out[0]), np.asarray(o_out[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_out[1]), np.asarray(o_out[1]),
                               rtol=2e-4, atol=2e-4)

    def loss(fn):
        def f(*a):
            d_h, dX = fn(*a)
            return jnp.sum(d_h * cdh) + jnp.sum(dX * cdX)
        return f

    argn = tuple(i for i in range(len(inputs)) if i != 9)
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    for i, (a, b) in enumerate(zip(g_f, g_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4,
                                   err_msg=f"arg {i}")


@pytest.mark.hw
@pytest.mark.skipif(os.environ.get("GOTENNET_TPU_TESTS") != "1",
                    reason="hardware-gated (GOTENNET_TPU_TESTS=1)")
def test_fused_ell_on_tpu_hardware():
    """Compiled Mosaic kernel on the real chip (subprocess so the TPU
    platform is selected)."""
    script = os.path.join(os.path.dirname(__file__), "hw",
                          "fused_ell_hw.py")
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
