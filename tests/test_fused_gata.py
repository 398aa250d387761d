"""Fused Pallas dense-GATA kernel vs plain-jnp oracle (interpret mode)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gotennet_tpu.ops.pallas.fused_gata import (fused_gata_message,
                                                make_fused_gata)
from gotennet_tpu.ops.spherical import degree_slices


def _oracle(t, q, k, xg, v, rl, X, env_signed, scale, W_re, b_re, W_rs,
            b_rs, lmax, H, sep_dir, sep_tensor):
    G, M, _, D = t.shape
    mult = W_rs.shape[1] // D
    valid = env_signed >= 0
    env = np.maximum(env_signed, 0.0)
    ta = t @ W_re + b_re
    ta = ta / (1 + np.exp(-ta)) * 1.0  # silu: x*sigmoid(x)
    ta = (t @ W_re + b_re)
    ta = ta * (1 / (1 + np.exp(-ta)))
    tf = t @ W_rs + b_rs
    Dh = D // H
    ta5 = ta.reshape(G, M, M, H, Dh)
    logits = np.einsum("gihd,gjhd,gijhd->gijh", q.reshape(G, M, H, Dh),
                       k.reshape(G, M, H, Dh), ta5)
    logits = np.where(valid[..., None], logits, -1e30)
    mx = logits.max(axis=2, keepdims=True)
    ex = np.exp(logits - mx) * valid[..., None]
    attn = ex / (ex.sum(axis=2, keepdims=True) + 1e-16)
    attn = attn * scale[..., None]
    e_per = (mult * D) // H
    head_of = np.arange(mult * D) // e_per
    attn_full = attn[..., head_of]
    o = (tf * xg[:, None, :, :] * env[..., None]
         + attn_full * v[:, None, :, :])
    d_h = o[..., :D].sum(axis=2)
    off = D
    blocks = []
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_d = o[..., off + (l * D if sep_dir else 0):
                off + (l * D if sep_dir else 0) + D]
        blocks.append(np.einsum("gijm,gijd->gimd", rl[..., lo:hi], o_d))
    off += (lmax if sep_dir else 1) * D
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_t = o[..., off + (l * D if sep_tensor else 0):
                off + (l * D if sep_tensor else 0) + D]
        blocks[l] = blocks[l] + np.einsum("gjmd,gijd->gimd",
                                          X[:, :, lo:hi, :], o_t)
    dX = np.concatenate(blocks, axis=2)
    return d_h, dX, attn


def _random_inputs(seed, G, M, D, H, lmax, sep_dir, sep_tensor):
    """Random kernel inputs in argument order (shared with tests/hw)."""
    rng = np.random.default_rng(seed)
    L = (lmax + 1) ** 2 - 1
    mult = 3 + (lmax - 1 if sep_dir else 0) + (lmax - 1 if sep_tensor else 0)

    def rand(*s):
        return rng.standard_normal(s).astype(np.float32) * 0.3

    t = rand(G, M, M, D)
    q, k = rand(G, M, D), rand(G, M, D)
    xg, v = rand(G, M, mult * D), rand(G, M, mult * D)
    rl = rand(G, M, M, L)
    X = rand(G, M, L, D)
    valid = rng.random((G, M, M)) > 0.3
    env = np.where(valid, rng.random((G, M, M)).astype(np.float32), -1.0)
    scale = np.full((G, M, M), 1.0 / math.sqrt(D), np.float32)
    W_re, b_re = rand(D, D), rand(D)
    W_rs, b_rs = rand(D, mult * D), rand(mult * D)
    return t, q, k, xg, v, rl, X, env, scale, W_re, b_re, W_rs, b_rs


@pytest.mark.parametrize("sep,M,lmax,H", [
    ((True, True), 8, 2, 4),
    ((False, False), 8, 2, 4),
    # M=72: 5184 pairs > the 4096-pair tile budget -> TI=36, NI=2,
    # exercising the i-tiled grid path (MD22-scale mechanics)
    ((True, True), 72, 2, 4),
    # config-grammar generality: higher degree + other head counts
    ((True, True), 8, 3, 8),
    ((True, False), 8, 3, 2),
])
def test_fused_matches_oracle(sep, M, lmax, H):
    sep_dir, sep_tensor = sep
    G, D = 2 if M > 8 else 3, 32
    inputs = _random_inputs(0, G, M, D, H, lmax, sep_dir, sep_tensor)

    d_h, dX, attn = jax.jit(
        lambda *a: fused_gata_message(
            *a, lmax=lmax, num_heads=H, sep_dir=sep_dir,
            sep_tensor=sep_tensor, interpret=True))(*inputs)

    e_dh, e_dX, e_attn = _oracle(*inputs, lmax, H, sep_dir, sep_tensor)
    np.testing.assert_allclose(np.asarray(attn), e_attn, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_h), e_dh, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dX), e_dX, rtol=2e-4, atol=2e-4)


def _jnp_oracle(t, q, k, xg, v, rl, X, env_signed, scale, W_re, b_re,
                W_rs, b_rs, lmax, H, sep_dir, sep_tensor):
    """Differentiable jnp mirror of _oracle returning (d_h, dX) only.

    jax.grad of this is the autodiff reference for the Pallas backward
    kernel's analytic VJP.
    """
    G, M, _, D = t.shape
    mult = W_rs.shape[1] // D
    valid = env_signed >= 0
    env = jnp.maximum(env_signed, 0.0)
    ta = t @ W_re + b_re
    ta = ta * jax.nn.sigmoid(ta)
    tf = t @ W_rs + b_rs
    Dh = D // H
    logits = jnp.einsum("gihd,gjhd,gijhd->gijh",
                        q.reshape(G, M, H, Dh), k.reshape(G, M, H, Dh),
                        ta.reshape(G, M, M, H, Dh))
    logits = jnp.where(valid[..., None], logits, -1e30)
    mx = jax.lax.stop_gradient(logits.max(axis=2, keepdims=True))
    ex = jnp.exp(logits - mx) * valid[..., None]
    attn = ex / (ex.sum(axis=2, keepdims=True) + 1e-16)
    attn = attn * (scale if scale.ndim == 4 else scale[..., None])
    e_per = (mult * D) // H
    attn_full = jnp.repeat(attn, e_per, axis=-1)
    o = (tf * xg[:, None, :, :] * env[..., None]
         + attn_full * v[:, None, :, :])
    d_h = o[..., :D].sum(axis=2)
    off = D
    blocks = []
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_d = o[..., off + (l * D if sep_dir else 0):
                off + (l * D if sep_dir else 0) + D]
        blocks.append(jnp.einsum("gijm,gijd->gimd", rl[..., lo:hi], o_d))
    off += (lmax if sep_dir else 1) * D
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_t = o[..., off + (l * D if sep_tensor else 0):
                off + (l * D if sep_tensor else 0) + D]
        blocks[l] = blocks[l] + jnp.einsum("gjmd,gijd->gimd",
                                           X[:, :, lo:hi, :], o_t)
    return d_h, jnp.concatenate(blocks, axis=2)


@pytest.mark.parametrize("sep,M,lmax,H", [
    ((True, True), 8, 2, 4),
    ((False, False), 8, 2, 4),
    ((True, True), 72, 2, 4),   # i-tiled grid (TI=36, NI=2)
    ((True, True), 8, 3, 8),    # higher degree + other head counts
])
def test_fused_backward_matches_autodiff(sep, M, lmax, H):
    """Analytic Pallas VJP == jax.grad of the jnp oracle (all 13 args)."""
    sep_dir, sep_tensor = sep
    G, D = 2, 32
    inputs = tuple(jnp.asarray(a) for a in _random_inputs(
        1, G, M, D, H, lmax, sep_dir, sep_tensor))
    L = (lmax + 1) ** 2 - 1
    rng = np.random.default_rng(7)
    cdh = jnp.asarray(rng.standard_normal((G, M, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((G, M, L, D)).astype(np.float32))

    fused = make_fused_gata(lmax, H, sep_dir, sep_tensor, interpret=True)

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

    argn = tuple(range(len(inputs)))
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    names = ["t", "q", "k", "xg", "v", "rl", "X", "env", "scale",
             "W_re", "b_re", "W_rs", "b_rs"]
    for name, a, b in zip(names, g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_backward_per_head_scale():
    """Per-head scale (attention-dropout folding): fwd + VJP vs oracle
    with a random [G, M, M, H] scale carrying a dropout-style mask."""
    sep_dir = sep_tensor = True
    G, M, D, H, lmax = 2, 8, 32, 4, 2
    inputs = list(jnp.asarray(a) for a in _random_inputs(
        2, G, M, D, H, lmax, sep_dir, sep_tensor))
    rng = np.random.default_rng(11)
    keep = rng.random((G, M, M, H)) > 0.25
    base = np.asarray(inputs[8])[..., None]          # [G, M, M, 1]
    inputs[8] = jnp.asarray(
        (base * keep / 0.75).astype(np.float32))     # [G, M, M, H]
    inputs = tuple(inputs)
    L = (lmax + 1) ** 2 - 1
    cdh = jnp.asarray(rng.standard_normal((G, M, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((G, M, L, D)).astype(np.float32))

    fused = make_fused_gata(lmax, H, sep_dir, sep_tensor, interpret=True)
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

    argn = tuple(range(len(inputs)))
    g_f = jax.grad(loss(fused), argnums=argn)(*inputs)
    g_o = jax.grad(loss(oracle_fn), argnums=argn)(*inputs)
    for i, (a, b) in enumerate(zip(g_f, g_o)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=f"grad mismatch for arg {i}")


@pytest.mark.hw
@pytest.mark.skipif(os.environ.get("GOTENNET_TPU_TESTS") != "1",
                    reason="hardware test; set GOTENNET_TPU_TESTS=1 on a "
                           "TPU host to run the compiled (non-interpret) "
                           "kernel")
def test_fused_on_tpu_hardware():
    """Compiled Mosaic kernel vs oracle on the real chip.

    Runs tests/hw/fused_gata_hw.py in a subprocess with the suite's
    CPU-platform pin removed so JAX picks up the TPU (a backend cannot
    be re-selected inside this process once initialized).
    """
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    script = os.path.join(os.path.dirname(__file__), "hw", "fused_gata_hw.py")
    proc = subprocess.run([sys.executable, script], env=env,
                          capture_output=True, text=True, timeout=1200,
                          cwd=os.path.dirname(os.path.dirname(script)))
    if proc.returncode == 3:
        pytest.skip("no TPU device visible to the subprocess")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FUSED_GATA_HW_OK" in proc.stdout
