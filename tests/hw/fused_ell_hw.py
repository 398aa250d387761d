"""Hardware check for the fused ELL-GATA Pallas kernel.

Runs the compiled (non-interpret) kernel on the default JAX platform —
intended to be the real TPU — and asserts forward + analytic VJP match
the jnp oracle.  Exits 0 and prints ``FUSED_ELL_HW_OK`` on success.

Run manually on a TPU host:

    python tests/hw/fused_ell_hw.py

or through the gated pytest wrapper (``GOTENNET_TPU_TESTS=1 pytest
tests/test_fused_ell.py``), which invokes this script in a subprocess
so the suite's CPU-platform pin does not apply.
"""

import os
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", file=sys.stderr)
    if dev.platform != "tpu":
        print("FUSED_ELL_HW_SKIP: no TPU device", file=sys.stderr)
        return 3

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_fused_ell import _jnp_oracle, _random_inputs

    from gotennet_tpu.ops.pallas.fused_ell import (
        fused_ell_message,
        make_fused_ell,
    )

    lmax, H = 2, 4
    for sep_dir, sep_tensor in [(True, True), (False, False)]:
        inputs = _random_inputs(0, N=48, K=8, D=32, H=H, lmax=lmax,
                                sep_dir=sep_dir, sep_tensor=sep_tensor)
        d_h, dX, _ = fused_ell_message(
            *inputs, lmax=lmax, num_heads=H, sep_dir=sep_dir,
            sep_tensor=sep_tensor, interpret=False)
        e_dh, e_dX = _jnp_oracle(*[jnp.asarray(x) for x in inputs],
                                 lmax, H, sep_dir, sep_tensor)
        # TPU exp/logistic are hardware approximations; K-sums amplify
        # the error on near-zero outputs (interpret mode pins 2e-4)
        np.testing.assert_allclose(np.asarray(d_h), np.asarray(e_dh),
                                   rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(e_dX),
                                   rtol=2e-2, atol=2e-3)
    print("compiled forward ok", file=sys.stderr)

    # compiled backward: analytic Pallas VJP vs jax.grad of the oracle
    sep_dir = sep_tensor = True
    N, K, D = 48, 8, 32
    L = (lmax + 1) ** 2 - 1
    inputs = tuple(jnp.asarray(a) for a in _random_inputs(
        1, N=N, K=K, D=D, H=H, lmax=lmax, sep_dir=sep_dir,
        sep_tensor=sep_tensor))
    rng = np.random.default_rng(7)
    cdh = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((N, L, D)).astype(np.float32))
    fused = make_fused_ell(lmax, H, sep_dir, sep_tensor, interpret=False)

    def loss(fn):
        def f(*a):
            d_h, dX = fn(*a)
            return jnp.sum(d_h * cdh) + jnp.sum(dX * cdX)
        return f

    oracle_fn = lambda *a: _jnp_oracle(  # noqa: E731
        *a, lmax, H, sep_dir, sep_tensor)
    argn = tuple(i for i in range(len(inputs)) if i != 9)  # skip nbr
    g_f = jax.jit(jax.grad(loss(fused), argnums=argn))(*inputs)
    g_o = jax.jit(jax.grad(loss(oracle_fn), argnums=argn))(*inputs)
    names = ["t", "q", "k", "xg", "v", "rl", "X", "env", "scale",
             "W_re", "b_re", "W_rs", "b_rs"]
    for name, a, b in zip(names, g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-2,
            err_msg=f"compiled grad mismatch for {name}")
    print("compiled backward ok", file=sys.stderr)

    # production-scale grid: N=640, K=36 (the 600-700-atom mode's
    # shapes at reduced D) — forward only, multi-block accumulation
    inputs = _random_inputs(3, N=640, K=36, D=64, H=H, lmax=lmax,
                            sep_dir=True, sep_tensor=True)
    d_h, dX, _ = fused_ell_message(
        *inputs, lmax=lmax, num_heads=H, sep_dir=True, sep_tensor=True,
        interpret=False)
    e_dh, e_dX = _jnp_oracle(*[jnp.asarray(x) for x in inputs],
                             lmax, H, True, True)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(e_dh),
                               rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(e_dX),
                               rtol=2e-2, atol=3e-2)
    print("N=640 multi-block forward ok", file=sys.stderr)

    # row-sharded slice (multi-chip path): pair rows [16, 40) against
    # the full 48-row tables — compiled forward vs oracle
    full = tuple(jnp.asarray(a) for a in _random_inputs(
        5, N=48, K=8, D=32, H=H, lmax=lmax, sep_dir=True,
        sep_tensor=True))
    row_args = {0, 1, 5, 7, 8, 9}  # t, q, rl, env, scale, nbr
    sliced = tuple(a[16:40] if i in row_args else a
                   for i, a in enumerate(full))
    d_h, dX, _ = fused_ell_message(
        *sliced, lmax=lmax, num_heads=H, sep_dir=True, sep_tensor=True,
        interpret=False)
    e_dh, e_dX = _jnp_oracle(*sliced, lmax, H, True, True)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(e_dh),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(e_dX),
                               rtol=2e-2, atol=2e-3)
    print("row-sharded slice forward ok", file=sys.stderr)

    print("FUSED_ELL_HW_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
