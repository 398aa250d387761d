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
        # the error on near-zero outputs (interpret mode pins 2e-4;
        # atol covers the worst single element observed across libtpu
        # revisions, ~4.5e-3)
        np.testing.assert_allclose(np.asarray(d_h), np.asarray(e_dh),
                                   rtol=2e-2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(dX), np.asarray(e_dX),
                                   rtol=2e-2, atol=5e-3)
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
    # shapes at reduced D) — forward only, multi-block accumulation.
    # The resident node tables need the scoped-vmem limit raised, as
    # in production (bench.py / Trainer._jit).
    import functools

    inputs = _random_inputs(3, N=640, K=36, D=64, H=H, lmax=lmax,
                            sep_dir=True, sep_tensor=True)
    big_fwd = functools.partial(
        fused_ell_message, lmax=lmax, num_heads=H, sep_dir=True,
        sep_tensor=True, interpret=False)
    d_h, dX, _ = jax.jit(
        big_fwd,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"},
    )(*inputs)
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

    # fused HTR-ELL kernel: compiled forward + analytic VJP vs a jnp
    # oracle of the expanded-rejection edge update
    from gotennet_tpu.ops.pallas.fused_htr import make_fused_htr_ell

    def htr_oracle(t, eq, ek, rl, nbr, W_g, b_g, *, lmax, sep_htr,
                   rej, gate):
        from gotennet_tpu.ops.spherical import degree_slices
        z = jnp.einsum("nkd,de->nke", t, W_g) + b_g
        gt = z * jax.nn.sigmoid(z)
        ekj = ek[nbr]                        # [N, K, L, C]
        L = rl.shape[-1]
        slices = degree_slices(lmax) if sep_htr else ((0, L),)
        w = 0.0
        for lo, hi in slices:
            S = jnp.sum(eq[:, None, lo:hi] * ekj[:, :, lo:hi], axis=2)
            if rej:
                pq = jnp.sum(eq[:, None, lo:hi]
                             * rl[:, :, lo:hi, None], axis=2)
                pk = jnp.sum(ekj[:, :, lo:hi]
                             * rl[:, :, lo:hi, None], axis=2)
                r2 = jnp.sum(rl[:, :, lo:hi] ** 2, axis=-1,
                             keepdims=True)
                w = w + S - pq * pk * (2.0 - r2)
            else:
                w = w + S
        gates = {"": lambda x: x, "gated": jax.nn.sigmoid,
                 "gatedt": jnp.tanh, "act": jax.nn.silu}
        return t + gt * gates[gate](w)

    N, K, D = 48, 8, 32
    L = (lmax + 1) ** 2 - 1
    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.standard_normal((N, K, D)).astype(np.float32))
    eq = jnp.asarray(
        rng.standard_normal((N, L, D)).astype(np.float32) * 0.5)
    ek = jnp.asarray(
        rng.standard_normal((N, L, D)).astype(np.float32) * 0.5)
    rl = jnp.asarray(
        rng.standard_normal((N, K, L)).astype(np.float32) * 0.5)
    nbr = jnp.asarray(rng.integers(0, N, (N, K)).astype(np.int32))
    W_g = jnp.asarray(
        rng.standard_normal((D, D)).astype(np.float32) * 0.2)
    b_g = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((N, K, D)).astype(np.float32))
    for rej, gate in [(True, "gated"), (False, "gatedt")]:
        okw = dict(lmax=lmax, sep_htr=True, rej=rej, gate=gate)
        fn = make_fused_htr_ell(lmax, True, rej, gate, interpret=False)
        out = fn(t, eq, ek, rl, nbr, W_g, b_g)
        exp = htr_oracle(t, eq, ek, rl, nbr, W_g, b_g, **okw)
        # silu(z)*gate(w) chains two hardware-approximated logistics;
        # interpret mode pins the exact math (test_ell.py)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=5e-2, atol=2e-2)

        def hloss(f):
            def g(t, eq, ek, rl, W_g, b_g):
                return jnp.sum(f(t, eq, ek, rl, nbr, W_g, b_g) * cot)
            return g

        argn = (0, 1, 2, 3, 4, 5)
        g_f = jax.jit(jax.grad(hloss(fn), argnums=argn))(
            t, eq, ek, rl, W_g, b_g)
        g_o = jax.jit(jax.grad(
            hloss(lambda *a: htr_oracle(*a, **okw)),
            argnums=argn))(t, eq, ek, rl, W_g, b_g)
        for name, a, b in zip(["t", "eq", "ek", "rl", "W_g", "b_g"],
                              g_f, g_o):
            # weight grads accumulate over every pair, amplifying the
            # hardware-logistic approximation error (values O(10));
            # interpret mode gradchecks these exactly (test_ell.py)
            atol = 5e-2 if name in ("W_g", "b_g") else 1e-2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=atol,
                err_msg=f"HTR compiled grad mismatch for {name}"
                        f" (rej={rej}, gate={gate})")
    print("fused HTR-ELL compiled fwd+bwd ok", file=sys.stderr)

    print("FUSED_ELL_HW_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
