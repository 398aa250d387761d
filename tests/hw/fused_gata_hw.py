"""Hardware check for the fused dense-GATA Pallas kernel.

Runs fused_gata_message in COMPILED (non-interpret) mode on the default
JAX platform — intended to be the real TPU — and asserts the outputs
match the plain-NumPy oracle.  Exits 0 and prints ``FUSED_GATA_HW_OK``
on success.

Run manually on a TPU host:

    python tests/hw/fused_gata_hw.py

or through the gated pytest wrapper (``GOTENNET_TPU_TESTS=1 pytest
tests/test_fused_gata.py``), which invokes this script in a subprocess
so the suite's CPU-platform pin does not apply.

Why a subprocess: tests/conftest.py pins jax_platforms='cpu' for the
whole pytest process (the relay TPU costs ~1s/eager-op, see conftest),
and a JAX backend choice cannot be changed once initialized.
"""

import os
import sys

import numpy as np


def main() -> int:
    import jax

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", file=sys.stderr)
    if dev.platform != "tpu":
        print("FUSED_GATA_HW_SKIP: no TPU device", file=sys.stderr)
        return 3

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_fused_gata import _oracle, _random_inputs

    lmax, H = 2, 4
    for sep_dir, sep_tensor in [(True, True), (False, False)]:
        inputs = _random_inputs(seed=0, G=2, M=8, D=32, H=H, lmax=lmax,
                                sep_dir=sep_dir, sep_tensor=sep_tensor)
        from gotennet_tpu.ops.pallas.fused_gata import fused_gata_message
        d_h, dX, attn = fused_gata_message(
            *inputs, lmax=lmax, num_heads=H, sep_dir=sep_dir,
            sep_tensor=sep_tensor, interpret=False)
        e_dh, e_dX, e_attn = _oracle(*[np.asarray(x) for x in inputs],
                                     lmax, H, sep_dir, sep_tensor)
        # looser than the interpret-mode test: TPU exp/logistic are
        # hardware approximations (~1e-3 rel on softmax weights; j-sums
        # of attention-weighted values see that error amplified by
        # cancellation on near-zero outputs)
        np.testing.assert_allclose(np.asarray(attn), e_attn,
                                   rtol=5e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(d_h), e_dh,
                                   rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dX), e_dX,
                                   rtol=2e-2, atol=2e-3)

    # compiled backward: analytic Pallas VJP vs jax.grad of the jnp
    # oracle, both running on the chip
    import jax.numpy as jnp
    from test_fused_gata import _jnp_oracle
    from gotennet_tpu.ops.pallas.fused_gata import make_fused_gata
    lmax, H, sep_dir, sep_tensor = 2, 4, True, True
    G, M, D = 2, 8, 32
    L = (lmax + 1) ** 2 - 1
    inputs = tuple(jnp.asarray(a) for a in _random_inputs(
        seed=1, G=G, M=M, D=D, H=H, lmax=lmax,
        sep_dir=sep_dir, sep_tensor=sep_tensor))
    rng = np.random.default_rng(7)
    cdh = jnp.asarray(rng.standard_normal((G, M, D)).astype(np.float32))
    cdX = jnp.asarray(rng.standard_normal((G, M, L, D)).astype(np.float32))
    fused = make_fused_gata(lmax, H, sep_dir, sep_tensor, interpret=False)

    def loss(fn):
        def f(*a):
            d_h, dX = fn(*a)
            return jnp.sum(d_h * cdh) + jnp.sum(dX * cdX)
        return f

    oracle_fn = lambda *a: _jnp_oracle(  # noqa: E731
        *a, lmax, H, sep_dir, sep_tensor)
    argn = tuple(range(len(inputs)))
    g_f = jax.jit(jax.grad(loss(fused), argnums=argn))(*inputs)
    g_o = jax.jit(jax.grad(loss(oracle_fn), argnums=argn))(*inputs)
    names = ["t", "q", "k", "xg", "v", "rl", "X", "env", "scale",
             "W_re", "b_re", "W_rs", "b_rs"]
    for name, a, b in zip(names, g_f, g_o):
        # atol 1e-2: TPU exp/logistic are hardware approximations and
        # Pallas vs XLA compile them differently; near-zero grads see
        # that error amplified (interpret mode pins the math at 2e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-2,
            err_msg=f"compiled grad mismatch for {name}")

    # i-tiled grid at MD22 scale (M=120 -> fwd TI=24, bwd TI=8):
    # compiled forward vs oracle (backward covered at M=32 shapes and
    # by the interpret-mode tiled gradcheck; a full M=120 bwd compile
    # adds ~2 min for no extra lowering coverage)
    lmax, H = 2, 4
    inputs = _random_inputs(seed=3, G=1, M=120, D=128, H=H, lmax=lmax,
                            sep_dir=True, sep_tensor=True)
    d_h, dX, attn = fused_gata_message(
        *inputs, lmax=lmax, num_heads=H, sep_dir=True, sep_tensor=True,
        interpret=False)
    e_dh, e_dX, e_attn = _oracle(*[np.asarray(x) for x in inputs],
                                 lmax, H, True, True)
    # atol 3e-2: j-sums of 120 O(1) terms amplify the hardware
    # exp/logistic approximation error on near-zero outputs (the
    # interpret-mode tiled gradcheck pins the math exactly)
    np.testing.assert_allclose(np.asarray(attn), e_attn, rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_h), e_dh, rtol=2e-2,
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(dX), e_dX, rtol=2e-2,
                               atol=3e-2)
    print("tiled M=120 forward ok", file=sys.stderr)

    # compiled HTR edge-update kernel: forward + backward vs oracle
    from test_fused_htr import _inputs as htr_inputs, _oracle as htr_oracle
    from gotennet_tpu.ops.pallas.fused_htr import make_fused_htr
    variant = dict(sep_htr=True, rej=True, gate="")
    hin = htr_inputs(0, 2, 8, 32, 2)
    htr = make_fused_htr(2, variant["sep_htr"], variant["rej"],
                         variant["gate"], interpret=False)
    out = htr(*hin)
    exp = htr_oracle(*hin, 2, **variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-2, atol=1e-2)
    cot = jnp.asarray(np.random.default_rng(9).standard_normal(
        out.shape).astype(np.float32))
    g_f = jax.jit(jax.grad(
        lambda *a: jnp.sum(htr(*a) * cot),
        argnums=tuple(range(6))))(*hin)
    g_o = jax.jit(jax.grad(
        lambda *a: jnp.sum(htr_oracle(*a, 2, **variant) * cot),
        argnums=tuple(range(6))))(*hin)
    for name, a, b in zip(["t", "eq", "ek", "rl", "W_g", "b_g"], g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-2,
            err_msg=f"compiled HTR grad mismatch for {name}")

    print("FUSED_GATA_HW_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
