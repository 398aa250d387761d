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
    print("FUSED_GATA_HW_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
