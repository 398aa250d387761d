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


def test_trainable_rbf_params_and_converter_roundtrip():
    """trainable_rbf=True lifts the reference's trainable RBF buffers
    (expnorm means/betas, layers.py:714-726) into the parameter tree
    under 'radial_basis', with identical initial outputs, live
    gradients, and a torch state-dict round-trip."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gotennet_tpu.graph.dense_batch import collate_dense
    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.gotennet_dense import GotenNetDense
    from gotennet_tpu.utils.torch_convert import (
        params_to_state_dict,
        state_dict_to_params,
    )

    rng = np.random.default_rng(0)
    graphs = [dict(z=rng.integers(1, 10, size=6),
                   pos=rng.standard_normal((6, 3)) * 1.5)]
    db = collate_dense(graphs, 1, 8)
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1,
                         n_rbf=8, num_heads=4)
    cfg_t = dataclasses.replace(cfg, trainable_rbf=True)

    m0 = GotenNetDense(cfg)
    mt = GotenNetDense(cfg_t)
    p0 = m0.init(jax.random.PRNGKey(0), db)
    pt = mt.init(jax.random.PRNGKey(0), db)
    rb = pt["params"]["radial_basis"]
    assert set(rb) == {"means", "betas"}

    # same outputs at init (lifted params start at the constants)
    h0, X0 = m0.apply(p0, db)
    ht, Xt = mt.apply(pt, db)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(h0),
                               rtol=1e-6, atol=1e-6)

    # gradients flow into the lifted parameters
    g = jax.grad(lambda p: jnp.sum(mt.apply(p, db)[0] ** 2))(pt)
    assert float(np.abs(np.asarray(
        g["params"]["radial_basis"]["means"])).max()) > 0.0

    # converter round-trip carries radial_basis.means/betas
    sd = params_to_state_dict(pt["params"], cfg_t)
    assert "radial_basis.means" in sd and "radial_basis.betas" in sd
    back = state_dict_to_params(sd, cfg_t)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(pt["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # gaussian variant lifts offsets/widths; bessel refuses
    cfg_g = dataclasses.replace(cfg_t, radial_basis="GaussianRBF")
    pg = GotenNetDense(cfg_g).init(jax.random.PRNGKey(0), db)
    assert set(pg["params"]["radial_basis"]) == {"offsets", "widths"}
    import pytest as _pytest
    cfg_b = dataclasses.replace(cfg_t, radial_basis="BesselBasis")
    with _pytest.raises(ValueError, match="no trainable parameters"):
        GotenNetDense(cfg_b).init(jax.random.PRNGKey(0), db)


def test_hub_download_fallback(monkeypatch, tmp_path):
    """download_with_fallback tries each URL (HEAD + download + verify)
    and falls through on failure like the reference's retry-over-URL
    loop (file.py:277-367)."""
    import types

    from gotennet_tpu.utils import hub

    calls = []

    class _Resp:
        def __init__(self, ok=True):
            self.ok = ok

        def raise_for_status(self):
            if not self.ok:
                raise IOError("HTTP 404")

    def fake_head(url, **kw):
        calls.append(("head", url))
        return _Resp(ok="good" in url)

    def fake_download(url, dest, timeout=60):
        calls.append(("get", url))
        if "empty" in url:
            open(dest, "wb").close()
            return dest
        with open(dest, "wb") as f:
            f.write(b"ckpt-bytes")
        return dest

    monkeypatch.setattr(hub, "download_file", fake_download)
    monkeypatch.setitem(
        __import__("sys").modules, "requests",
        types.SimpleNamespace(head=fake_head))

    dest = str(tmp_path / "m.ckpt")
    out = hub.download_with_fallback(
        ["https://a.test/bad/m.ckpt",        # HEAD fails
         "https://b.test/good/empty/m.ckpt",  # downloads empty -> cleanup
         "https://c.test/good/m.ckpt"], dest)
    assert out == dest and open(dest, "rb").read() == b"ckpt-bytes"
    assert [c for c in calls if c[0] == "get"] == [
        ("get", "https://b.test/good/empty/m.ckpt"),
        ("get", "https://c.test/good/m.ckpt")]

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="all 1 source"):
        hub.download_with_fallback(["https://a.test/bad/m.ckpt"],
                                   str(tmp_path / "n.ckpt"))


def test_dipole_predict_magnitude_plumbed():
    """HeadConfig.predict_magnitude reaches the Dipole head (reference
    outputs.py:418-446): vector mode returns [G, 3]."""
    import jax

    from gotennet_tpu.graph.dense_batch import collate_dense
    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.model import GotenModel, HeadConfig

    rng = np.random.default_rng(0)
    graphs = [dict(z=rng.integers(1, 10, size=6),
                   pos=rng.standard_normal((6, 3)))]
    db = collate_dense(graphs, 2, 8)
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=1, lmax=1,
                         n_rbf=8, num_heads=4)
    mags, vecs = {}, {}
    for flag in (True, False):
        model = GotenModel(cfg, HeadConfig(kind="dipole",
                                           predict_magnitude=flag),
                           layout="dense")
        params = model.init(jax.random.PRNGKey(0), db)
        out = model.apply(params, db)
        (mags if flag else vecs)["p"] = np.asarray(out["property"])
    assert mags["p"].shape == (2, 1)
    assert vecs["p"].shape == (2, 3)
    np.testing.assert_allclose(
        np.linalg.norm(vecs["p"], axis=1, keepdims=True)[0], mags["p"][0],
        rtol=1e-5)
