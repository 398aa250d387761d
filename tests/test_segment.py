"""Segment reductions and segment softmax vs dense numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from gotennet_tpu.graph.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def _random_segments(rng, n, num_segments):
    ids = np.sort(rng.integers(0, num_segments, size=n)).astype(np.int32)
    mask = rng.random(n) > 0.25
    data = rng.standard_normal((n, 4)).astype(np.float32)
    return data, ids, mask


@pytest.mark.parametrize("seed", [0, 1])
def test_segment_sum_mean_max(seed):
    rng = np.random.default_rng(seed)
    data, ids, mask = _random_segments(rng, 64, 10)

    got_sum = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 10,
                                     jnp.asarray(mask), True))
    got_mean = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 10,
                                       jnp.asarray(mask), True))
    got_max = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 10,
                                     jnp.asarray(mask), True))

    for s in range(10):
        sel = (ids == s) & mask
        exp_sum = data[sel].sum(0) if sel.any() else np.zeros(4)
        np.testing.assert_allclose(got_sum[s], exp_sum, rtol=1e-5, atol=1e-5)
        if sel.any():
            np.testing.assert_allclose(got_mean[s], data[sel].mean(0),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(got_max[s], data[sel].max(0),
                                       rtol=1e-6, atol=0)
        else:
            np.testing.assert_array_equal(got_mean[s], np.zeros(4))


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((40, 3, 1)).astype(np.float32) * 5
    ids = np.sort(rng.integers(0, 6, size=40)).astype(np.int32)
    mask = rng.random(40) > 0.3

    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 6,
                                     jnp.asarray(mask), True))
    # masked entries exactly zero
    np.testing.assert_array_equal(got[~mask], 0.0)
    # per-segment, per-head softmax over the real entries
    for s in range(6):
        sel = (ids == s) & mask
        if not sel.any():
            continue
        for h in range(3):
            x = logits[sel, h, 0]
            e = np.exp(x - x.max())
            np.testing.assert_allclose(got[sel, h, 0], e / e.sum(),
                                       rtol=1e-5, atol=1e-6)
    # sums to one per non-empty segment
    sums = np.zeros((6, 3))
    for s in range(6):
        sums[s] = got[(ids == s)].sum(0)[:, 0]
        if ((ids == s) & mask).any():
            np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)


def test_segment_softmax_huge_logits_stable():
    logits = jnp.asarray([[1e4], [1e4 + 2.0], [-1e4]], dtype=jnp.float32)
    ids = jnp.asarray([0, 0, 0], dtype=jnp.int32)
    got = np.asarray(segment_softmax(logits, ids, 1))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-5)


def test_segment_softmax_all_masked_grad_finite():
    """A fully-masked segment must give zero output AND finite (zero)
    gradients — the backward used to hit 0 * exp(+huge) = NaN, which
    poisoned gradient accumulation over all-masked pad batches."""
    import jax

    E, N, H = 6, 3, 2
    logits = jnp.zeros((E, H, 1))
    ids = jnp.zeros((E,), jnp.int32)
    mask = jnp.zeros((E,), bool)

    def f(l):
        return jnp.sum(segment_softmax(l, ids, N, mask,
                                       indices_are_sorted=True))

    assert float(f(logits)) == 0.0
    g = np.asarray(jax.grad(f)(logits))
    assert np.isfinite(g).all()
    np.testing.assert_array_equal(g, 0.0)
