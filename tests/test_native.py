"""Native (C++) cell-list neighbor builder vs the NumPy oracle."""

import subprocess

import numpy as np
import pytest

from gotennet_tpu.graph.native import (
    build_edges,
    build_edges_native,
    native_available,
)
from gotennet_tpu.graph.neighborlist import build_edges_np


def _ensure_built():
    if not native_available():
        subprocess.run(["make", "-C", "native"], check=True)


@pytest.mark.parametrize("n,seed", [(10, 0), (50, 1), (200, 2), (500, 3)])
def test_native_matches_numpy(n, seed):
    _ensure_built()
    if not native_available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(seed)
    # scale spread with n so neighbor counts stay molecular
    pos = rng.standard_normal((n, 3)).astype(np.float32) * (n / 12.0) ** (1 / 3) * 2.0
    for loop in (True, False):
        s_np, d_np = build_edges_np(pos, 5.0, loop=loop, max_num_neighbors=32)
        s_c, d_c = build_edges_native(pos, 5.0, loop=loop,
                                      max_num_neighbors=32)
        pairs_np = sorted(zip(d_np.tolist(), s_np.tolist()))
        pairs_c = sorted(zip(d_c.tolist(), s_c.tolist()))
        assert pairs_np == pairs_c
        assert (d_c == np.sort(d_c)).all()


def test_cap_keeps_nearest():
    _ensure_built()
    if not native_available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(4)
    pos = rng.standard_normal((40, 3)).astype(np.float32) * 0.8  # dense blob
    s, d = build_edges_native(pos, 5.0, loop=False, max_num_neighbors=5)
    s2, d2 = build_edges_np(pos, 5.0, loop=False, max_num_neighbors=5)
    # same degree everywhere and identical nearest-k selections
    assert sorted(zip(d.tolist(), s.tolist())) == sorted(
        zip(d2.tolist(), s2.tolist()))


def test_dispatch_wrapper():
    rng = np.random.default_rng(5)
    pos = rng.standard_normal((20, 3)).astype(np.float32) * 2
    s, d = build_edges(pos, 5.0)
    s2, d2 = build_edges_np(pos, 5.0)
    assert sorted(zip(d.tolist(), s.tolist())) == sorted(
        zip(d2.tolist(), s2.tolist()))
