"""ctypes bindings for the native (C++) neighbor-list builder.

Loads ``native/libgoten_native.so`` (built with ``make -C native``) and
exposes ``build_edges_native`` with the same contract as the NumPy
``build_edges_np``.  Falls back transparently when the library isn't
built — callers use :func:`build_edges` which picks the fastest
available implementation.
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

__all__ = ["native_available", "build_edges_native", "build_edges"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (
        os.path.join(root, "native", "libgoten_native.so"),
        os.path.join(os.path.dirname(__file__), "libgoten_native.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.build_radius_graph.restype = ctypes.c_int64
            lib.build_radius_graph.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_edges_native(pos: np.ndarray, cutoff: float, loop: bool = True,
                       max_num_neighbors: int = 32
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Cell-list radius graph via the C++ library; same semantics as
    ``build_edges_np`` (nearest-k cap, dst-sorted, optional loops)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run `make -C native`")
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    cap = n * (max_num_neighbors + (1 if loop else 0)) + 8
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    e = lib.build_radius_graph(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(cutoff), max_num_neighbors, int(loop),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if e < 0:
        raise RuntimeError("native neighbor list capacity overflow")
    return src[:e].copy(), dst[:e].copy()


def build_edges(pos: np.ndarray, cutoff: float, loop: bool = True,
                max_num_neighbors: int = 32
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Fastest available radius-graph builder (native if built)."""
    if native_available():
        return build_edges_native(pos, cutoff, loop, max_num_neighbors)
    from gotennet_tpu.graph.neighborlist import build_edges_np
    return build_edges_np(pos, cutoff, loop, max_num_neighbors)
