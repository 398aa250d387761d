"""Masked segment reductions and segment softmax.

TPU-native replacements for ``torch_scatter.scatter`` and
``torch_geometric.utils.softmax`` (reference call sites:
/root/reference/gotennet/models/representation/gotennet.py:503,638-639,
986).  All functions take explicit masks so fixed-capacity padded edge
lists produce exact zeros for dead slots, and accept
``indices_are_sorted`` because the batcher emits edges sorted by
destination node (enables XLA's fast sorted-segment path).

Edge partitioning (graph-parallel scaling over a device mesh): every
function takes an optional ``psum_axis``.  Inside ``shard_map`` with
edges sharded along that mesh axis and node features replicated, each
device reduces its local edge shard into the full node range and the
partial results are combined with a single XLA collective (psum/pmax)
over ICI — the graph-world analog of sequence parallelism.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["segment_sum", "segment_mean", "segment_max", "segment_softmax"]

# Matches PyG softmax's denominator guard (torch_geometric/utils/softmax.py).
_SOFTMAX_EPS = 1e-16


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask
    while m.ndim < data.ndim:
        m = m[..., None]
    return jnp.where(m, data, jnp.zeros_like(data))


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    psum_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``."""
    data = _apply_mask(data, mask)
    out = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    return out


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    psum_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Mean-reduce rows per segment; empty segments yield zeros."""
    total = segment_sum(data, segment_ids, num_segments, mask,
                        indices_are_sorted, psum_axis)
    if mask is None:
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
    else:
        ones = mask.astype(data.dtype)
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if psum_axis is not None:
        counts = jax.lax.psum(counts, psum_axis)
    counts = jnp.maximum(counts, 1)
    while counts.ndim < total.ndim:
        counts = counts[..., None]
    return total / counts


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    neutral: Optional[float] = None,
    psum_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Max-reduce rows per segment; masked/empty slots give ``neutral``
    (default: most-negative finite value of the dtype)."""
    if neutral is None:
        neutral = jnp.finfo(data.dtype).min if jnp.issubdtype(
            data.dtype, jnp.floating) else jnp.iinfo(data.dtype).min
    if mask is not None:
        m = mask
        while m.ndim < data.ndim:
            m = m[..., None]
        data = jnp.where(m, data, jnp.full_like(data, neutral))
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if psum_axis is not None:
        out = jax.lax.pmax(out, psum_axis)
    return out


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    psum_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over variable-size segments.

    Equivalent to PyG's ``softmax(src, index)``: within every segment the
    entries are shifted by the segment max, exponentiated, and divided by
    the segment sum (+1e-16).  Masked entries come out exactly zero and
    do not influence real entries.

    ``logits`` may have trailing axes (e.g. ``[E, H, 1]`` for per-head
    attention); the reduction runs over axis 0 only.
    """
    # The max shift is for numerical stability only — softmax is
    # shift-invariant, so cut the whole max path out of the autodiff
    # graph (stop_gradient on the *input* keeps the tangent entering the
    # cross-device pmax symbolically zero; pmax has no JVP rule).
    seg_max = segment_max(jax.lax.stop_gradient(logits), segment_ids,
                          num_segments, mask, indices_are_sorted,
                          psum_axis=psum_axis)
    # Dead segments keep dtype-min; stop that from polluting exp below.
    seg_max = jnp.maximum(seg_max, jnp.finfo(logits.dtype).min / 2)
    shifted = logits - seg_max[segment_ids]
    # Zero masked entries BEFORE exp: in a fully-masked segment shifted
    # is ~ +dtype.max (logit - clamped dead-segment max), exp overflows
    # to inf, and although the mask zeroes it in the forward, the
    # backward multiplies the zero cotangent by exp(shifted) = inf ->
    # NaN gradients (hit by all-masked pad batches in accumulation).
    shifted = _apply_mask(shifted, mask)
    expd = jnp.exp(shifted)
    expd = _apply_mask(expd, mask)
    denom = segment_sum(expd, segment_ids, num_segments, None,
                        indices_are_sorted, psum_axis=psum_axis)
    return expd / (denom[segment_ids] + _SOFTMAX_EPS)
