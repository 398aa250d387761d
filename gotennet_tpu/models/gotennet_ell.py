"""GotenNet in ELL (padded-neighbor) layout: [N, K] neighbor rows.

Mathematically identical to the edge-list model (models/gotennet.py) —
same parameter tree, byte-for-byte interchangeable checkpoints — but
attention softmax is a plain masked softmax over each node's K neighbor
slots and every neighborhood reduction a dense sum over K: no sorts, no
scatters, no segment ops on the hot path (the only scatter left is one
[N*K] scalar count for ``scale_edge``).  Compared to the dense
``[G, M, M]`` layout the padding cost is O(N*K) instead of O(G*M^2),
which is the right trade for the 10^2-10^3 atom regime (MD22) where
degree is capped (reference ``max_num_neighbors=32``,
gotennet.py:1018) but molecules are far larger than the cap.

Semantics preserved from the reference (gotennet.py:751-1010): zero
self-loop distances/SH, NodeInit drops self-loops, per-destination
softmax over real edges only, last layer skips the edge update, X
starts at zero.  Supports the full config grammar including aggr
add/mean/max (unlike the dense layout).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from gotennet_tpu.graph.ell_batch import ELLBatch
from gotennet_tpu.graph.segment import segment_sum
from gotennet_tpu.models.gotennet import (
    EQFF,
    GotenNetConfig,
    _zero_padded_embed_init,
    parse_edge_updates,
)
from gotennet_tpu.nn.dense import MLP, Dense
from gotennet_tpu.nn.norms import TensorLayerNorm
from gotennet_tpu.ops.activations import get_activation
from gotennet_tpu.ops.cutoffs import cosine_cutoff
from gotennet_tpu.ops.rbf import RadialBasis, get_rbf
from gotennet_tpu.ops.spherical import (
    degree_index_map,
    degree_slices,
    spherical_harmonics,
)

__all__ = ["GotenNetELL"]

_NEG = -1e30
_SOFTMAX_EPS = 1e-16  # PyG softmax denominator guard, for path parity


def _window_gather_meta(nbr, window: int, block_rows: int,
                        n_table: "int | None" = None):
    """Precompute the windowed-gather operands (a pytree, so it can
    cross flax.remat boundaries as a call argument): per-block window
    starts and the [NB, TB*K, window] one-hot selector.

    The window bound is guaranteed by the collator: it computed
    ``window`` as the max over blocks of (max(nbr) - min(nbr) + 1)
    and this derives each block's start as min(nbr).  ``n_table`` is
    the source-table row count (defaults to the row count; they
    differ under row sharding, where ``nbr`` holds only this shard's
    rows but indexes the full node table)."""
    N, K = nbr.shape
    if n_table is None:
        n_table = N
    nb_blocks = N // block_rows
    nb = nbr.reshape(nb_blocks, block_rows * K)
    ws = jnp.clip(jnp.min(nb, axis=1), 0, max(n_table - window, 0))
    rel = nb - ws[:, None]
    onehot = rel[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (nb_blocks, block_rows * K, window), 2)
    return onehot, ws


def _gather_fn(nbr, gmeta, dtype):
    """Neighbor lookup ``gather(x [N, F...]) -> [N, K, F...]``.

    With ``gmeta=None``: plain row gather (``x[nbr]``).  With window
    metadata: block-banded one-hot matmuls — XLA lowers [N, K] row
    gathers catastrophically on TPU (the measured ELL-at-10^3-atoms
    regression, PERF.md), but with spatially-ordered nodes every
    neighbor index of a block lies in a bounded window, so each block
    reads one contiguous ``[window, F]`` slab (vmapped dynamic_slice —
    a handful of block copies) and selects rows with a one-hot matmul
    on the MXU.  The backward is the transposed matmul: scatter-free
    source-gradient aggregation.  Exact in float32 (one-hot
    selection); ``dtype=bf16`` rounds the gathered values like every
    other pair tensor."""
    if gmeta is None:
        def take(x, gdtype=None):
            return x[nbr]
        return take

    onehot, ws = gmeta
    N, K = nbr.shape
    window = onehot.shape[-1]

    def gather(x, gdtype=None):
        gd = dtype if gdtype is None else gdtype
        feat = x.shape[1:]
        xf = x.reshape(x.shape[0], -1)  # table rows >= N under sharding
        xw = jax.vmap(lambda s: jax.lax.dynamic_slice(
            xf, (s, 0), (window, xf.shape[1])))(ws)  # [NB, W, F]
        out = jax.lax.dot_general(
            onehot.astype(gd), xw.astype(gd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [NB, TB*K, F]
        if x.dtype != out.dtype:
            out = out.astype(x.dtype)
        return out.reshape(N, K, *feat)
    return gather


def _shard_rows(ax, n_total: int):
    """Row-sharding helpers for multi-chip ELL execution.

    Returns ``(rows, unshard, start, n_rows)``: ``rows(x)`` slices
    this device's contiguous destination-row block out of a
    replicated ``[N, ...]`` array; ``unshard(x_local)`` reassembles
    per-row results into the replicated full array by zero-padding
    and ``psum`` over ``ax`` (rows are disjoint across devices, so
    the sum is a concatenation — the ELL analog of the edge layout's
    psum-augmented segment reductions, graph/segment.py).  With
    ``ax=None`` both are identity (single-device semantics)."""
    if ax is None:
        return (lambda x: x), (lambda x: x), 0, n_total
    n_shards = jax.lax.psum(1, ax)
    n_rows = n_total // n_shards
    start = jax.lax.axis_index(ax) * n_rows

    def rows(x):
        return jax.lax.dynamic_slice_in_dim(x, start, n_rows, 0)

    def unshard(x_local):
        full = jnp.zeros((n_total,) + x_local.shape[1:], x_local.dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, x_local,
                                                   start, 0)
        return jax.lax.psum(full, ax)
    return rows, unshard, start, n_rows


def _aggr_k(aggr: str, data, mask):
    """Masked reduction over the K (axis=1) neighbor axis with the
    reference's empty-segment convention (zeros)."""
    m = mask
    while m.ndim < data.ndim:
        m = m[..., None]
    if aggr == "add":
        return jnp.sum(data * m, axis=1)
    if aggr == "mean":
        cnt = jnp.sum(m, axis=1)
        return jnp.sum(data * m, axis=1) / jnp.maximum(cnt, 1.0)
    if aggr == "max":
        neg = jnp.where(m > 0, data, _NEG)
        out = jnp.max(neg, axis=1)
        any_real = jnp.sum(m, axis=1) > 0
        return jnp.where(any_real, out, jnp.zeros_like(out))
    raise ValueError(f"Unknown aggr {aggr!r}")


def _fused_maybe_chunked(fused_fn, t, q, k, xg, v, rl, X, env, scale,
                         nbr, wre_k, wre_b, wrs_k, wrs_b, *, halo,
                         max_rows, start, chunked_factory=None):
    """Run the fused ELL kernel — whole-table, or chunked over
    contiguous row blocks when the node table exceeds ``max_rows``.

    Chunking slices each chunk's node tables to a static window of
    width ``chunk_rows + 2*halo`` (rounded to the 128-lane tile):
    the collator proved every contiguous row chunk's neighbor indices
    lie inside that window (ELLBatch.gather_halo), so the kernel —
    whose pair-row count is already decoupled from its table size —
    runs unchanged against the window with rebased indices.  One
    ``lax.scan`` over same-shape chunks = one compiled kernel, under
    a single outer custom_vjp that slices windows inside the scan
    body in both directions (ops/pallas/fused_ell.py:
    make_fused_ell_chunked) so no ``[C, W, F]`` stacked window tensor
    is ever materialized.  Extends the fused formulation past the
    VMEM table bound (~2k rows at flagship width) to 10^4-atom
    systems.  ``start`` rebases global row ids under row sharding
    (then chunking subdivides the local rows).  Callers must have
    checked ``pick_chunking`` feasibility (GATAELL does) — an
    infeasible geometry falls back to the whole-table call here only
    as a last resort."""
    from gotennet_tpu.ops.pallas.fused_ell import pick_chunking

    NR, K, D = t.shape
    NT = k.shape[0]

    def whole_table():
        return fused_fn(t, q, k, xg, v, rl, X, env, scale, nbr,
                        wre_k, wre_b, wrs_k, wrs_b)

    if not max_rows or halo is None or NT <= max_rows:
        return whole_table()
    pick = pick_chunking(NR, NT, halo, max_rows)
    if pick is None:
        return whole_table()
    cr, W, C = pick
    if C == 1 or W >= NT or chunked_factory is None:
        return whole_table()

    # chunk c covers global rows [start + c*cr, start + (c+1)*cr)
    ws = jnp.clip(start + jnp.arange(C) * cr - halo,
                  0, NT - W).astype(jnp.int32)
    chunked = chunked_factory(cr=cr, W=W, C=C)
    return chunked(t, q, k, xg, v, rl, X, env, scale, nbr, ws,
                   wre_k, wre_b, wrs_k, wrs_b)


class NodeInitELL(fnn.Module):
    """NodeInit in ELL layout (same params as models.gotennet.NodeInit).

    Under row sharding (``GotenNetELL`` edge_axis): ``h`` holds this
    device's center rows, ``z`` stays full (it feeds the neighbor
    species table), and pair inputs hold local rows — the output is
    local rows for the caller to ``unshard``."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, z, h, nbr, dist, phi, nonloop,
                 gmeta=None) -> jnp.ndarray:
        cfg = self.cfg
        gth = _gather_fn(nbr, gmeta, cfg.pair_dtype)
        act = get_activation(cfg.activation)
        d = cfg.n_atom_basis
        a_nbr = self.param("A_nbr", jax.nn.initializers.normal(1.0),
                           (cfg.max_z, d), jnp.float32)
        env = cosine_cutoff(dist, cfg.cutoff)  # [N, K]
        r_feat = Dense(d, activation=None, weight_init=cfg.weight_init,
                       bias_init=cfg.bias_init, name="W_ndp")(phi)
        msg = gth(a_nbr[z]) * r_feat * env[..., None]  # [N, K, D]
        m_i = jnp.sum(msg * nonloop[..., None], axis=1)
        fused = jnp.concatenate([h, m_i], axis=-1)
        return MLP([2 * d, d, d], activation=act, last_activation=None,
                   weight_init=cfg.weight_init, bias_init=cfg.bias_init,
                   norm="layer", name="W_nrd_nru")(fused)


class GATAELL(fnn.Module):
    """GATA in ELL layout (same params as models.gotennet.GATA).

    Under row sharding (``cfg.edge_axis`` set, inside shard_map):
    node state ``h``/``X`` arrives replicated; pair inputs (``t_ij``,
    ``rl_ij``, ``dist``, ``nbr``, ``nbr_mask``, ``n_edges``) hold only
    this device's destination rows.  The destination-keyed query uses
    the local row slice, source tables (k/x_g/v/X, HTR EK) stay
    replicated for the gathers, per-row aggregates are reassembled by
    pad+psum (``_shard_rows``), and the edge state stays local — the
    graph analog of sequence parallelism."""

    cfg: GotenNetConfig
    last_layer: bool = False
    deterministic: bool = True
    # static halo bound from the collator (ELLBatch.gather_halo):
    # enables the chunked fused-kernel path for tables larger than
    # cfg.fused_table_rows
    gather_halo: "int | None" = None

    @fnn.compact
    def __call__(self, h, X, t_ij, rl_ij, dist, nbr, nbr_mask, n_edges,
                 gmeta=None):
        cfg = self.cfg
        gth = _gather_fn(nbr, gmeta, cfg.pair_dtype)
        act = get_activation(cfg.activation)
        D = cfg.n_atom_basis
        H = cfg.num_heads
        Dh = D // H
        mult = cfg.multiplier
        info = parse_edge_updates(cfg.edge_updates)
        evec_dim = cfg.evec_dim or D
        emlp_dim = cfg.emlp_dim or D
        N, K = nbr.shape
        rows, unshard, start, _ = _shard_rows(cfg.edge_axis, h.shape[0])
        dense_kw = dict(weight_init=cfg.weight_init, bias_init=cfg.bias_init)

        if cfg.layernorm:
            h = fnn.LayerNorm(epsilon=1e-5, name="layernorm")(h)
        if cfg.steerable_norm:
            X = TensorLayerNorm(D, cfg.lmax, trainable=False,
                                name="tensor_layernorm")(X)

        # node projections run on this device's rows only; the source
        # TABLES (k/x_g/v) are reassembled by pad+psum so the gathers
        # see full rows — node FLOPs scale 1/n_shards, one psum per
        # table per layer (proportional to node, not pair, state)
        hn = rows(h)
        q = Dense(D, activation=None, **dense_kw, name="W_q")(hn)
        k = unshard(Dense(D, activation=None, **dense_kw,
                          name="W_k")(hn))

        x_g = Dense(D, activation=act, **dense_kw, name="gamma_s_0")(hn)
        x_g = unshard(Dense(mult * D, activation=None, **dense_kw,
                            name="gamma_s_1")(x_g))
        v = Dense(D, activation=act, **dense_kw, name="gamma_v_0")(hn)
        v = unshard(Dense(mult * D, activation=None, **dense_kw,
                          name="gamma_v_1")(v))

        from gotennet_tpu.ops.activations import is_silu_like
        # belt-and-braces: GotenNetConfig.__post_init__ already rejects
        # fused=True with a non-silu activation or non-add aggregation
        use_fused = (cfg.fused and cfg.aggr == "add"
                     and is_silu_like(cfg.activation))
        if use_fused and cfg.fused_table_rows \
                and h.shape[0] > cfg.fused_table_rows:
            # table beyond the VMEM bound: the fused path needs a
            # feasible halo-windowed chunking; without one (no window
            # metadata, or halo too wide for the budget) the XLA
            # windowed-gather formulation is strictly better than
            # degenerate near-full-table chunks
            from gotennet_tpu.ops.pallas.fused_ell import pick_chunking
            NR_f = t_ij.shape[0]
            use_fused = (self.gather_halo is not None
                         and pick_chunking(NR_f, h.shape[0],
                                           self.gather_halo,
                                           cfg.fused_table_rows)
                         is not None)
        if use_fused:
            # one Pallas kernel: W_re/W_rs projections + SDDMM + masked
            # softmax over K + spatial path + degree aggregation; node
            # tables VMEM-resident, neighbor lookups as in-kernel
            # one-hot matmuls (ops/pallas/fused_ell.py), analytic VJP
            import functools

            from gotennet_tpu.models.gotennet_dense import _LinearParams
            from gotennet_tpu.ops.pallas.fused_ell import (
                make_fused_ell, make_fused_ell_chunked)
            wre_k, wre_b = _LinearParams(D, D, cfg.weight_init,
                                         cfg.bias_init, name="W_re")()
            wrs_k, wrs_b = _LinearParams(mult * D, D, cfg.weight_init,
                                         cfg.bias_init, name="W_rs")()
            env_signed = jnp.where(nbr_mask,
                                   cosine_cutoff(dist, cfg.cutoff), -1.0)
            if cfg.scale_edge:
                scale = jnp.sqrt(n_edges) / math.sqrt(D)
            else:
                scale = jnp.full_like(dist, 1.0 / math.sqrt(D))
            if cfg.attn_dropout > 0.0 and not self.deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - cfg.attn_dropout,
                    (N, K, H))
                scale = (scale[..., None] * keep.astype(scale.dtype)
                         / (1.0 - cfg.attn_dropout))
            interp = jax.default_backend() != "tpu"
            fused_fn = make_fused_ell(
                cfg.lmax, H, cfg.sep_dir, cfg.sep_tensor,
                interpret=interp, pair_dtype=cfg.pair_dtype)
            chunked_factory = functools.partial(
                make_fused_ell_chunked, cfg.lmax, H, cfg.sep_dir,
                cfg.sep_tensor, interp, cfg.pair_dtype)
            d_h, dX_agg = _fused_maybe_chunked(
                fused_fn, t_ij, q, k, x_g, v, rl_ij, X, env_signed,
                scale, nbr, wre_k, wre_b, wrs_k, wrs_b,
                halo=self.gather_halo,
                max_rows=cfg.fused_table_rows, start=start,
                chunked_factory=chunked_factory)
            h = h + unshard(d_h)
            X = X + unshard(dX_agg)
        else:
            h, X = self._unfused_message(
                cfg, act, h, X, t_ij, rl_ij, dist, nbr, nbr_mask,
                n_edges, q, k, x_g, v, gth, N, K, D, H, Dh, mult,
                dense_kw, unshard)

        # ---- HTR edge update ---------------------------------------
        return self._edge_update(cfg, act, h, X, t_ij, rl_ij, gth,
                                 info, evec_dim, emlp_dim, N, K,
                                 dense_kw, rows, unshard, nbr=nbr,
                                 start=start)

    def _unfused_message(self, cfg, act, h, X, t_ij, rl_ij, dist, nbr,
                         nbr_mask, n_edges, q, k, x_g, v, gth, N, K, D,
                         H, Dh, mult, dense_kw, unshard=lambda x: x):
        """XLA message+aggregate (any aggr/activation; the oracle for
        the fused kernel).  ``N`` is the (possibly local) destination
        row count; ``q`` holds those rows, the gathers read the
        replicated tables, and ``unshard`` reassembles the per-row
        aggregates (identity on a single device)."""
        t_attn = Dense(D, activation=act, **dense_kw, name="W_re")(t_ij)
        t_filter = Dense(mult * D, activation=None, **dense_kw,
                         name="W_rs")(t_ij)  # [N, K, mult*D]

        # ---- attention: SDDMM logits + masked softmax over K ---------
        logit = jnp.sum(
            q.reshape(N, 1, H, Dh) * gth(k).reshape(N, K, H, Dh)
            * t_attn.reshape(N, K, H, Dh), axis=-1)  # [N, K, H]
        logit = jnp.where(nbr_mask[..., None], logit, _NEG)
        lmaxv = jax.lax.stop_gradient(
            jnp.max(logit, axis=1, keepdims=True))
        expd = jnp.exp(logit - lmaxv) * nbr_mask[..., None]
        attn = expd / (jnp.sum(expd, axis=1, keepdims=True) + _SOFTMAX_EPS)
        if cfg.scale_edge:
            attn = attn * (jnp.sqrt(n_edges)[..., None] / math.sqrt(D))
        else:
            attn = attn / math.sqrt(D)
        if cfg.attn_dropout > 0.0:
            attn = fnn.Dropout(cfg.attn_dropout, name="attn_dropout")(
                attn, deterministic=self.deterministic)

        sea = (attn[..., None]
               * gth(v).reshape(N, K, H, (mult * D) // H))
        sea = sea.reshape(N, K, mult * D)
        spatial = (t_filter * gth(x_g)
                   * cosine_cutoff(dist, cfg.cutoff)[..., None])
        o = spatial + sea  # [N, K, mult*D]

        chunks = [o[..., i * D:(i + 1) * D] for i in range(mult)]
        o_s = chunks[0]
        rest = chunks[1:]
        deg_map = jnp.asarray(degree_index_map(cfg.lmax), jnp.int32) - 1

        X_j = gth(X)  # [N, K, L, D]
        if cfg.sep_dir:
            o_d = jnp.stack(rest[:cfg.lmax], axis=2)  # [N, K, lmax, D]
            rest = rest[cfg.lmax:]
            dX_R = rl_ij[..., None] * jnp.take(o_d, deg_map, axis=2)
        else:
            o_d, rest = rest[0], rest[1:]
            dX_R = rl_ij[..., None] * o_d[:, :, None, :]
        if cfg.sep_tensor:
            o_t = jnp.stack(rest[:cfg.lmax], axis=2)
            dX_X = X_j * jnp.take(o_t, deg_map, axis=2)
        else:
            dX_X = X_j * rest[0][:, :, None, :]
        dX = dX_R + dX_X  # [N, K, L, D]

        # ---- aggregate over K -----------------------------------------
        h = h + unshard(_aggr_k(cfg.aggr, o_s, nbr_mask))
        X = X + unshard(_aggr_k(cfg.aggr, dX, nbr_mask))
        return h, X

    def _fused_edge_update(self, cfg, info, t_ij, EQ, EK, rl_ij, nbr,
                           D, dense_kw, start):
        """Fused HTR-ELL kernel call (whole-table or halo-chunked);
        returns the updated edge state, or None when no feasible
        chunking exists for an over-budget table (caller falls back
        to the XLA formulation).  Parameter tree identical to the
        unfused gamma_t (single-layer MLP), so checkpoints are
        interchangeable across paths."""
        import functools

        from gotennet_tpu.models.gotennet_dense import _MLPLayerParams
        from gotennet_tpu.ops.pallas.fused_htr import (
            make_fused_htr_ell, make_fused_htr_ell_chunked)
        from gotennet_tpu.ops.pallas.fused_ell import pick_chunking

        NT = EK.shape[0]
        NR = t_ij.shape[0]
        interp = jax.default_backend() != "tpu"
        gt_k, gt_b = _MLPLayerParams(D, D, cfg.weight_init,
                                     cfg.bias_init, name="gamma_t")()
        gate = info["gated"] or ""
        max_rows = cfg.fused_table_rows
        if not max_rows or NT <= max_rows:
            fn = make_fused_htr_ell(
                cfg.lmax, cfg.sep_htr, info["rej"], gate,
                interpret=interp, pair_dtype=cfg.pair_dtype)
            return fn(t_ij, EQ, EK, rl_ij, nbr, gt_k, gt_b)
        if self.gather_halo is None:
            return None
        pick = pick_chunking(NR, NT, self.gather_halo, max_rows)
        if pick is None:
            return None
        cr, W, C = pick
        if C == 1 or W >= NT:
            fn = make_fused_htr_ell(
                cfg.lmax, cfg.sep_htr, info["rej"], gate,
                interpret=interp, pair_dtype=cfg.pair_dtype)
            return fn(t_ij, EQ, EK, rl_ij, nbr, gt_k, gt_b)
        ws = jnp.clip(start + jnp.arange(C) * cr - self.gather_halo,
                      0, NT - W).astype(jnp.int32)
        fn = make_fused_htr_ell_chunked(
            cfg.lmax, cfg.sep_htr, info["rej"], gate, interp,
            cfg.pair_dtype, cr=cr, W=W, C=C)
        return fn(t_ij, EQ, EK, rl_ij, nbr, ws, gt_k, gt_b)

    def _edge_update(self, cfg, act, h, X, t_ij, rl_ij, gth, info,
                     evec_dim, emlp_dim, N, K, dense_kw,
                     rows=lambda x: x, unshard=lambda x: x, *,
                     nbr=None, start=0):
        """HTR edge update (skipped on the last layer, reference
        gotennet.py:874).  Pair-local throughout: the center term
        takes this device's row slice (``rows``), the EK table is
        projected on local rows and reassembled by pad+psum for the
        gather, and the updated edge state remains row-local."""
        if self.last_layer or not cfg.edge_updates:
            return h, X, t_ij
        D = cfg.n_atom_basis
        Xn = rows(X)
        EQ = Dense(evec_dim, use_bias=False, activation=None,
                   **dense_kw, name="W_vq")(Xn)  # center rows [*, L, C]
        if cfg.sep_htr:
            blocks = []
            for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
                blocks.append(Dense(
                    evec_dim, use_bias=False, activation=None,
                    **dense_kw, name=f"W_vk_{l}")(Xn[:, lo:hi, :]))
            EK = unshard(jnp.concatenate(blocks, axis=1))
        else:
            EK = unshard(Dense(evec_dim, use_bias=False, activation=None,
                               **dense_kw, name="W_vk")(Xn))

        # fused path: flagship grammar (plus norej/gating) as one
        # Pallas kernel per row block — gamma_t matmul, expanded
        # rejection pair products and gating with the [NR, K, L, C]
        # intermediates VMEM-only, EK lookups as in-kernel one-hot
        # matmuls (ops/pallas/fused_htr.py:make_fused_htr_ell)
        if (cfg.fused and cfg.fused_htr and nbr is not None
                and cfg.activation in ("swish", "silu")
                and not info["mlp"] and not info["mlpa"]
                and info["lin_w"] == 0 and info["lin_ln"] == 0
                and cfg.edge_ln == "" and evec_dim == D):
            t_new = self._fused_edge_update(cfg, info, t_ij, EQ, EK,
                                            rl_ij, nbr, D, dense_kw,
                                            start)
            if t_new is not None:
                return h, X, t_new

        EQ_i = EQ[:, None]   # [N, 1, L, C] (center = row)
        EK_j = gth(EK)       # [N, K, L, C]

        def reject(rep, r):
            proj = jnp.sum(rep * r[..., None], axis=2, keepdims=True)
            return rep - proj * r[..., None]

        if cfg.sep_htr:
            w_ij = jnp.zeros((N, K, evec_dim), h.dtype)
            for lo, hi in degree_slices(cfg.lmax):
                eq_l = EQ_i[:, :, lo:hi]
                ek_l = EK_j[:, :, lo:hi]
                r_l = rl_ij[:, :, lo:hi]
                if info["rej"]:
                    eq_l = reject(eq_l, r_l)
                    ek_l = reject(ek_l, -r_l)
                w_ij = w_ij + jnp.sum(eq_l * ek_l, axis=2)
        elif not info["rej"]:
            w_ij = jnp.sum(EQ_i * EK_j, axis=2)
        else:
            w_ij = jnp.sum(
                reject(jnp.broadcast_to(EQ_i, EK_j.shape), rl_ij)
                * reject(EK_j, -rl_ij), axis=2)

        if info["mlp"] or info["mlpa"]:
            gamma_t = MLP(
                [D, emlp_dim, D], activation=act,
                last_activation=None if info["mlp"] else act,
                norm=cfg.edge_ln, **dense_kw, name="gamma_t")
        else:
            gamma_t = MLP([D, D], activation=act, last_activation=act,
                          norm=cfg.edge_ln, **dense_kw, name="gamma_t")
        gt = gamma_t(t_ij)

        gw = w_ij
        if info["lin_w"] > 0:
            if info["lin_ln"] == 1:
                gw = fnn.LayerNorm(epsilon=1e-5, name="gamma_w_ln")(gw)
            if info["lin_w"] % 10 == 2:
                gw = act(gw)
            gw = Dense(D, activation=None,
                       norm="layer" if info["lin_ln"] == 2 else "",
                       **dense_kw, name="W_edp")(gw)
        if info["gated"] == "gatedt":
            gw = jnp.tanh(gw)
        elif info["gated"] == "gated":
            gw = jax.nn.sigmoid(gw)
        elif info["gated"] == "act":
            gw = jax.nn.silu(gw)

        t_ij = t_ij + gt * gw
        return h, X, t_ij


class GotenNetELL(fnn.Module):
    """Full ELL-layout stack; parameter tree identical to GotenNet."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, batch: ELLBatch,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        z, pos = batch.z, batch.pos
        N, K = batch.nbr.shape
        D = cfg.n_atom_basis

        # multi-chip row sharding (cfg.edge_axis, inside shard_map):
        # the batch arrives replicated, each device owns a contiguous
        # block of N/n_shards destination rows — pair tensors and the
        # edge state live only on the owner, node state is reassembled
        # by psum after each aggregation
        ax = cfg.edge_axis
        if ax is not None and N % jax.lax.psum(1, ax):
            raise ValueError(
                f"node capacity {N} not divisible by the "
                f"'{ax}'-axis size {jax.lax.psum(1, ax)}")
        rows, unshard, start, NR = _shard_rows(ax, N)
        nbr, nm = rows(batch.nbr), rows(batch.nbr_mask)

        # neighbor lookups: windowed one-hot matmuls when the batch
        # carries window metadata (the 10^3-atom path), else plain take
        gmeta = None
        if batch.gather_window and batch.block_rows:
            gmeta = _window_gather_meta(nbr, batch.gather_window,
                                        batch.block_rows, n_table=N)
        gth = _gather_fn(nbr, gmeta, cfg.pair_dtype)

        # neighbor geometry (src − dst convention, reference
        # layers.py:1589-1600: self-loop distance pinned to 0);
        # positions gather in f32 — geometry must stay exact
        vec = gth(pos, jnp.float32) - rows(pos)[:, None, :]  # [NR, K, 3]
        self_idx = (jnp.arange(NR, dtype=nbr.dtype) + start)[:, None]
        nonloop = nm & (nbr != self_idx)
        d2 = jnp.sum(vec ** 2, axis=-1)
        dist = jnp.where(nonloop, jnp.sqrt(jnp.where(nonloop, d2, 1.0)),
                         0.0)
        vec_n = jnp.where(nonloop[..., None],
                          vec / jnp.where(nonloop, dist, 1.0)[..., None],
                          vec * 0.0)
        rl_ij = spherical_harmonics(vec_n, cfg.lmax)  # [NR, K, L]

        a_na = self.param("A_na", _zero_padded_embed_init,
                          (cfg.max_z, D), jnp.float32)
        h = a_na[z]  # [N, D] (replicated)

        rbf_params, rbf_fn = RadialBasis.make(
            self, cfg.radial_basis, cfg.n_rbf, cfg.cutoff,
            trainable=cfg.trainable_rbf)
        phi = rbf_fn(dist, rbf_params)  # [NR, K, R]

        h = unshard(NodeInitELL(cfg, name="node_init")(
            z, rows(h), nbr, dist, phi, nonloop, gmeta=gmeta))
        t_ij = EdgeInitELL(cfg, name="edge_init")(phi, h, nbr,
                                                  gmeta=gmeta,
                                                  h_rows=rows(h))

        # per-source real-edge counts (reference gotennet.py:986-989);
        # the one remaining scatter — [N*K] scalars, negligible
        counts = segment_sum(nm.reshape(-1).astype(h.dtype),
                             nbr.reshape(-1), N, psum_axis=ax)
        n_edges = gth(counts[:, None], jnp.float32)[..., 0]  # [NR, K]

        X = jnp.zeros((N, cfg.sh_dim, D), h.dtype)
        gata_cls = fnn.remat(GATAELL) if cfg.remat else GATAELL
        for i in range(cfg.n_interactions):
            h, X, t_ij = gata_cls(
                cfg, last_layer=(i == cfg.n_interactions - 1),
                deterministic=deterministic,
                gather_halo=batch.gather_halo, name=f"gata_{i}")(
                    h, X, t_ij, rl_ij, dist, nbr, nm, n_edges, gmeta)
            # EQFF is purely row-wise: run it on this device's rows
            # and reassemble (identity on a single device)
            h_r, X_r = EQFF(cfg, name=f"eqff_{i}")(rows(h), rows(X))
            h, X = unshard(h_r), unshard(X_r)

        return h, X


class EdgeInitELL(fnn.Module):
    """EdgeInit in ELL layout (same params as models.gotennet.EdgeInit).

    ``h_rows`` is this device's destination-row slice of ``h`` under
    row sharding (defaults to ``h`` on a single device); ``h`` itself
    is the replicated source table for the neighbor gather."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, phi, h, nbr, gmeta=None,
                 h_rows=None) -> jnp.ndarray:
        if h_rows is None:
            h_rows = h
        gth = _gather_fn(nbr, gmeta, self.cfg.pair_dtype)
        w = Dense(self.cfg.n_atom_basis, activation=None,
                  weight_init="xavier_uniform", bias_init="zeros",
                  name="W_erp")(phi)  # [NR, K, D]
        return (h_rows[:, None, :] + gth(h)) * w
