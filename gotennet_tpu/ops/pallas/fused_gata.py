"""Fused dense-GATA message+aggregate Pallas kernel.

One grid step per (graph, i-tile) computes, entirely in VMEM:

    t_attn   = act(t @ W_re + b_re)                  (edge attention filter)
    logits   = sum_d q_i * k_j * t_attn              (SDDMM)
    attn     = masked softmax_j(logits) * scale
    t_filter = t @ W_rs + b_rs                       (spatial filter)
    o        = t_filter * x_g[j] * env + attn[head(c)] * v[j]
    d_h[i]   = sum_j o_s
    dX[i,m]  = sum_j rl[i,j,m] * o_dir,l(m) + sum_j X[j,m] * o_ten,l(m)

The [M*M, mult*D]-sized tensors (t_filter, o) exist only as VMEM
tiles — in the XLA formulation they dominate HBM traffic (profiled:
>2/3 of the forward).  Channel groups (scalar / per-degree dir /
per-degree tensor) are processed sequentially to bound peak VMEM.

For large M (MD22-scale: 100+ atoms) the i axis is tiled
(``_pick_i_tile``): each grid step handles a TI-row slab of pairs
with the full j axis resident, so the softmax stays exact — no
online rescaling — while VMEM and Mosaic compile time stay bounded.
j-indexed gradients accumulate across a graph's i-tiles in place
(sequential TPU grid).

Layout notes (Mosaic constraints): pair-indexed tensors arrive
flattened as ``[G, M*M, F]`` with the feature axis minor — lane->
sublane reshapes are illegal on TPU, so per-pair scalars (env, scale)
carry an explicit trailing singleton lane.  Head reductions and the
per-channel head broadcast are expressed as indicator-matrix matmuls
(MXU) instead of reshapes.  The j-reduction of the steerable update
runs as an explicit per-m loop of middle-axis reductions.

The attention matrix [M*M, H] is returned as a residual so a custom
VJP can rebuild gradients without recomputing the softmax.

Only the 'swish'/'silu' activation (the shipped config) is fused;
other activations fall back to the XLA path at the caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gotennet_tpu.ops.spherical import degree_slices

__all__ = ["fused_gata_message", "make_fused_gata"]


def _pick_i_tile(M: int, max_pairs: int = 4096) -> int:
    """Rows of i handled per grid step: the largest multiple-of-8
    divisor of M whose pair block TI*M stays under ``max_pairs``
    (QM9's M=32 -> one tile; M=120 -> TI=24; M=128 -> TI=32).  Keeps
    VMEM and Mosaic compile time bounded at large M.  Tiles must be
    multiples of 8 (Mosaic sublane constraint on the [TI, D] node
    blocks); the dense loaders round M up to a multiple of 8, so TI=8
    always exists there.  When even the TI=8 slab exceeds the pair
    budget (M > max_pairs/8) the smallest slab is used anyway — the
    kernel still compiles, just with a larger working set — and a
    warning makes the VMEM pressure diagnosable."""
    if M * M <= max_pairs:
        return M
    divs = [ti for ti in range(8, M + 1, 8) if M % ti == 0]
    fits = [ti for ti in divs if ti * M <= max_pairs]
    if fits:
        return fits[-1]
    # no divisor fits the budget (very large M): take the smallest
    # slab rather than falling back to the whole (uncompilable) graph
    ti = divs[0] if divs else M
    from gotennet_tpu.utils.logging import get_logger
    get_logger().warning(
        "fused_gata: M=%d has no i-tile within the %d-pair budget; "
        "using TI=%d (%d pairs/slab) — raise the scoped-vmem limit if "
        "Mosaic reports VMEM exhaustion", M, max_pairs, ti, ti * M)
    return ti


def _pick_graph_block(G: int, M: int, NI: int, D: int,
                      max_pairs: int = 1536) -> int:
    """Graphs processed per grid step (GB): the largest divisor of G
    whose stacked pair slab GB*M*M stays under ``max_pairs``, and only
    when the whole graph already fits one i-slab (NI == 1).  Amortises
    per-op overhead for small-M buckets: at QM9's M=24 bucket GB=2
    measured ~30% faster per pair than GB=1 (M=32 stays GB=1 — its
    1024-row slab is already efficient and GB=2 measured no better).
    r05 re-sweep at the node-bf16 operating point confirms 1536: a
    4096-pair budget (GB=4 at M=32) measured +0.3 ms/step forward-only
    and +1.3 ms with the backward also blocked at 2048 — the per-graph
    tile_j/stack flushes grow with GB faster than the dispatch
    amortisation saves.  Requires tile-aligned shapes (M multiple of 8
    sublanes, D multiple of 128 lanes) — Mosaic cannot lower the
    blocked writes with implicit padding dims; sub-tile shapes keep
    GB=1."""
    if NI != 1 or M % 8 or D % 128:
        return 1
    best = 1
    for gb in range(2, G + 1):
        if G % gb == 0 and gb * M * M <= max_pairs:
            best = gb
    return best


def _kernel(t_ref, q_ref, k_ref, xg_ref, v_ref, rl_ref, x_ref, env_ref,
            scale_ref, wre_ref, bre_ref, wrs_ref, brs_ref,
            dh_ref, dx_ref, attn_ref, *, TI, M, D, H, lmax, mult, sep_dir,
            sep_tensor, pair_dtype, GB=1):
    """One grid step = GB graphs' TI-row i-slabs (GB > 1 only when the
    whole graph fits one slab, TI == M); the full j axis (M columns) is
    resident, so the softmax is exact (no online rescaling).
    TB = GB*TI*M pairs per step.  Graph-blocking amortises per-op
    overhead for small-M buckets (QM9's M=24: measured -30%/pair at
    GB=2) — each graph's rows only ever interact with its own j axis,
    so the math is unchanged."""
    f32 = jnp.float32
    pd = pair_dtype                         # matmul input dtype (bf16 =
    TB = GB * TI * M                        # 4x MXU rate; accum stays f32
    t2 = t_ref[...].reshape(TB, D).astype(pd)

    def rep_i(a):
        """[GB*TI, F] keyed by (graph, i) -> [TB, F] over pairs."""
        F = a.shape[-1]
        return jnp.broadcast_to(jnp.expand_dims(a, 1),
                                (GB * TI, M, F)).reshape(TB, F)

    def tile_j(a):
        """[GB, M, F] keyed by (graph, j) -> [TB, F] over pairs."""
        F = a.shape[-1]
        return jnp.broadcast_to(jnp.expand_dims(a, 1),
                                (GB, TI, M, F)).reshape(TB, F)

    # --- attention filter + SDDMM logits ----------------------------
    ta = jnp.dot(t2, wre_ref[...].astype(pd), preferred_element_type=f32)
    ta = ta + bre_ref[...]
    ta = ta * jax.lax.logistic(ta)          # silu / swish
    q = q_ref[...].reshape(GB * TI, D).astype(pd)
    k = k_ref[...].astype(pd)               # [GB, M, D]
    qrep = rep_i(q)                         # q varies per (graph, i)
    krep = tile_j(k)                        # k varies per (graph, j)
    p = ta.astype(pd) * qrep * krep
    # per-head lane-block reduction via indicator matmul [D, H]
    dh_per = D // H
    col = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // dh_per
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    sel = (col == head).astype(pd)
    logits = jnp.dot(p, sel, preferred_element_type=f32)  # [TB, H]

    # env carries cutoff*pair_mask (>= 0) for valid pairs, -1 invalid:
    # the sign encodes the pair mask so one input serves both purposes
    env = env_ref[...].reshape(TB, 1)
    valid = env >= 0.0
    envp = jnp.maximum(env, 0.0)

    neg = jnp.float32(-1e30)
    logits = jnp.where(valid, logits, neg)
    l3 = logits.reshape(GB * TI, M, H)
    mx = jnp.max(l3, axis=1, keepdims=True)
    ex = jnp.exp(l3 - mx) * valid.reshape(GB * TI, M, 1)
    denom = jnp.sum(ex, axis=1, keepdims=True) + 1e-16
    sm = (ex / denom).reshape(TB, H)
    # GB==1 keeps the rank-2 ref[0] write forms: Mosaic cannot lower
    # full-rank writes with implicit (sub-tile) padding dims at small
    # D/H, and GB>1 is only picked for tile-aligned shapes
    if GB == 1:
        attn_ref[0] = sm                    # pre-scale residual
    else:
        attn_ref[...] = sm.reshape(attn_ref.shape)
    SH = scale_ref.shape[-1]
    attn = sm * scale_ref[...].reshape(TB, SH)

    xg = xg_ref[...].astype(pd)             # [GB, M, mult*D]
    v = v_ref[...].astype(pd)
    e_per = (mult * D) // H                 # channels per head
    envp = envp.astype(pd)
    attn_p = attn.astype(pd)

    def group(co):
        """o for channel block [co, co+D): [TB, D] in pair dtype."""
        tf = jnp.dot(t2, wrs_ref[:, co:co + D].astype(pd),
                     preferred_element_type=f32) + brs_ref[:, co:co + D]
        # per-channel head coefficient via indicator matmul [H, D]
        ch = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) + co
        hsel = (ch // e_per == jax.lax.broadcasted_iota(
            jnp.int32, (H, D), 0)).astype(pd)
        # (Mosaic requires a 32-bit matmul accumulator)
        attn_c = jnp.dot(attn_p, hsel,
                         preferred_element_type=f32).astype(pd)  # [TB, D]
        xg_j = tile_j(xg[:, :, co:co + D])
        v_j = tile_j(v[:, :, co:co + D])
        return tf.astype(pd) * xg_j * envp + attn_c * v_j

    # --- scalar group -> d_h (j-sums accumulate f32, as in the XLA
    # path which casts pair products to f32 before reducing; dtype=f32
    # keeps the accumulator f32 without materialising a converted
    # copy — measured ~5% of the forward) ----------------------------
    o_s = group(0)
    dh = jnp.sum(o_s.reshape(GB * TI, M, D), axis=1, dtype=f32)
    if GB == 1:
        dh_ref[0] = dh
    else:
        dh_ref[...] = dh.reshape(dh_ref.shape)

    # --- steerable groups -> dX -------------------------------------
    # Direction terms: dX[i, m, :] = sum_j rl[i, j, m] * o_d[i, j, :]
    # is a j-contraction — run it as ONE i-batched MXU matmul per
    # degree block ([nm, M] @ [M, D] per i) instead of an m-loop of
    # [TI, M, D] broadcast-multiply-reduce VPU passes (the kernel is
    # VPU-bound; measured −15% forward at flagship shapes).  dX is
    # accumulated in registers and written once (per-m 4D ref writes
    # don't lower under graph blocking).
    L_SH = rl_ref.shape[-1]
    rl = rl_ref[...].reshape(TB, L_SH).astype(pd)
    x3 = (x_ref[...].astype(pd).reshape(GB * M, L_SH, D)
          if GB > 1 else None)
    cols = [None] * L_SH
    off = D
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_d = group(off + (l * D if sep_dir else 0)).reshape(
            GB * TI, M, D)
        nm = hi - lo
        rl3 = rl[:, lo:hi].reshape(GB * TI, M, nm)
        out = jax.lax.dot_general(
            rl3, o_d, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)     # [GB*TI, nm, D]
        for m in range(lo, hi):
            cols[m] = out[:, m - lo, :]
    off += (lmax if sep_dir else 1) * D
    # Tensor terms carry the channel axis on BOTH factors (elementwise
    # in d), so they stay VPU multiply-reduces.
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_t = group(off + (l * D if sep_tensor else 0)).reshape(
            GB, TI, M, D)
        for m in range(lo, hi):
            x_m = (x3[:, m, :].reshape(GB, 1, M, D) if GB > 1
                   else x_ref[0, :, m, :].astype(pd).reshape(1, 1, M, D))
            acc = jnp.sum(o_t * x_m, axis=2, dtype=f32)  # per-graph j
            cols[m] = cols[m] + acc.reshape(GB * TI, D)
    if GB == 1:
        for m in range(L_SH):
            dx_ref[0, :, m, :] = cols[m]
    else:
        dx_ref[...] = jnp.stack(cols, axis=1).reshape(dx_ref.shape)


def _pallas_forward(t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale,
                    W_re, b_re, W_rs, b_rs, *, lmax: int, num_heads: int,
                    sep_dir: bool, sep_tensor: bool,
                    interpret: bool = False,
                    pair_dtype=jnp.float32
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused message+aggregate step; returns the PRE-scale
    softmax [G, M, M, H] as the third output (the VJP residual).

    Args:
        t_ij: [G, M, M, D] edge features.
        q, k: [G, M, D] (head-major flattened).
        x_g, v: [G, M, mult*D].
        rl_ij: [G, M, M, L] spherical harmonics.
        X: [G, M, L, D] steerable node features.
        env_signed: [G, M, M] = cutoff*pair_mask for valid pairs, -1 for
            invalid pairs (sign encodes the mask so one tensor carries
            both).
        scale: [G, M, M] attention scale (1/sqrt(D) or
            sqrt(n_edges)/sqrt(D); zero rows are fine), or
            [G, M, M, H] per-head — attention dropout folds its
            mask/(1-p) in here (post-softmax multiplier, exactly the
            reference's Dropout placement).
        W_re/b_re/W_rs/b_rs: filter projection parameters.

    Returns:
        (d_h [G, M, D], dX [G, M, L, D], attn [G, M, M, H])
    """
    G, M, _, D = t_ij.shape
    L = rl_ij.shape[-1]
    H = num_heads
    mult = W_rs.shape[1] // D
    TI = _pick_i_tile(M)
    NI = M // TI
    GB = _pick_graph_block(G, M, NI, D)
    SH = H if scale.ndim == 4 else 1        # per-head scale (dropout)

    kern = functools.partial(
        _kernel, TI=TI, M=M, D=D, H=H, lmax=lmax, mult=mult,
        sep_dir=sep_dir, sep_tensor=sep_tensor, pair_dtype=pair_dtype,
        GB=GB)

    def ispec(shape):
        """Pair/i-indexed block: varies with the i-tile."""
        return pl.BlockSpec((GB,) + shape,
                            lambda g, i: (g, i) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def gspec(shape):
        """Graph-indexed block: full along every non-batch axis."""
        return pl.BlockSpec((GB,) + shape,
                            lambda g, i: (g,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda g, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((G, M, D), jnp.float32),
        jax.ShapeDtypeStruct((G, M, L, D), jnp.float32),
        jax.ShapeDtypeStruct((G, M * M, H), jnp.float32),
    )
    d_h, dX, attn = pl.pallas_call(
        kern,
        grid=(G // GB, NI),
        in_specs=[
            ispec((TI * M, D)), ispec((TI, D)), gspec((M, D)),
            gspec((M, mult * D)), gspec((M, mult * D)),
            ispec((TI * M, L)), gspec((M, L, D)), ispec((TI * M, 1)),
            ispec((TI * M, SH)),
            wspec((D, D)), wspec((1, D)), wspec((D, mult * D)),
            wspec((1, mult * D)),
        ],
        out_specs=(ispec((TI, D)), ispec((TI, L, D)), ispec((TI * M, H))),
        out_shape=out_shapes,
        interpret=interpret,
    )(t_ij.reshape(G, M * M, D), q, k, x_g, v,
      rl_ij.reshape(G, M * M, L), X,
      env_signed.reshape(G, M * M, 1), scale.reshape(G, M * M, SH),
      W_re, b_re.reshape(1, D), W_rs, b_rs.reshape(1, mult * D))
    return d_h, dX, attn.reshape(G, M, M, H)


@functools.partial(jax.jit, static_argnames=("lmax", "num_heads", "sep_dir",
                                             "sep_tensor", "interpret",
                                             "pair_dtype"))
def fused_gata_message(t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale,
                       W_re, b_re, W_rs, b_rs, *, lmax: int, num_heads: int,
                       sep_dir: bool, sep_tensor: bool,
                       interpret: bool = False,
                       pair_dtype=jnp.float32
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused step with the public (scaled) attention as third output."""
    d_h, dX, sm = _pallas_forward(
        t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale, W_re, b_re,
        W_rs, b_rs, lmax=lmax, num_heads=num_heads, sep_dir=sep_dir,
        sep_tensor=sep_tensor, interpret=interpret, pair_dtype=pair_dtype)
    return d_h, dX, sm * (scale if scale.ndim == 4 else scale[..., None])


def _bwd_kernel(t_ref, q_ref, k_ref, xg_ref, v_ref, rl_ref, x_ref, env_ref,
                scale_ref, wre_ref, bre_ref, wrs_ref, brs_ref, sm_ref,
                gdh_ref, gdx_ref,
                gt_ref, gq_ref, gk_ref, gxg_ref, gv_ref, grl_ref, gx_ref,
                genv_ref, gscale_ref, gwre_ref, gbre_ref, gwrs_ref,
                gbrs_ref, *, TI, M, D, H, lmax, mult, sep_dir, sep_tensor,
                pair_dtype, scale_heads=False, pos_grads=True, GB=1):
    """Analytic VJP of _kernel, one grid step per (graph-block, i-tile)
    with GB graphs per block (GB > 1 only when TI == M, mirroring the
    forward's graph blocking).

    Weight-gradient outputs map every grid step to block 0 and are
    zero-initialised at the first step; j-indexed gradients (g_k, g_xg,
    g_v, g_X) map to per-graph-block blocks and are zero-initialised at
    each block's first i-tile — grid steps run sequentially on TPU, so
    both accumulate in place (the standard Pallas reduction pattern).
    Per-channel-block partial gradients accumulate in registers and are
    written once per grid step (sliced multi-dim ref read-modify-writes
    don't lower under graph blocking).
    Pair-sized elementwise math runs in pair_dtype — matching the
    forward and what jax.grad of the XLA path (whose forward ops are
    pair_dtype) would produce — with every reduction/accumulation in
    f32; the attention-softmax backward and the gamma_re chain stay
    f32 (one block's worth, precision-sensitive).

    ``pos_grads=False`` (energy-only training): the g_rl and g_env
    outputs — cotangents that only feed dE/dpos — are skipped, which
    drops the per-m [TB, D] reductions for g_rl, the per-block g_env
    accumulation, and the dir blocks' o recompute.  The wrapper
    returns zeros for those slots.
    """
    f32 = jnp.float32
    pd = pair_dtype
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    first_tile = pl.program_id(1) == 0
    TB = GB * TI * M
    L = rl_ref.shape[-1]

    t2 = t_ref[...].reshape(TB, D)
    t2p = t2.astype(pd)
    env = env_ref[...].reshape(TB, 1)
    valid = env >= 0.0
    envp = jnp.maximum(env, 0.0)
    envp_p = envp.astype(pd)
    SH = scale_ref.shape[-1]
    scale = scale_ref[...].reshape(TB, SH)
    sm = sm_ref[...].reshape(TB, H)         # pre-scale softmax
    attn = sm * scale
    attn_p = attn.astype(pd)
    xg = xg_ref[...].astype(pd)             # [GB, M, mult*D]
    v = v_ref[...].astype(pd)
    rl_p = rl_ref[...].reshape(TB, L).astype(pd)
    # GB==1 keeps the rank-2/3 ref[0] access forms throughout this
    # kernel: Mosaic cannot lower full-rank-4 accesses / writes with
    # implicit (sub-tile) padding dims, and GB>1 is only picked for
    # tile-aligned shapes
    x3 = (x_ref[...].astype(pd).reshape(GB * M, L, D)
          if GB > 1 else None)
    gdh = gdh_ref[...].reshape(GB * TI, D)
    gdx_p = (gdx_ref[...].astype(pd).reshape(GB * TI, L, D)
             if GB > 1 else gdx_ref[0].astype(pd))
    e_per = (mult * D) // H

    @pl.when(first)
    def _init_weight_grads():
        gwre_ref[...] = jnp.zeros(gwre_ref.shape, f32)
        gbre_ref[...] = jnp.zeros(gbre_ref.shape, f32)
        gwrs_ref[...] = jnp.zeros(gwrs_ref.shape, f32)
        gbrs_ref[...] = jnp.zeros(gbrs_ref.shape, f32)

    @pl.when(first_tile)
    def _init_j_grads():
        gk_ref[...] = jnp.zeros(gk_ref.shape, f32)
        gxg_ref[...] = jnp.zeros(gxg_ref.shape, f32)
        gv_ref[...] = jnp.zeros(gv_ref.shape, f32)
        gx_ref[...] = jnp.zeros(gx_ref.shape, f32)

    def rep_i(a):
        """[GB*TI, F] keyed by (graph, i) -> [TB, F] over pairs
        ((g, i, j) row order = per-row repetition, any GB)."""
        return jnp.repeat(a, M, axis=0)

    def tile_j(a):
        """[GB, M, F] keyed by (graph, j) -> [TB, F] over pairs.
        Materialised per graph: broadcast-built values carry
        implicit-dim layouts that downstream axis-0 reduces reject."""
        F = a.shape[-1]
        if GB == 1:
            return jnp.tile(a.reshape(M, F), (TI, 1))
        return jnp.concatenate(
            [jnp.tile(a[g], (TI, 1)) for g in range(GB)], axis=0)

    def isum(a):
        """f32 sum_i of [TB, F] -> [GB, M(j), F] (partial over this
        tile) as per-graph rank-3 axis-0 reduces (rank-4 axis-1
        multi_reductions don't lower; dtype=f32 accumulates without a
        converted copy)."""
        a3 = a.reshape(GB * TI, M, -1)
        if GB == 1:
            return jnp.expand_dims(jnp.sum(a3, axis=0, dtype=f32), 0)
        return jnp.stack(
            [jnp.sum(a3[g * TI:(g + 1) * TI], axis=0, dtype=f32)
             for g in range(GB)], axis=0)

    def jsum(a):
        """f32 sum_j of [TB, F] -> [GB*TI(i), F]."""
        return jnp.sum(a.reshape(GB * TI, M, -1), axis=1, dtype=f32)

    g_attn = jnp.zeros((TB, H), f32)
    g_env = jnp.zeros((TB, 1), f32)
    gt_acc = jnp.zeros((TB, D), f32)
    # register accumulators, written to the refs once at the end
    gxg_cols = {}                           # co -> [GB, M, D]
    gv_cols = {}
    gx_cols = [None] * L                    # m -> [GB, M, D]
    grl_cols = [None] * L                   # m -> [TB] (as [TB, nm])

    def block_bwd(co, g_o, degs_rl, degs_X, g_attn, g_env, gt_acc):
        """Backprop one distinct channel block [co, co+D).

        g_o: [TB, D] cotangent of o for this block (pair dtype).
        degs_rl: m-indices whose dir-aggregation used this block
            (g_rl computed here, needs o recompute).
        degs_X: m-indices whose tensor-aggregation used this block
            (g_X computed here, needs o recompute).
        """
        wrs_c = wrs_ref[:, co:co + D].astype(pd)
        tf = (jnp.dot(t2p, wrs_c, preferred_element_type=f32)
              + brs_ref[:, co:co + D]).astype(pd)
        ch = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) + co
        hsel = (ch // e_per == jax.lax.broadcasted_iota(
            jnp.int32, (H, D), 0)).astype(pd)
        attn_c = jnp.dot(attn_p, hsel,
                         preferred_element_type=f32).astype(pd)
        xg_j = tile_j(xg[:, :, co:co + D])
        v_j = tile_j(v[:, :, co:co + D])

        if (degs_rl and pos_grads) or degs_X:
            o_c = tf * xg_j * envp_p + attn_c * v_j
            if pos_grads and degs_rl:
                # g_rl[(ij), m] = sum_d o_c[i, j, d] * gdx[i, m, d]:
                # one i-batched MXU matmul over the contiguous degree
                # block instead of an m-loop of [TB, D] mult+reduce
                lo, hi = degs_rl[0], degs_rl[-1] + 1
                out = jax.lax.dot_general(
                    o_c.reshape(GB * TI, M, D), gdx_p[:, lo:hi, :],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32)   # [GB*TI, M, nm]
                out = out.reshape(TB, hi - lo)
                for m in range(lo, hi):
                    grl_cols[m] = out[:, m - lo: m - lo + 1]
            for m in degs_X:
                gdx_m = rep_i(gdx_p[:, m, :])
                gx_cols[m] = isum(o_c * gdx_m)

        g_tf = g_o * xg_j * envp_p                # [TB, D] pair dtype
        gxg_cols[co] = isum(g_o * tf * envp_p)
        gv_cols[co] = isum(attn_c * g_o)
        if pos_grads:
            g_env = g_env + jnp.sum(g_o * tf * xg_j,
                                    axis=1, keepdims=True, dtype=f32)
        g_attn = g_attn + jax.lax.dot_general(
            g_o * v_j, hsel,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)           # [TB, H]
        # g_t += g_tf @ W_rs_c^T (contract the out axis, no transpose)
        gt_acc = gt_acc + jax.lax.dot_general(
            g_tf, wrs_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        # weight grads accumulate across graphs
        gw = jax.lax.dot_general(
            t2p, g_tf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)           # [D, D]
        gwrs_ref[:, co:co + D] = gwrs_ref[:, co:co + D] + gw
        gbrs_ref[:, co:co + D] = gbrs_ref[:, co:co + D] + jnp.sum(
            g_tf.astype(f32), axis=0, keepdims=True)
        return g_attn, g_env, gt_acc

    # ---- scalar block ------------------------------------------------
    g_attn, g_env, gt_acc = block_bwd(0, rep_i(gdh.astype(pd)), (), (),
                                      g_attn, g_env, gt_acc)

    # ---- dir blocks --------------------------------------------------
    # g_o[(ij), d] = sum_m rl[i, j, m] * gdx[i, m, d] — the transpose
    # of the forward's dir aggregation, likewise one i-batched MXU
    # matmul per degree block instead of per-m broadcast-multiply-adds
    slices = degree_slices(lmax)
    off = D

    def dir_g_o(lo, hi):
        rl3 = rl_p[:, lo:hi].reshape(GB * TI, M, hi - lo)
        return jax.lax.dot_general(
            rl3, gdx_p[:, lo:hi, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).reshape(TB, D).astype(pd)

    if sep_dir:
        for l, (lo, hi) in enumerate(slices):
            g_attn, g_env, gt_acc = block_bwd(
                off + l * D, dir_g_o(lo, hi), tuple(range(lo, hi)), (),
                g_attn, g_env, gt_acc)
    else:
        lo, hi = slices[0][0], slices[-1][1]
        g_attn, g_env, gt_acc = block_bwd(
            off, dir_g_o(lo, hi), tuple(range(lo, hi)), (),
            g_attn, g_env, gt_acc)
    off += (lmax if sep_dir else 1) * D

    # ---- tensor blocks -----------------------------------------------
    def x_m_rows(m):
        if GB == 1:
            return x_ref[0, :, m, :].astype(pd).reshape(1, M, D)
        return x3[:, m, :].reshape(GB, M, D)

    if sep_tensor:
        for l, (lo, hi) in enumerate(slices):
            g_o = sum(tile_j(x_m_rows(m)) * rep_i(gdx_p[:, m, :])
                      for m in range(lo, hi))
            g_attn, g_env, gt_acc = block_bwd(
                off + l * D, g_o, (), tuple(range(lo, hi)),
                g_attn, g_env, gt_acc)
    else:
        g_o = sum(tile_j(x_m_rows(m)) * rep_i(gdx_p[:, m, :])
                  for lo, hi in slices for m in range(lo, hi))
        g_attn, g_env, gt_acc = block_bwd(
            off, g_o, (), tuple(range(slices[0][0], slices[-1][1])),
            g_attn, g_env, gt_acc)

    # ---- flush register accumulators to the refs ---------------------
    gxg_full = jnp.concatenate([gxg_cols[co] for co in sorted(gxg_cols)],
                               axis=-1)     # [GB, M, mult*D]
    gv_full = jnp.concatenate([gv_cols[co] for co in sorted(gv_cols)],
                              axis=-1)
    if GB == 1:
        gxg_ref[0] = gxg_ref[0] + gxg_full[0]
        gv_ref[0] = gv_ref[0] + gv_full[0]
        for m in range(L):
            gx_ref[0, :, m, :] = gx_ref[0, :, m, :] + gx_cols[m][0]
        if pos_grads:
            grl_ref[0] = jnp.concatenate(grl_cols, axis=-1)
    else:
        gxg_ref[...] = gxg_ref[...] + gxg_full
        gv_ref[...] = gv_ref[...] + gv_full
        gx_ref[...] = gx_ref[...] + jnp.stack(gx_cols, axis=2)
        if pos_grads:
            grl_ref[...] = jnp.concatenate(grl_cols, axis=-1).reshape(
                grl_ref.shape)

    # ---- attention backward -----------------------------------------
    gscale = (sm * g_attn if scale_heads
              else jnp.sum(sm * g_attn, axis=1, keepdims=True))
    if GB == 1:
        gscale_ref[0] = gscale
    else:
        gscale_ref[...] = gscale.reshape(gscale_ref.shape)
    g_sm3 = (g_attn * scale).reshape(GB * TI, M, H)
    sm3 = sm.reshape(GB * TI, M, H)
    s = jnp.sum(sm3 * g_sm3, axis=1, keepdims=True)
    g_logits = (sm3 * (g_sm3 - s)).reshape(TB, H)

    # expand heads back to channels: g_p[ij, d] = g_logits[ij, head(d)]
    dh_per = D // H
    col = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // dh_per
    row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    selT = (col == row).astype(pd)                    # [H, D]
    g_p = jnp.dot(g_logits.astype(pd), selT,
                  preferred_element_type=f32)         # [TB, D]

    # recompute ta and silu'
    zre = jnp.dot(t2p, wre_ref[...].astype(pd),
                  preferred_element_type=f32) + bre_ref[...]
    sig = jax.lax.logistic(zre)
    ta = zre * sig
    qrep = rep_i(q_ref[...].reshape(GB * TI, D).astype(pd))
    krep = tile_j(k_ref[...].astype(pd))
    g_p_p = g_p.astype(pd)
    ta_p = ta.astype(pd)
    g_ta = (g_p_p * qrep * krep).astype(f32)
    gq = jsum(g_p_p * ta_p * krep)
    gk_add = isum(g_p_p * ta_p * qrep)
    if GB == 1:
        gq_ref[0] = gq
        gk_ref[0] = gk_ref[0] + gk_add[0]
    else:
        gq_ref[...] = gq.reshape(gq_ref.shape)
        gk_ref[...] = gk_ref[...] + gk_add
    g_zre = g_ta * (sig + zre * sig * (1.0 - sig))

    gt_acc = gt_acc + jax.lax.dot_general(
        g_zre.astype(pd), wre_ref[...].astype(pd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    gwre_ref[...] = gwre_ref[...] + jax.lax.dot_general(
        t2p, g_zre.astype(pd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    gbre_ref[...] = gbre_ref[...] + jnp.sum(g_zre, axis=0, keepdims=True)

    if GB == 1:
        gt_ref[0] = gt_acc
        if pos_grads:
            genv_ref[0] = jnp.where(valid, g_env, 0.0)
    else:
        gt_ref[...] = gt_acc.reshape(gt_ref.shape)
        if pos_grads:
            genv_ref[...] = jnp.where(valid, g_env, 0.0).reshape(
                genv_ref.shape)


def _pallas_backward(t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale,
                     W_re, b_re, W_rs, b_rs, sm, g_dh, g_dX, *,
                     lmax: int, num_heads: int, sep_dir: bool,
                     sep_tensor: bool, interpret: bool = False,
                     pair_dtype=jnp.float32, pos_grads: bool = True):
    """Run the backward kernel; returns cotangents for every
    differentiable input of _pallas_forward (in input order).
    ``pos_grads=False`` returns zeros for g_rl/g_env (see _bwd_kernel).
    """
    G, M, _, D = t_ij.shape
    L = rl_ij.shape[-1]
    H = num_heads
    mult = W_rs.shape[1] // D
    # the VJP's working set per slab is ~2x the forward's (block
    # recomputes + gradient accumulators), so halve its pair budget.
    # Graph blocking stays OFF here: measured at M=24 it wins ~8% in
    # the forward but LOSES ~3.5% in this kernel (the per-graph
    # stack/concat flushes outweigh the dispatch amortisation), so the
    # backward keeps one graph per grid step.  r05 re-confirmed: a
    # 2048-pair blocked backward (GB=2 at M=32) measured +1 ms/step,
    # and GB=4 exceeds even a 99M scoped-vmem limit.
    TI = _pick_i_tile(M, max_pairs=2048)
    NI = M // TI
    GB = 1
    SH = H if scale.ndim == 4 else 1

    kern = functools.partial(
        _bwd_kernel, TI=TI, M=M, D=D, H=H, lmax=lmax, mult=mult,
        sep_dir=sep_dir, sep_tensor=sep_tensor, pair_dtype=pair_dtype,
        scale_heads=(SH == H), pos_grads=pos_grads, GB=GB)

    def ispec(shape):
        return pl.BlockSpec((GB,) + shape,
                            lambda g, i: (g, i) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def gspec(shape):
        return pl.BlockSpec((GB,) + shape,
                            lambda g, i: (g,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda g, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((G, M * M, D), f32),       # g_t
        jax.ShapeDtypeStruct((G, M, D), f32),           # g_q
        jax.ShapeDtypeStruct((G, M, D), f32),           # g_k
        jax.ShapeDtypeStruct((G, M, mult * D), f32),    # g_xg
        jax.ShapeDtypeStruct((G, M, mult * D), f32),    # g_v
        jax.ShapeDtypeStruct((G, M * M, L), f32),       # g_rl
        jax.ShapeDtypeStruct((G, M, L, D), f32),        # g_X
        jax.ShapeDtypeStruct((G, M * M, 1), f32),       # g_env
        jax.ShapeDtypeStruct((G, M * M, SH), f32),      # g_scale
        jax.ShapeDtypeStruct((D, D), f32),              # g_Wre
        jax.ShapeDtypeStruct((1, D), f32),              # g_bre
        jax.ShapeDtypeStruct((D, mult * D), f32),       # g_Wrs
        jax.ShapeDtypeStruct((1, mult * D), f32),       # g_brs
    )
    outs = pl.pallas_call(
        kern,
        grid=(G // GB, NI),
        in_specs=[
            ispec((TI * M, D)), ispec((TI, D)), gspec((M, D)),
            gspec((M, mult * D)), gspec((M, mult * D)),
            ispec((TI * M, L)), gspec((M, L, D)), ispec((TI * M, 1)),
            ispec((TI * M, SH)),
            wspec((D, D)), wspec((1, D)), wspec((D, mult * D)),
            wspec((1, mult * D)),
            ispec((TI * M, H)), ispec((TI, D)), ispec((TI, L, D)),
        ],
        out_specs=(
            ispec((TI * M, D)), ispec((TI, D)), gspec((M, D)),
            gspec((M, mult * D)), gspec((M, mult * D)),
            ispec((TI * M, L)), gspec((M, L, D)), ispec((TI * M, 1)),
            ispec((TI * M, SH)),
            wspec((D, D)), wspec((1, D)), wspec((D, mult * D)),
            wspec((1, mult * D)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(t_ij.reshape(G, M * M, D), q, k, x_g, v,
      rl_ij.reshape(G, M * M, L), X,
      env_signed.reshape(G, M * M, 1), scale.reshape(G, M * M, SH),
      W_re, b_re.reshape(1, D), W_rs, b_rs.reshape(1, mult * D),
      sm.reshape(G, M * M, H), g_dh, g_dX)
    (g_t, g_q, g_k, g_xg, g_v, g_rl, g_X, g_env, g_scale,
     g_Wre, g_bre, g_Wrs, g_brs) = outs
    if not pos_grads:
        # the kernel never wrote these output blocks — replace the
        # uninitialised buffers with exact zeros
        g_rl = jnp.zeros_like(g_rl)
        g_env = jnp.zeros_like(g_env)
    return (g_t.reshape(G, M, M, D), g_q, g_k, g_xg, g_v,
            g_rl.reshape(G, M, M, L), g_X,
            g_env.reshape(G, M, M),
            g_scale.reshape((G, M, M, H) if SH == H else (G, M, M)),
            g_Wre, g_bre.reshape(D), g_Wrs, g_brs.reshape(mult * D))


@functools.lru_cache(maxsize=None)
def make_fused_gata(lmax: int, num_heads: int, sep_dir: bool,
                    sep_tensor: bool, interpret: bool = False,
                    pair_dtype=jnp.float32, pos_grads: bool = True):
    """Build the trainable fused step: Pallas forward + Pallas backward
    wired through jax.custom_vjp.

    Returns fn(t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale, W_re,
    b_re, W_rs, b_rs) -> (d_h, dX).  All tensor inputs are
    differentiable (env_signed/rl_ij carry the position gradient for
    force training; the masked region contributes zero).

    ``pos_grads=False`` (energy-only training, where positions are
    never differentiated) makes the VJP return ZEROS for the rl_ij and
    env_signed cotangents instead of computing them — do not use it
    under ``jax.grad`` w.r.t. positions.
    """
    kw = dict(lmax=lmax, num_heads=num_heads, sep_dir=sep_dir,
              sep_tensor=sep_tensor, interpret=interpret,
              pair_dtype=pair_dtype)

    @jax.custom_vjp
    def fused(*args):
        d_h, dX, _ = _pallas_forward(*args, **kw)
        return d_h, dX

    def fwd(*args):
        d_h, dX, sm = _pallas_forward(*args, **kw)
        return (d_h, dX), (args, sm)

    def bwd(res, cots):
        args, sm = res
        g_dh, g_dX = cots
        grads = _pallas_backward(*args, sm, g_dh, g_dX, **kw,
                                 pos_grads=pos_grads)
        # custom_vjp requires cotangent dtypes == primal dtypes (e.g.
        # bf16 t_ij under edge_state_pair_dtype)
        return tuple(g.astype(a.dtype) for g, a in zip(grads, args))

    fused.defvjp(fwd, bwd)
    return fused
