"""Fused HTR edge-update Pallas kernel (dense layout).

Computes the GATA edge update (reference gotennet.py:561-611, in the
algebraically expanded rejection form of ``GATADense``) in one kernel
per graph, with an analytic Pallas backward wired via
``jax.custom_vjp``:

    z    = t_ij @ W_g + b_g           (gamma_t single layer)
    gt   = silu(z)
    w    = sum_l [ S_l - pq_l * pk_l * (2 - r2_l) ]      (rej=True)
    S_l  = sum_{m in l} EQ_i,m,c * EK_j,m,c
    pq_l = sum_{m in l} EQ_i,m,c * rl_ij,m   (pk analogous with EK_j)
    gw   = gate(w)                    ('' | sigmoid | tanh | silu)
    out  = t_ij + gt * gw

The pair-level intermediates (z, gt, S/pq/pk, w — each [M^2, C]) stay
in VMEM; the XLA formulation materializes them through HBM and they
showed up as ~1/5 of the fused-message step profile (PERF.md).

EQ/EK are computed node-level in XLA (cheap [M, L, C] matmuls; their
parameter grads flow through this kernel's g_eq/g_ek outputs).

Covers the flagship grammar (``edge_updates=True``) plus
norej/gated/gatedt/act; configs using mlp/mlpa/linw/ln stay on the
XLA path (GATADense falls back automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gotennet_tpu.ops.pallas.fused_gata import _pick_i_tile
from gotennet_tpu.ops.pallas.fused_ell import (
    _onehot, _pick_rows, capped_pairs)
from gotennet_tpu.ops.spherical import degree_slices

__all__ = ["make_fused_htr", "make_fused_htr_ell",
           "make_fused_htr_ell_chunked"]


def _silu_grad(z, sig):
    return sig + z * sig * (1.0 - sig)


def _gate_fwd(w, gate):
    if gate == "gated":
        return jax.lax.logistic(w)
    if gate == "gatedt":
        return jnp.tanh(w)
    if gate == "act":
        return w * jax.lax.logistic(w)
    return w


def _gate_grad(w, gw, gate):
    """d gate(w) / d w, given w and gw = gate(w)."""
    if gate == "gated":
        return gw * (1.0 - gw)
    if gate == "gatedt":
        return 1.0 - gw * gw
    if gate == "act":
        sig = jax.lax.logistic(w)
        return _silu_grad(w, sig)
    return jnp.ones_like(w)


def _slices(lmax, sep_htr):
    if sep_htr:
        return degree_slices(lmax)
    L = (lmax + 1) ** 2 - 1
    return ((0, L),)


def _kernel(t_ref, eq_ref, ek_ref, rl_ref, wg_ref, bg_ref, out_ref, *,
            TI, M, D, lmax, sep_htr, rej, gate, pair_dtype):
    f32 = jnp.float32
    pd = pair_dtype
    TB = TI * M
    t2 = t_ref[0]                           # [TB, D]
    z = jnp.dot(t2.astype(pd), wg_ref[...].astype(pd),
                preferred_element_type=f32) + bg_ref[...]
    gt = z * jax.lax.logistic(z)            # silu

    eq = eq_ref[0]                          # [TI, L, C]
    ek = ek_ref[0]                          # [M, L, C]
    rl = rl_ref[0]                          # [TB, L]

    w = jnp.zeros((TB, D), f32)
    for lo, hi in _slices(lmax, sep_htr):
        S = jnp.zeros((TB, D), pd)
        pq = jnp.zeros((TB, D), pd)
        pk = jnp.zeros((TB, D), pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), M, axis=0)  # i-major
            ekm = jnp.tile(ek[:, m, :].astype(pd), (TI, 1))      # j-minor
            S = S + eqm * ekm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                pq = pq + eqm * rlm
                pk = pk + ekm * rlm
        if rej:
            r2 = jnp.sum(rl[:, lo:hi] ** 2, axis=1, keepdims=True)
            w = w + S.astype(f32) - (pq * pk).astype(f32) * (2.0 - r2)
        else:
            w = w + S.astype(f32)

    out_ref[0] = t2 + gt * _gate_fwd(w, gate)


def _bwd_kernel(t_ref, eq_ref, ek_ref, rl_ref, wg_ref, bg_ref, g_ref,
                gt_out_ref, geq_ref, gek_ref, grl_ref, gwg_ref, gbg_ref,
                *, TI, M, D, lmax, sep_htr, rej, gate, pair_dtype):
    """Analytic VJP of _kernel; weight grads accumulate across the
    sequential grid, g_ek across each graph's i-tiles."""
    f32 = jnp.float32
    pd = pair_dtype
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    TB = TI * M

    @pl.when(first)
    def _init():
        gwg_ref[...] = jnp.zeros(gwg_ref.shape, f32)
        gbg_ref[...] = jnp.zeros(gbg_ref.shape, f32)

    @pl.when(pl.program_id(1) == 0)
    def _init_j():
        gek_ref[...] = jnp.zeros(gek_ref.shape, f32)

    t2 = t_ref[0]
    eq = eq_ref[0]                          # [TI, L, C]
    ek = ek_ref[0]                          # [M, L, C]
    rl = rl_ref[0]
    g = g_ref[0]                            # [TB, D] cotangent of out

    # recompute forward pieces
    z = jnp.dot(t2.astype(pd), wg_ref[...].astype(pd),
                preferred_element_type=f32) + bg_ref[...]
    sig = jax.lax.logistic(z)
    gt = z * sig

    w = jnp.zeros((TB, D), f32)
    saved = []                              # (pq, pk, a) per slice
    for lo, hi in _slices(lmax, sep_htr):
        S = jnp.zeros((TB, D), pd)
        pq = jnp.zeros((TB, D), pd)
        pk = jnp.zeros((TB, D), pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), M, axis=0)
            ekm = jnp.tile(ek[:, m, :].astype(pd), (TI, 1))
            S = S + eqm * ekm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                pq = pq + eqm * rlm
                pk = pk + ekm * rlm
        if rej:
            r2 = jnp.sum(rl[:, lo:hi] ** 2, axis=1, keepdims=True)
            a = (2.0 - r2).astype(f32)
            w = w + S.astype(f32) - (pq * pk).astype(f32) * a
            saved.append((pq, pk, a))
        else:
            w = w + S.astype(f32)
            saved.append(None)

    gw_val = _gate_fwd(w, gate)
    g_gt = g * gw_val
    g_w = g * gt * _gate_grad(w, gw_val, gate)   # [MM, D] f32

    # gamma_t backward
    g_z = g_gt * _silu_grad(z, sig)
    gt_acc = g + jax.lax.dot_general(
        g_z.astype(pd), wg_ref[...].astype(pd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    gwg_ref[...] = gwg_ref[...] + jax.lax.dot_general(
        t2.astype(pd), g_z.astype(pd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    gbg_ref[...] = gbg_ref[...] + jnp.sum(g_z, axis=0, keepdims=True)
    gt_out_ref[0] = gt_acc

    # pair-term backward, per degree block (pq/pk/a reused from the
    # forward recompute above)
    g_w_p = g_w.astype(pd)
    for (lo, hi), sv in zip(_slices(lmax, sep_htr), saved):
        if rej:
            pq, pk, a = sv
            g_pq = -(g_w * pk.astype(f32)) * a
            g_pk = -(g_w * pq.astype(f32)) * a
            g_r2 = jnp.sum(g_w * (pq * pk).astype(f32), axis=1,
                           keepdims=True)
            g_pq_p = g_pq.astype(pd)
            g_pk_p = g_pk.astype(pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), M, axis=0)
            ekm = jnp.tile(ek[:, m, :].astype(pd), (TI, 1))
            # g_eq: sum over j (pairs are i-major); g_ek: sum over i
            ge = g_w_p * ekm
            gk = g_w_p * eqm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                ge = ge + g_pq_p * rlm
                gk = gk + g_pk_p * rlm
                grl_ref[0, :, m:m + 1] = (
                    jnp.sum(g_pq * eqm.astype(f32)
                            + g_pk * ekm.astype(f32),
                            axis=1, keepdims=True)
                    + 2.0 * rl[:, m:m + 1] * g_r2)
            else:
                grl_ref[0, :, m:m + 1] = jnp.zeros((TB, 1), f32)
            geq_ref[0, :, m, :] = jnp.sum(
                ge.astype(f32).reshape(TI, M, D), axis=1)
            gek_ref[0, :, m, :] = gek_ref[0, :, m, :] + jnp.sum(
                gk.astype(f32).reshape(TI, M, D), axis=0)


@functools.lru_cache(maxsize=None)
def make_fused_htr(lmax: int, sep_htr: bool, rej: bool, gate: str,
                   interpret: bool = False, pair_dtype=jnp.float32):
    """Build the trainable fused HTR edge update.

    Returns ``fn(t_ij, EQ, EK, rl_ij, W_g, b_g) -> t_out`` with
    ``t_ij`` [G, M, M, D], ``EQ``/``EK`` [G, M, L, C=D],
    ``rl_ij`` [G, M, M, L]; all inputs differentiable.
    """
    if gate not in ("", "gated", "gatedt", "act"):
        raise ValueError(f"unsupported gate {gate!r}")

    def fwd_call(t_ij, eq, ek, rl_ij, W_g, b_g):
        G, M, _, D = t_ij.shape
        L = rl_ij.shape[-1]
        TI = _pick_i_tile(M)
        kern = functools.partial(
            _kernel, TI=TI, M=M, D=D, lmax=lmax, sep_htr=sep_htr,
            rej=rej, gate=gate, pair_dtype=pair_dtype)

        def ispec(shape):
            return pl.BlockSpec(
                (1,) + shape,
                lambda g, i: (g, i) + (0,) * (len(shape) - 1),
                memory_space=pltpu.VMEM)

        def gspec(shape):
            return pl.BlockSpec((1,) + shape,
                                lambda g, i: (g,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda g, i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kern, grid=(G, M // TI),
            in_specs=[ispec((TI * M, D)), ispec((TI, L, D)),
                      gspec((M, L, D)), ispec((TI * M, L)),
                      wspec((D, D)), wspec((1, D))],
            out_specs=ispec((TI * M, D)),
            out_shape=jax.ShapeDtypeStruct((G, M * M, D), jnp.float32),
            interpret=interpret,
        )(t_ij.reshape(G, M * M, D), eq, ek, rl_ij.reshape(G, M * M, L),
          W_g, b_g.reshape(1, D))
        return out.reshape(G, M, M, D)

    def bwd_call(t_ij, eq, ek, rl_ij, W_g, b_g, g_out):
        G, M, _, D = t_ij.shape
        L = rl_ij.shape[-1]
        TI = _pick_i_tile(M, max_pairs=2048)
        kern = functools.partial(
            _bwd_kernel, TI=TI, M=M, D=D, lmax=lmax, sep_htr=sep_htr,
            rej=rej, gate=gate, pair_dtype=pair_dtype)

        def ispec(shape):
            return pl.BlockSpec(
                (1,) + shape,
                lambda g, i: (g, i) + (0,) * (len(shape) - 1),
                memory_space=pltpu.VMEM)

        def gspec(shape):
            return pl.BlockSpec((1,) + shape,
                                lambda g, i: (g,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda g, i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        f32 = jnp.float32
        outs = pl.pallas_call(
            kern, grid=(G, M // TI),
            in_specs=[ispec((TI * M, D)), ispec((TI, L, D)),
                      gspec((M, L, D)), ispec((TI * M, L)),
                      wspec((D, D)), wspec((1, D)),
                      ispec((TI * M, D))],
            out_specs=(ispec((TI * M, D)), ispec((TI, L, D)),
                       gspec((M, L, D)), ispec((TI * M, L)),
                       wspec((D, D)), wspec((1, D))),
            out_shape=(jax.ShapeDtypeStruct((G, M * M, D), f32),
                       jax.ShapeDtypeStruct((G, M, L, D), f32),
                       jax.ShapeDtypeStruct((G, M, L, D), f32),
                       jax.ShapeDtypeStruct((G, M * M, L), f32),
                       jax.ShapeDtypeStruct((D, D), f32),
                       jax.ShapeDtypeStruct((1, D), f32)),
            interpret=interpret,
        )(t_ij.reshape(G, M * M, D), eq, ek, rl_ij.reshape(G, M * M, L),
          W_g, b_g.reshape(1, D), g_out.reshape(G, M * M, D))
        g_t, g_eq, g_ek, g_rl, g_wg, g_bg = outs
        return (g_t.reshape(G, M, M, D), g_eq, g_ek,
                g_rl.reshape(G, M, M, L), g_wg, g_bg.reshape(D))

    @jax.custom_vjp
    def fused(t_ij, eq, ek, rl_ij, W_g, b_g):
        return fwd_call(t_ij, eq, ek, rl_ij, W_g, b_g)

    def fwd(*args):
        return fwd_call(*args), args

    def bwd(args, g_out):
        grads = bwd_call(*args, g_out)
        # custom_vjp requires cotangent dtypes == primal dtypes (e.g.
        # bf16 t_ij under edge_state_pair_dtype)
        return tuple(g.astype(a.dtype) for g, a in zip(grads, args))

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------
# ELL layout: HTR over [N, K] neighbor rows with in-kernel one-hot
# gathers of the EK table — the 10^3-atom companion (profiling at
# 600-700 atoms shows the XLA [N, K, L, C] rejection chains are the
# single largest cost after the fused message kernel, PERF.md).
# ---------------------------------------------------------------------


def _ell_htr_kernel(t_ref, eq_ref, ek_ref, rl_ref, nbr_ref, wg_ref,
                    bg_ref, out_ref, *, TB, K, N, D, lmax, sep_htr,
                    rej, gate, pair_dtype):
    """One grid step = one TB-row destination block (TB*K pairs).
    ``N`` is the EK-table row count (window width under chunking)."""
    f32 = jnp.float32
    pd = pair_dtype
    L = (lmax + 1) ** 2 - 1
    t2 = t_ref[...]                         # [TBK, D]
    z = jnp.dot(t2.astype(pd), wg_ref[...].astype(pd),
                preferred_element_type=f32) + bg_ref[...]
    gt = z * jax.lax.logistic(z)            # silu

    oh = _onehot(nbr_ref[...], N, pd)       # [TBK, N]
    # one gather matmul for all L*C columns (the EK table arrives
    # pre-flattened [N, L*C]: in-kernel 3D->2D shape casts only lower
    # when C is lane-aligned), sliced per m below
    ekj = jnp.dot(oh, ek_ref[...].astype(pd),
                  preferred_element_type=f32)  # [TBK, L*C] f32
    eq = eq_ref[...]                        # [TB, L, C]
    rl = rl_ref[...]                        # [TBK, L]

    w = jnp.zeros(z.shape, f32)
    for lo, hi in _slices(lmax, sep_htr):
        S = jnp.zeros(z.shape, pd)
        pq = jnp.zeros(z.shape, pd)
        pk = jnp.zeros(z.shape, pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), K, axis=0)
            ekm = ekj[:, m * D:(m + 1) * D].astype(pd)
            S = S + eqm * ekm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                pq = pq + eqm * rlm
                pk = pk + ekm * rlm
        if rej:
            r2 = jnp.sum(rl[:, lo:hi] ** 2, axis=1, keepdims=True)
            w = w + S.astype(f32) - (pq * pk).astype(f32) * (2.0 - r2)
        else:
            w = w + S.astype(f32)

    out_ref[...] = t2 + gt * _gate_fwd(w, gate)


def _ell_htr_bwd_kernel(t_ref, eq_ref, ek_ref, rl_ref, nbr_ref, wg_ref,
                        bg_ref, g_ref, gt_out_ref, geq_ref, gek_ref,
                        grl_ref, gwg_ref, gbg_ref, *, TB, K, N, D, lmax,
                        sep_htr, rej, gate, pair_dtype):
    """Analytic VJP of _ell_htr_kernel; EK-table and weight grads
    accumulate across the sequential grid (gather-transpose matmuls,
    like the fused message kernel's backward)."""
    f32 = jnp.float32
    pd = pair_dtype
    L = (lmax + 1) ** 2 - 1
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        gek_ref[...] = jnp.zeros(gek_ref.shape, f32)
        gwg_ref[...] = jnp.zeros(gwg_ref.shape, f32)
        gbg_ref[...] = jnp.zeros(gbg_ref.shape, f32)

    t2 = t_ref[...]
    eq = eq_ref[...]
    rl = rl_ref[...]
    g = g_ref[...]                          # [TBK, D]
    oh = _onehot(nbr_ref[...], N, pd)
    ekj = jnp.dot(oh, ek_ref[...].astype(pd),   # ek pre-flattened
                  preferred_element_type=f32)

    # recompute forward pieces
    z = jnp.dot(t2.astype(pd), wg_ref[...].astype(pd),
                preferred_element_type=f32) + bg_ref[...]
    sig = jax.lax.logistic(z)
    gt = z * sig

    w = jnp.zeros(z.shape, f32)
    saved = []
    for lo, hi in _slices(lmax, sep_htr):
        S = jnp.zeros(z.shape, pd)
        pq = jnp.zeros(z.shape, pd)
        pk = jnp.zeros(z.shape, pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), K, axis=0)
            ekm = ekj[:, m * D:(m + 1) * D].astype(pd)
            S = S + eqm * ekm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                pq = pq + eqm * rlm
                pk = pk + ekm * rlm
        if rej:
            r2 = jnp.sum(rl[:, lo:hi] ** 2, axis=1, keepdims=True)
            a = (2.0 - r2).astype(f32)
            w = w + S.astype(f32) - (pq * pk).astype(f32) * a
            saved.append((pq, pk, a))
        else:
            w = w + S.astype(f32)
            saved.append(None)

    gw_val = _gate_fwd(w, gate)
    g_gt = g * gw_val
    g_w = g * gt * _gate_grad(w, gw_val, gate)

    # gamma_t backward
    g_z = g_gt * _silu_grad(z, sig)
    gt_out_ref[...] = g + jax.lax.dot_general(
        g_z.astype(pd), wg_ref[...].astype(pd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    gwg_ref[...] = gwg_ref[...] + jax.lax.dot_general(
        t2.astype(pd), g_z.astype(pd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    gbg_ref[...] = gbg_ref[...] + jnp.sum(g_z, axis=0, keepdims=True)

    g_w_p = g_w.astype(pd)
    for (lo, hi), sv in zip(_slices(lmax, sep_htr), saved):
        if rej:
            pq, pk, a = sv
            g_pq = -(g_w * pk.astype(f32)) * a
            g_pk = -(g_w * pq.astype(f32)) * a
            g_r2 = jnp.sum(g_w * (pq * pk).astype(f32), axis=1,
                           keepdims=True)
            g_pq_p = g_pq.astype(pd)
            g_pk_p = g_pk.astype(pd)
        for m in range(lo, hi):
            eqm = jnp.repeat(eq[:, m, :].astype(pd), K, axis=0)
            ekm = ekj[:, m * D:(m + 1) * D].astype(pd)
            ge = g_w_p * ekm
            gk = g_w_p * eqm
            if rej:
                rlm = rl[:, m:m + 1].astype(pd)
                ge = ge + g_pq_p * rlm
                gk = gk + g_pk_p * rlm
                grl_ref[:, m:m + 1] = (
                    jnp.sum(g_pq * eqm.astype(f32)
                            + g_pk * ekm.astype(f32),
                            axis=1, keepdims=True)
                    + 2.0 * rl[:, m:m + 1] * g_r2)
            else:
                grl_ref[:, m:m + 1] = jnp.zeros((TB * K, 1), f32)
            geq_ref[:, m, :] = jnp.sum(
                ge.astype(f32).reshape(TB, K, D), axis=1)
            gek_ref[:, m * D:(m + 1) * D] = (
                gek_ref[:, m * D:(m + 1) * D] + jax.lax.dot_general(
                    oh, gk,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32))


def _ell_htr_fwd_call(t, eq, ek, rl, nbr, W_g, b_g, *, lmax, sep_htr,
                      rej, gate, interpret, pair_dtype, max_pairs):
    NR, K, D = t.shape
    N = ek.shape[0]
    L = rl.shape[-1]
    TB = _pick_rows(NR, K, max_pairs)
    NB = NR // TB
    kern = functools.partial(
        _ell_htr_kernel, TB=TB, K=K, N=N, D=D, lmax=lmax,
        sep_htr=sep_htr, rej=rej, gate=gate, pair_dtype=pair_dtype)

    def pspec(f):
        return pl.BlockSpec((TB * K, f), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    def rspec(*shape):
        return pl.BlockSpec((TB,) + shape,
                            lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def fspec(*shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern, grid=(NB,),
        in_specs=[pspec(D), rspec(L, D), fspec(N, L * D), pspec(L),
                  pspec(1), fspec(D, D), fspec(1, D)],
        out_specs=pspec(D),
        out_shape=jax.ShapeDtypeStruct((NR * K, D), jnp.float32),
        interpret=interpret,
    )(t.reshape(NR * K, D), eq, ek.reshape(N, L * D),
      rl.reshape(NR * K, L),
      nbr.reshape(NR * K, 1).astype(jnp.int32), W_g, b_g.reshape(1, D))
    return out.reshape(NR, K, D)


def _ell_htr_bwd_call(t, eq, ek, rl, nbr, W_g, b_g, g_out, *, lmax,
                      sep_htr, rej, gate, interpret, pair_dtype,
                      max_pairs):
    NR, K, D = t.shape
    N = ek.shape[0]
    L = rl.shape[-1]
    TB = _pick_rows(NR, K, max_pairs // 2)
    NB = NR // TB
    kern = functools.partial(
        _ell_htr_bwd_kernel, TB=TB, K=K, N=N, D=D, lmax=lmax,
        sep_htr=sep_htr, rej=rej, gate=gate, pair_dtype=pair_dtype)

    def pspec(f):
        return pl.BlockSpec((TB * K, f), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    def rspec(*shape):
        return pl.BlockSpec((TB,) + shape,
                            lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def fspec(*shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kern, grid=(NB,),
        in_specs=[pspec(D), rspec(L, D), fspec(N, L * D), pspec(L),
                  pspec(1), fspec(D, D), fspec(1, D), pspec(D)],
        out_specs=(pspec(D), rspec(L, D), fspec(N, L * D), pspec(L),
                   fspec(D, D), fspec(1, D)),
        out_shape=(jax.ShapeDtypeStruct((NR * K, D), f32),
                   jax.ShapeDtypeStruct((NR, L, D), f32),
                   jax.ShapeDtypeStruct((N, L * D), f32),
                   jax.ShapeDtypeStruct((NR * K, L), f32),
                   jax.ShapeDtypeStruct((D, D), f32),
                   jax.ShapeDtypeStruct((1, D), f32)),
        interpret=interpret,
    )(t.reshape(NR * K, D), eq, ek.reshape(N, L * D),
      rl.reshape(NR * K, L),
      nbr.reshape(NR * K, 1).astype(jnp.int32), W_g, b_g.reshape(1, D),
      g_out.reshape(NR * K, D))
    g_t, g_eq, g_ek, g_rl, g_wg, g_bg = outs
    return (g_t.reshape(NR, K, D), g_eq, g_ek.reshape(N, L, D),
            g_rl.reshape(NR, K, L), g_wg, g_bg.reshape(b_g.shape))


@functools.lru_cache(maxsize=None)
def make_fused_htr_ell(lmax: int, sep_htr: bool, rej: bool, gate: str,
                       interpret: bool = False, pair_dtype=jnp.float32,
                       max_pairs: int = 4096):
    """Fused HTR edge update for the ELL layout.

    Returns ``fn(t, EQ, EK, rl, nbr, W_g, b_g) -> t_out`` with ``t``
    [NR, K, D] pair rows, ``EQ`` [NR, L, C=D] center rows, ``EK``
    [NT, L, C] the (replicated) source table, ``rl`` [NR, K, L] and
    ``nbr`` [NR, K] int32 indices into EK (float0 cotangent).  Same
    expanded-rejection math as the dense kernel (reference
    gotennet.py:561-611); EK lookups are in-kernel one-hot matmuls
    whose backward is the transposed matmul into a full-table
    accumulator — scatter-free in both directions.
    """
    import numpy as np

    if gate not in ("", "gated", "gatedt", "act"):
        raise ValueError(f"unsupported gate {gate!r}")
    kw = dict(lmax=lmax, sep_htr=sep_htr, rej=rej, gate=gate,
              interpret=interpret, pair_dtype=pair_dtype,
              max_pairs=max_pairs)

    @jax.custom_vjp
    def fused(t, eq, ek, rl, nbr, W_g, b_g):
        return _ell_htr_fwd_call(t, eq, ek, rl, nbr, W_g, b_g, **kw)

    def fwd(*args):
        return _ell_htr_fwd_call(*args, **kw), args

    def bwd(args, g_out):
        grads = _ell_htr_bwd_call(*args, g_out, **kw)
        g_t, g_eq, g_ek, g_rl, g_wg, g_bg = grads
        out = (g_t, g_eq, g_ek, g_rl,
               np.zeros(args[4].shape, jax.dtypes.float0), g_wg, g_bg)
        return tuple(
            g if g.dtype == jax.dtypes.float0 else g.astype(a.dtype)
            for g, a in zip(out, args))

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def make_fused_htr_ell_chunked(lmax: int, sep_htr: bool, rej: bool,
                               gate: str, interpret: bool = False,
                               pair_dtype=jnp.float32,
                               max_pairs: int = 4096, *, cr: int,
                               W: int, C: int):
    """Chunked fused HTR-ELL for EK tables beyond the VMEM bound —
    the same outer-custom_vjp structure as ``make_fused_ell_chunked``
    (ops/pallas/fused_ell.py): windows sliced inside the scan body in
    both directions, EK gradients accumulated into a full-table
    ``[NT, L, C]`` carry, so no ``[C, W, L, C]`` stacked tensor is
    materialized.  ``fn(t, EQ, EK, rl, nbr, ws, W_g, b_g)``: ``ws``
    is the [C] int32 window-start vector."""
    import numpy as np

    kw = dict(lmax=lmax, sep_htr=sep_htr, rej=rej, gate=gate,
              interpret=interpret, pair_dtype=pair_dtype,
              max_pairs=max_pairs)

    def _win(tab, wsc):
        return jax.lax.dynamic_slice_in_dim(tab, wsc, W, 0)

    def _run_fwd(args):
        t, eq, ek, rl, nbr, ws, W_g, b_g = args
        NR, K, D = t.shape
        L = rl.shape[-1]
        # EK windows share VMEM with the pair slabs (capped_pairs
        # docstring; HTR fwd measured 99M at W=1920/TBK=3168)
        kw_f = dict(kw, max_pairs=capped_pairs(
            W * L * D * 4 + 2 * W * D * 4, 100 * D, kw["max_pairs"]))

        def resh(a):
            return a.reshape((C, cr) + a.shape[1:])

        rel = (nbr.reshape(C, cr, K) - ws[:, None, None]).astype(jnp.int32)

        def body(_, xs):
            wsc, tc, eqc, rlc, nbc = xs
            out = _ell_htr_fwd_call(tc, eqc, _win(ek, wsc), rlc, nbc,
                                    W_g, b_g, **kw_f)
            return None, out

        _, t_out = jax.lax.scan(body, None,
                                (ws, resh(t), resh(eq), resh(rl), rel))
        return t_out.reshape(NR, K, D)

    @jax.custom_vjp
    def fused(*args):
        return _run_fwd(args)

    def fwd(*args):
        return _run_fwd(args), args

    def bwd(args, g_out):
        t, eq, ek, rl, nbr, ws, W_g, b_g = args
        NR, K, D = t.shape
        L = rl.shape[-1]
        f32 = jnp.float32
        # _ell_htr_bwd_call halves max_pairs internally
        kw_b = dict(kw, max_pairs=2 * capped_pairs(
            2 * W * L * D * 4 + 6 * W * D * 4, 170 * D,
            kw["max_pairs"] // 2))

        def resh(a):
            return a.reshape((C, cr) + a.shape[1:])

        rel = (nbr.reshape(C, cr, K) - ws[:, None, None]).astype(jnp.int32)
        carry0 = (jnp.zeros(ek.shape, f32), jnp.zeros(W_g.shape, f32),
                  jnp.zeros(b_g.shape, f32))

        def body(carry, xs):
            gek, gwg, gbg = carry
            wsc, tc, eqc, rlc, nbc, gc = xs
            g_t, g_eq, g_ekw, g_rl, g_wg, g_bg = _ell_htr_bwd_call(
                tc, eqc, _win(ek, wsc), rlc, nbc, W_g, b_g, gc, **kw_b)
            seg = jax.lax.dynamic_slice_in_dim(gek, wsc, W, 0)
            gek = jax.lax.dynamic_update_slice_in_dim(
                gek, seg + g_ekw, wsc, 0)
            return (gek, gwg + g_wg, gbg + g_bg), (g_t, g_eq, g_rl)

        carry, ys = jax.lax.scan(
            body, carry0,
            (ws, resh(t), resh(eq), resh(rl), rel, resh(g_out)))
        gek, gwg, gbg = carry
        g_t, g_eq, g_rl = (y.reshape((NR,) + y.shape[2:]) for y in ys)
        grads = (g_t, g_eq, gek, g_rl,
                 np.zeros(nbr.shape, jax.dtypes.float0),
                 np.zeros(ws.shape, jax.dtypes.float0), gwg, gbg)
        return tuple(
            g if g.dtype == jax.dtypes.float0 else g.astype(a.dtype)
            for g, a in zip(grads, args))

    fused.defvjp(fwd, bwd)
    return fused
