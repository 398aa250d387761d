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
from gotennet_tpu.ops.spherical import degree_slices

__all__ = ["make_fused_htr"]


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
