"""Fused dense-GATA message+aggregate Pallas kernel.

One grid step per graph computes, entirely in VMEM:

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
per-degree tensor) are processed sequentially so peak VMEM stays well
under the ~16 MB budget.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gotennet_tpu.ops.spherical import degree_slices

__all__ = ["fused_gata_message"]


def _kernel(t_ref, q_ref, k_ref, xg_ref, v_ref, rl_ref, x_ref, env_ref,
            scale_ref, wre_ref, bre_ref, wrs_ref, brs_ref,
            dh_ref, dx_ref, attn_ref, *, M, D, H, lmax, mult, sep_dir,
            sep_tensor):
    f32 = jnp.float32
    t2 = t_ref[0]                           # [MM, D]

    # --- attention filter + SDDMM logits ----------------------------
    ta = jnp.dot(t2, wre_ref[...], preferred_element_type=f32)
    ta = ta + bre_ref[...]
    ta = ta * jax.lax.logistic(ta)          # silu / swish
    q = q_ref[0]                            # [M, D]
    k = k_ref[0]
    qrep = jnp.repeat(q, M, axis=0)         # [(i j), d] — q varies per i
    krep = jnp.tile(k, (M, 1))              # k varies per j
    p = ta * qrep * krep
    # per-head lane-block reduction via indicator matmul [D, H]
    dh_per = D // H
    col = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // dh_per
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    sel = (col == head).astype(f32)
    logits = jnp.dot(p, sel, preferred_element_type=f32)  # [MM, H]

    # env carries cutoff*pair_mask (>= 0) for valid pairs, -1 invalid:
    # the sign encodes the pair mask so one input serves both purposes
    env = env_ref[0]                        # [MM, 1]
    valid = env >= 0.0
    envp = jnp.maximum(env, 0.0)

    neg = jnp.float32(-1e30)
    logits = jnp.where(valid, logits, neg)
    l3 = logits.reshape(M, M, H)
    mx = jnp.max(l3, axis=1, keepdims=True)             # [M, 1, H]
    ex = jnp.exp(l3 - mx) * valid.reshape(M, M, 1)
    denom = jnp.sum(ex, axis=1, keepdims=True) + 1e-16  # [M, 1, H]
    attn = (ex / denom).reshape(M * M, H)
    attn = attn * scale_ref[0]              # [MM, H] * [MM, 1]
    attn_ref[0] = attn

    xg = xg_ref[0]                          # [M, mult*D]
    v = v_ref[0]
    e_per = (mult * D) // H                 # channels per head

    def group(co):
        """o for channel block [co, co+D): [MM, D]."""
        tf = jnp.dot(t2, wrs_ref[:, co:co + D],
                     preferred_element_type=f32) + brs_ref[:, co:co + D]
        # per-channel head coefficient via indicator matmul [H, D]
        ch = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) + co
        hsel = (ch // e_per == jax.lax.broadcasted_iota(
            jnp.int32, (H, D), 0)).astype(f32)
        attn_c = jnp.dot(attn, hsel, preferred_element_type=f32)  # [MM, D]
        xg_j = jnp.tile(xg[:, co:co + D], (M, 1))
        v_j = jnp.tile(v[:, co:co + D], (M, 1))
        return tf * xg_j * envp + attn_c * v_j

    # --- scalar group -> d_h ----------------------------------------
    o_s = group(0)
    dh_ref[0] = jnp.sum(o_s.reshape(M, M, D), axis=1)

    # --- steerable groups -> dX -------------------------------------
    rl = rl_ref[0]                          # [MM, L]
    off = D
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_d = group(off + (l * D if sep_dir else 0)).reshape(M, M, D)
        for m in range(lo, hi):
            rl_m = rl[:, m:m + 1].reshape(M, M, 1)
            dx_ref[0, :, m, :] = jnp.sum(o_d * rl_m, axis=1)
    off += (lmax if sep_dir else 1) * D
    for l, (lo, hi) in enumerate(degree_slices(lmax)):
        o_t = group(off + (l * D if sep_tensor else 0)).reshape(M, M, D)
        for m in range(lo, hi):
            x_m = x_ref[0, :, m, :]         # [M(j), D]
            acc = jnp.sum(o_t * x_m[None, :, :], axis=1)
            dx_ref[0, :, m, :] = dx_ref[0, :, m, :] + acc


@functools.partial(jax.jit, static_argnames=("lmax", "num_heads", "sep_dir",
                                             "sep_tensor", "interpret"))
def fused_gata_message(t_ij, q, k, x_g, v, rl_ij, X, env_signed, scale,
                       W_re, b_re, W_rs, b_rs, *, lmax: int, num_heads: int,
                       sep_dir: bool, sep_tensor: bool,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused message+aggregate step.

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
            sqrt(n_edges)/sqrt(D); zero rows are fine).
        W_re/b_re/W_rs/b_rs: filter projection parameters.

    Returns:
        (d_h [G, M, D], dX [G, M, L, D], attn [G, M, M, H])
    """
    G, M, _, D = t_ij.shape
    L = rl_ij.shape[-1]
    H = num_heads
    mult = W_rs.shape[1] // D

    kern = functools.partial(
        _kernel, M=M, D=D, H=H, lmax=lmax, mult=mult, sep_dir=sep_dir,
        sep_tensor=sep_tensor)

    def spec(shape):
        return pl.BlockSpec((1,) + shape, lambda g: (g,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((G, M, D), jnp.float32),
        jax.ShapeDtypeStruct((G, M, L, D), jnp.float32),
        jax.ShapeDtypeStruct((G, M * M, H), jnp.float32),
    )
    d_h, dX, attn = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            spec((M * M, D)), spec((M, D)), spec((M, D)),
            spec((M, mult * D)), spec((M, mult * D)),
            spec((M * M, L)), spec((M, L, D)), spec((M * M, 1)),
            spec((M * M, 1)),
            wspec((D, D)), wspec((1, D)), wspec((D, mult * D)),
            wspec((1, mult * D)),
        ],
        out_specs=(spec((M, D)), spec((M, L, D)), spec((M * M, H))),
        out_shape=out_shapes,
        interpret=interpret,
    )(t_ij.reshape(G, M * M, D), q, k, x_g, v,
      rl_ij.reshape(G, M * M, L), X,
      env_signed.reshape(G, M * M, 1), scale.reshape(G, M * M, 1),
      W_re, b_re.reshape(1, D), W_rs, b_rs.reshape(1, mult * D))
    return d_h, dX, attn.reshape(G, M, M, H)
