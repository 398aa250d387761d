"""GotenNet in dense-block layout: batched [G, M, M] pair tensors.

Mathematically identical to the edge-list model (models/gotennet.py) —
same parameter tree, byte-for-byte interchangeable checkpoints — but
every neighborhood reduction is a batched matmul/einsum over the
j (neighbor) axis and attention softmax is a plain masked softmax.
This maps the hot path onto the MXU with zero scatter/gather/sort; on
a v5e chip it removes the scatter fusions that dominate the edge-list
profile (>2/3 of runtime).

Intended for small-molecule workloads (QM9: M=32).  The edge-list
model remains the path for large molecules and edge-partitioned
multi-chip runs; tests assert the two paths agree to fp32 tolerance.

The HTR vector rejection is evaluated in expanded form
   sum_m EQr.EKr = S - pq * pk * (2 - |r_l|^2)
(S, pq, pk pairwise inner products), which avoids materializing any
[G, M, M, 2l+1, C] tensor — an algebraic simplification of the
reference's edge_update (gotennet.py:561-611) with identical output.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from gotennet_tpu.graph.dense_batch import DenseBatch
from gotennet_tpu.models.gotennet import (
    EQFF,
    GotenNetConfig,
    _zero_padded_embed_init,
    parse_edge_updates,
)
from gotennet_tpu.nn.dense import MLP, Dense, get_weight_init
from gotennet_tpu.nn.norms import TensorLayerNorm
from gotennet_tpu.ops.activations import get_activation
from gotennet_tpu.ops.cutoffs import cosine_cutoff
from gotennet_tpu.ops.pallas.fused_gata import make_fused_gata
from gotennet_tpu.ops.pallas.fused_htr import make_fused_htr
from gotennet_tpu.ops.rbf import RadialBasis, get_rbf
from gotennet_tpu.ops.spherical import degree_slices, spherical_harmonics

__all__ = ["GotenNetDense"]

_NEG = -1e30  # masked logit value; exp(-1e30 - max) == 0 exactly in fp32
_SOFTMAX_EPS = 1e-16  # PyG softmax denominator guard, for path parity


class NodeInitDense(fnn.Module):
    """NodeInit in dense layout (same params as models.gotennet.NodeInit)."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, z, h, dist, phi, adj) -> jnp.ndarray:
        cfg = self.cfg
        act = get_activation(cfg.activation)
        d = cfg.n_atom_basis
        a_nbr = self.param("A_nbr", jax.nn.initializers.normal(1.0),
                           (cfg.max_z, d), jnp.float32)
        h_src = a_nbr[z]  # [G, M, D]
        env = cosine_cutoff(dist, cfg.cutoff)  # [G, M, M]
        # pair projection in pair_dtype (HBM-stream [G,M,M,D]); the
        # neighbor reduction accumulates f32
        pd = cfg.pair_dtype
        r_feat = Dense(d, activation=None, weight_init=cfg.weight_init,
                       bias_init=cfg.bias_init, dtype=pd,
                       name="W_ndp")(phi.astype(pd))
        r_feat = r_feat * (env * adj)[..., None].astype(pd)  # [G, M, M, D]
        m_i = jnp.einsum("gijd,gjd->gid", r_feat, h_src.astype(pd),
                         preferred_element_type=jnp.float32)
        fused = jnp.concatenate([h, m_i], axis=-1)
        return MLP([2 * d, d, d], activation=act, last_activation=None,
                   weight_init=cfg.weight_init, bias_init=cfg.bias_init,
                   norm="layer", name="W_nrd_nru")(fused)


class EdgeInitDense(fnn.Module):
    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, phi, h) -> jnp.ndarray:
        # pair projection + combine run in pair_dtype (pure HBM
        # streams over [G,M,M,*]); the edge state itself stays f32
        pd = self.cfg.pair_dtype
        w = Dense(self.cfg.n_atom_basis, activation=None,
                  weight_init="xavier_uniform", bias_init="zeros",
                  dtype=pd, name="W_erp")(phi.astype(pd))  # [G, M, M, D]
        hp = h.astype(pd)
        return ((hp[:, :, None, :] + hp[:, None, :, :]) * w).astype(
            jnp.float32)


class _LinearLeaf(fnn.Module):
    """Declares ``kernel``/``bias`` params identical to fnn.Dense but
    returns them raw (for handing to the fused Pallas kernel)."""

    features: int
    in_features: int
    weight_init: str
    bias_init: str
    use_bias: bool = True

    @fnn.compact
    def __call__(self):
        kernel = self.param("kernel", get_weight_init(self.weight_init),
                            (self.in_features, self.features), jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", get_weight_init(self.bias_init),
                          (self.features,), jnp.float32)
        return kernel, bias


class _LinearParams(fnn.Module):
    """Same parameter tree (``<name>/linear/{kernel,bias}``) and init RNG
    derivation as ``nn.dense.Dense`` — checkpoints are interchangeable
    between the fused and unfused dense paths."""

    features: int
    in_features: int
    weight_init: str
    bias_init: str
    use_bias: bool = True

    @fnn.compact
    def __call__(self):
        return _LinearLeaf(self.features, self.in_features,
                           self.weight_init, self.bias_init,
                           use_bias=self.use_bias, name="linear")()


class _MLPLayerParams(fnn.Module):
    """Param tree of a single-layer ``nn.dense.MLP``
    (``<name>/layers_0/linear/{kernel,bias}``), returned raw for the
    fused HTR kernel."""

    features: int
    in_features: int
    weight_init: str
    bias_init: str

    @fnn.compact
    def __call__(self):
        return _LinearParams(self.features, self.in_features,
                             self.weight_init, self.bias_init,
                             name="layers_0")()


class GATADense(fnn.Module):
    """GATA in dense layout (same params as models.gotennet.GATA)."""

    cfg: GotenNetConfig
    last_layer: bool = False
    deterministic: bool = True

    @fnn.compact
    def __call__(self, h, X, t_ij, rl_ij, dist, pair_mask, n_edges):
        cfg = self.cfg
        act = get_activation(cfg.activation)
        D = cfg.n_atom_basis
        H = cfg.num_heads
        Dh = D // H
        mult = cfg.multiplier
        info = parse_edge_updates(cfg.edge_updates)
        evec_dim = cfg.evec_dim or D
        emlp_dim = cfg.emlp_dim or D
        G, M = h.shape[:2]
        nd = None if cfg.node_dtype == jnp.float32 else cfg.node_dtype
        dense_kw = dict(weight_init=cfg.weight_init, bias_init=cfg.bias_init)

        if cfg.layernorm:
            h = fnn.LayerNorm(epsilon=1e-5, name="layernorm")(h)
        if cfg.steerable_norm:
            X = TensorLayerNorm(D, cfg.lmax, trainable=False,
                                name="tensor_layernorm")(X)

        if cfg.merge_proj:
            # One MXU dispatch per projection GROUP instead of one per
            # projection: kernels concatenate/stack at trace time (the
            # concats are loop-invariant, XLA hoists them out of the
            # accumulation scan) and the parameter tree is unchanged —
            # checkpoints interchangeable with the per-projection path.
            # At the QM9 operating point the per-chunk node matmuls are
            # dispatch/weight-load-bound ([~256, D] rows), so fewer,
            # wider matmuls win (PERF.md round 5).
            cd = nd or jnp.float32
            wq, bq = _LinearParams(D, D, **dense_kw, name="W_q")()
            wk, bk = _LinearParams(D, D, **dense_kw, name="W_k")()
            ws0, bs0 = _LinearParams(D, D, **dense_kw, name="gamma_s_0")()
            wv0, bv0 = _LinearParams(D, D, **dense_kw, name="gamma_v_0")()
            w1 = jnp.concatenate([wq, wk, ws0, wv0], axis=1).astype(cd)
            b1 = jnp.concatenate([bq, bk, bs0, bv0]).astype(cd)
            y1 = h.astype(cd) @ w1 + b1
            q, k = y1[..., :D], y1[..., D:2 * D]
            s0 = act(y1[..., 2 * D:3 * D])
            v0 = act(y1[..., 3 * D:])
            ws1, bs1 = _LinearParams(mult * D, D, **dense_kw,
                                     name="gamma_s_1")()
            wv1, bv1 = _LinearParams(mult * D, D, **dense_kw,
                                     name="gamma_v_1")()
            y2 = jnp.einsum("sgmd,sde->sgme", jnp.stack([s0, v0]),
                            jnp.stack([ws1, wv1]).astype(cd))
            y2 = y2 + jnp.stack([bs1, bv1]).astype(cd)[:, None, None, :]
            x_g, v = y2[0], y2[1]
        else:
            q = Dense(D, activation=None, **dense_kw, dtype=nd,
                      name="W_q")(h)  # [G,M,D]
            k = Dense(D, activation=None, **dense_kw, dtype=nd,
                      name="W_k")(h)

            x_g = Dense(D, activation=act, **dense_kw, dtype=nd,
                        name="gamma_s_0")(h)
            x_g = Dense(mult * D, activation=None, **dense_kw, dtype=nd,
                        name="gamma_s_1")(x_g)
            v = Dense(D, activation=act, **dense_kw, dtype=nd,
                      name="gamma_v_0")(h)
            v = Dense(mult * D, activation=None, **dense_kw, dtype=nd,
                      name="gamma_v_1")(v)

        pd = cfg.pair_dtype  # storage dtype for big per-pair tensors

        # fused=True implies silu/swish + aggr='add' (enforced by
        # GotenNetConfig.__post_init__ with a pointer to fused=False)
        if cfg.fused:
            # One Pallas kernel for W_re/W_rs projections + SDDMM +
            # masked softmax + pair features + j-aggregation; the
            # [G,M,M,mult*D] pair tensor never touches HBM.  Backward
            # is the analytic Pallas VJP (make_fused_gata).
            wre_k, wre_b = _LinearParams(D, D, cfg.weight_init,
                                         cfg.bias_init, name="W_re")()
            wrs_k, wrs_b = _LinearParams(mult * D, D, cfg.weight_init,
                                         cfg.bias_init, name="W_rs")()
            env_signed = jnp.where(pair_mask,
                                   cosine_cutoff(dist, cfg.cutoff), -1.0)
            if cfg.scale_edge:
                scale = jnp.sqrt(n_edges) / math.sqrt(D)
            else:
                scale = jnp.full_like(dist, 1.0 / math.sqrt(D))
            if cfg.attn_dropout > 0.0 and not self.deterministic:
                # attention dropout folds into the per-head post-softmax
                # scale (same placement as the unfused path's Dropout)
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - cfg.attn_dropout,
                    (G, M, M, H))
                scale = (scale[..., None] * keep.astype(scale.dtype)
                         / (1.0 - cfg.attn_dropout))
            fused_fn = make_fused_gata(
                cfg.lmax, H, cfg.sep_dir, cfg.sep_tensor,
                interpret=jax.default_backend() != "tpu",
                pair_dtype=pd,
                # None = unresolved (bare-module use): keep full grads
                pos_grads=cfg.pos_grads is not False)
            d_h, dX = fused_fn(t_ij, q, k, x_g, v, rl_ij, X, env_signed,
                               scale, wre_k, wre_b, wrs_k, wrs_b)
        else:
            d_h, dX = self._unfused_message(
                cfg, act, t_ij, q, k, x_g, v, rl_ij, X, dist, pair_mask,
                n_edges, D, H, Dh, mult, dense_kw, pd)

        h = h + d_h
        X = X + dX

        # ---- HTR edge update (expanded rejection) --------------------
        if not self.last_layer and cfg.edge_updates:
            E_ = evec_dim
            if cfg.merge_proj:
                # W_vq and every per-degree W_vk in ONE over-wide matmul
                # [D, (1+lmax)*E]; each degree's EK rows then slice their
                # own block.  The wasted columns ((lmax-1)/2 of this op's
                # FLOPs at lmax=2) are far cheaper than 1+lmax separate
                # dispatches on [G*M*L, D]-row matmuls — and the flat
                # form needs no batched-dot relayout of X.
                cd = nd or jnp.float32
                wvq = _LinearParams(E_, D, **dense_kw, use_bias=False,
                                    name="W_vq")()[0]
                if cfg.sep_htr:
                    wvks = [_LinearParams(E_, D, **dense_kw, use_bias=False,
                                          name=f"W_vk_{l}")()[0]
                            for l in range(cfg.lmax)]
                else:
                    wvks = [_LinearParams(E_, D, **dense_kw, use_bias=False,
                                          name="W_vk")()[0]]
                wall = jnp.concatenate([wvq] + wvks, axis=1).astype(cd)
                y = X.astype(cd) @ wall  # [G, M, L, (1+n_vk)*E]
                EQ = y[..., :E_]
                if cfg.sep_htr:
                    EK = jnp.concatenate(
                        [y[:, :, lo:hi, (1 + l) * E_:(2 + l) * E_]
                         for l, (lo, hi) in enumerate(degree_slices(cfg.lmax))],
                        axis=2)
                else:
                    EK = y[..., E_:2 * E_]
            elif cfg.sep_htr:
                EQ = Dense(E_, use_bias=False, activation=None,
                           **dense_kw, dtype=nd, name="W_vq")(X)  # [G,M,L,C]
                blocks = []
                for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
                    blocks.append(Dense(
                        E_, use_bias=False, activation=None,
                        **dense_kw, dtype=nd,
                        name=f"W_vk_{l}")(X[..., lo:hi, :]))
                EK = jnp.concatenate(blocks, axis=2)
            else:
                EQ = Dense(E_, use_bias=False, activation=None,
                           **dense_kw, dtype=nd, name="W_vq")(X)
                EK = Dense(E_, use_bias=False, activation=None,
                           **dense_kw, dtype=nd, name="W_vk")(X)

            # fused path: flagship grammar (plus norej/gating) runs as
            # one Pallas kernel over the pair axis — z/gt/S/pq/pk/w
            # stay in VMEM (see ops/pallas/fused_htr.py)
            if (cfg.fused and cfg.fused_htr
                    and not info["mlp"] and not info["mlpa"]
                    and info["lin_w"] == 0 and info["lin_ln"] == 0
                    and cfg.edge_ln == "" and evec_dim == D):
                gt_k, gt_b = _MLPLayerParams(D, D, cfg.weight_init,
                                             cfg.bias_init,
                                             name="gamma_t")()
                htr_fn = make_fused_htr(
                    cfg.lmax, cfg.sep_htr, info["rej"],
                    info["gated"] or "",
                    interpret=jax.default_backend() != "tpu",
                    pair_dtype=pd)
                return h, X, htr_fn(t_ij, EQ, EK, rl_ij, gt_k, gt_b)

            def pair_terms(lo, hi):
                # per-m broadcast multiply-accumulate: einsum forms with
                # the channel axis as a batch dim force operand
                # relayouts (see the dX comment above).  Everything
                # stays in pair_dtype: these [G,M,M,C] chains are pure
                # HBM streams (profiled ~10 ms/step in f32 at the QM9
                # headline), and the residual t_ij update below is the
                # only f32 consumer.
                eq = EQ[..., lo:hi, :].astype(pd)
                ek = EK[..., lo:hi, :].astype(pd)
                S = pq = pk = 0.0
                for m in range(hi - lo):
                    eq_m = eq[:, :, None, m, :]     # [G, i, 1, C]
                    ek_m = ek[:, None, :, m, :]     # [G, 1, j, C]
                    S = S + eq_m * ek_m
                    if info["rej"]:
                        r_m = rl_ij[..., lo + m:lo + m + 1].astype(pd)
                        pq = pq + eq_m * r_m
                        pk = pk + ek_m * r_m
                if not info["rej"]:
                    return S
                r2 = jnp.sum(rl_ij[..., lo:hi] ** 2,
                             axis=-1)[..., None].astype(pd)
                return S - pq * pk * (2.0 - r2)

            if cfg.sep_htr:
                w_ij = sum(pair_terms(lo, hi)
                           for lo, hi in degree_slices(cfg.lmax))
            else:
                w_ij = pair_terms(0, rl_ij.shape[-1])

            if info["mlp"] or info["mlpa"]:
                gamma_t = MLP([D, emlp_dim, D], activation=act,
                              last_activation=None if info["mlp"] else act,
                              norm=cfg.edge_ln, **dense_kw, dtype=pd,
                              name="gamma_t")
            else:
                gamma_t = MLP([D, D], activation=act, last_activation=act,
                              norm=cfg.edge_ln, **dense_kw, dtype=pd,
                              name="gamma_t")
            gt = gamma_t(t_ij)

            gw = w_ij
            if info["lin_w"] > 0:
                gw = gw.astype(jnp.float32)   # LayerNorm/Dense stay f32
                if info["lin_ln"] == 1:
                    gw = fnn.LayerNorm(epsilon=1e-5, name="gamma_w_ln")(gw)
                if info["lin_w"] % 10 == 2:
                    gw = act(gw)
                gw = Dense(D, activation=None,
                           norm="layer" if info["lin_ln"] == 2 else "",
                           **dense_kw, dtype=pd, name="W_edp")(gw)
            if info["gated"] == "gatedt":
                gw = jnp.tanh(gw)
            elif info["gated"] == "gated":
                gw = jax.nn.sigmoid(gw)
            elif info["gated"] == "act":
                gw = jax.nn.silu(gw)

            t_ij = t_ij + (gt * gw).astype(t_ij.dtype)

        return h, X, t_ij

    def _unfused_message(self, cfg, act, t_ij, q, k, x_g, v, rl_ij, X,
                         dist, pair_mask, n_edges, D, H, Dh, mult,
                         dense_kw, pd):
        """Plain-XLA message+aggregate (called from the compact
        __call__; all submodules carry explicit names)."""
        t_attn = Dense(D, activation=act, **dense_kw, dtype=pd,
                       name="W_re")(t_ij)
        t_filter = Dense(mult * D, activation=None, **dense_kw, dtype=pd,
                         name="W_rs")(t_ij)  # [G, M, M, mult*D]

        # ---- attention: SDDMM logits + masked softmax over j ---------
        # Head reduction as an indicator matmul: avoids any
        # [..., H, Dh] reshape, which XLA lowers as costly relayouts
        # (profiled: ~1/3 of step time in 'data formatting').
        head_sel = jnp.asarray(
            np.kron(np.eye(H), np.ones((Dh, 1))), pd)  # [D, H]
        p_qk = (t_attn * q.astype(pd)[:, :, None, :]
                * k.astype(pd)[:, None, :, :])  # [G, M, M, D]
        logit = jnp.einsum("gijd,dh->gijh", p_qk, head_sel,
                           preferred_element_type=jnp.float32)
        logit = jnp.where(pair_mask[..., None], logit, _NEG)
        lmaxv = jax.lax.stop_gradient(jnp.max(logit, axis=2, keepdims=True))
        expd = jnp.exp(logit - lmaxv) * pair_mask[..., None]
        attn = expd / (jnp.sum(expd, axis=2, keepdims=True) + _SOFTMAX_EPS)
        if cfg.scale_edge:
            attn = attn * (jnp.sqrt(n_edges)[..., None] / math.sqrt(D))
        else:
            attn = attn / math.sqrt(D)
        if cfg.attn_dropout > 0.0:
            attn = fnn.Dropout(cfg.attn_dropout, name="attn_dropout")(
                attn, deterministic=self.deterministic)

        # ---- pair features + aggregation over j ----------------------
        env = (cosine_cutoff(dist, cfg.cutoff) * pair_mask).astype(pd)
        # o[g,i,j,:] = spatial + sea, materialized once per layer.
        # Per-channel attention (channel c -> head c // (mult*D/H), the
        # torch head split) via an indicator matmul — again no reshape.
        e_per = (mult * D) // H
        chan_sel = jnp.asarray(
            np.kron(np.eye(H), np.ones((1, e_per))), pd)  # [H, mult*D]
        attn_full = jnp.einsum("gijh,hc->gijc", attn.astype(pd), chan_sel,
                               preferred_element_type=pd)
        o = (t_filter * x_g.astype(pd)[:, None, :, :] * env[..., None]
             + attn_full * v.astype(pd)[:, None, :, :])

        # reference GATA.aggregate supports add/mean/max
        # (gotennet.py:613-657).  mean divides the add result by each
        # destination's real-pair count; max reduces masked elementwise
        # with empty-neighborhood slots zeroed (the scatter-reduce
        # convention the edge layout's _segment_aggregate follows).
        counts = jnp.sum(pair_mask.astype(jnp.float32), axis=2)  # [G, i]
        denom = jnp.maximum(counts, 1.0)[..., None]
        neg = jnp.asarray(-3e38, jnp.float32)

        def aggr_j(contrib):
            """[G, i, j, D] pair contributions -> [G, i, D]."""
            if cfg.aggr == "max":
                masked = jnp.where(pair_mask[..., None],
                                   contrib.astype(jnp.float32), neg)
                out = jnp.max(masked, axis=2)
                return jnp.where(counts[..., None] > 0, out, 0.0)
            s = jnp.sum(contrib.astype(jnp.float32), axis=2)
            return s / denom if cfg.aggr == "mean" else s

        o_s = o[..., :D]
        d_h = aggr_j(o_s)

        # Steerable updates as per-m multiply-reduce over the j axis.
        # dot_general forms ('gijm,gijd->gimd') force XLA to relayout
        # operands so the batch dim leads (profiled: ~40% of the
        # chunked step in layout copies); the explicit elementwise
        # multiply + axis-2 sum fuses with no data movement.  m ranges
        # over at most (lmax+1)^2-1 static values.  For add/mean the
        # dir and tensor terms reduce separately (linear); max must
        # reduce their SUM jointly, like the reference's scatter-max
        # over complete per-edge messages.
        rl_p = rl_ij.astype(pd)
        X_p = X.astype(pd)
        linear = cfg.aggr in ("add", "mean")
        off_d = D
        off_t = off_d + (cfg.lmax if cfg.sep_dir else 1) * D
        dX_cols = []
        for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
            o_d_l = o[..., off_d + (l * D if cfg.sep_dir else 0):
                      off_d + (l * D if cfg.sep_dir else 0) + D]
            o_t_l = o[..., off_t + (l * D if cfg.sep_tensor else 0):
                      off_t + (l * D if cfg.sep_tensor else 0) + D]
            for m in range(lo, hi):
                dir_c = rl_p[..., m:m + 1] * o_d_l
                ten_c = X_p[:, None, :, m, :] * o_t_l
                if linear:
                    dX_cols.append(aggr_j(dir_c) + aggr_j(ten_c))
                else:
                    dX_cols.append(aggr_j(dir_c + ten_c))
        return d_h, jnp.stack(dX_cols, axis=2)  # dX: [G, M, L, D]


class _DenseBlock(fnn.Module):
    """One homogeneous (non-last) GATA+EQFF layer as a scan body:
    ``carry = (h, X, t_ij)``; rl_ij/dist/pair_mask/n_edges broadcast.
    Used by ``GotenNetConfig.scan_layers`` — submodule names ('gata',
    'eqff') deliberately drop the layer index, the scan's stacked
    leading axis replaces it (utils/params converts either way)."""

    cfg: GotenNetConfig
    deterministic: bool = True

    @fnn.compact
    def __call__(self, carry, rl_ij, dist, pair_mask, n_edges):
        h, X, t_ij = carry
        h, X, t_ij = GATADense(
            self.cfg, last_layer=False, deterministic=self.deterministic,
            name="gata")(h, X, t_ij, rl_ij, dist, pair_mask, n_edges)
        if self.cfg.edge_state_pair_dtype:
            t_ij = t_ij.astype(self.cfg.pair_dtype)
        h, X = EQFF(self.cfg, name="eqff")(h, X)
        return (h, X, t_ij), None


class GotenNetDense(fnn.Module):
    """Full dense-layout stack; parameter tree identical to GotenNet."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, batch: DenseBatch,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        z, pos, mask = batch.z, batch.pos, batch.mask
        G, M = z.shape
        D = cfg.n_atom_basis

        # pair geometry
        vec = pos[:, None, :, :] - pos[:, :, None, :]  # [G,i,j,3] = p_j - ...
        # edge_vec convention: pos[src=j] - pos[dst=i]
        d2 = jnp.sum(vec ** 2, axis=-1)
        eye = jnp.eye(M, dtype=bool)[None]
        both = mask[:, :, None] & mask[:, None, :]
        if batch.seg is not None:
            # block-diagonal packing: slots of different molecules in
            # the same slab never interact (collate_dense_packed)
            both = both & (batch.seg[:, :, None] == batch.seg[:, None, :])
        adj = both & ~eye & (d2 < cfg.cutoff ** 2)      # non-loop pairs
        cap = cfg.max_num_neighbors
        if cap is not None and cap < M - 1:
            # nearest-k per destination row, ties broken by source index
            # — exactly the host edge builder's stable-argsort semantics
            # (graph/neighborlist.py), and the reference radius_graph
            # max_num_neighbors cap (layers.py:1589-1590).  Statically
            # skipped when the cap cannot bind (M-1 <= cap), so QM9-size
            # batches pay nothing.
            d2m = jnp.where(adj, d2, jnp.inf)
            order = jnp.argsort(d2m, axis=-1, stable=True)
            rank = jnp.argsort(order, axis=-1, stable=True)
            adj = adj & (rank < cap)
        pair_mask = adj | (eye & mask[:, :, None] & mask[:, None, :])
        # rsqrt-based normalization: one [G, M, M] reciprocal feeds the
        # [..., 3] broadcast multiply — the divide form materialized a
        # [G, M^2, 1] select whose single live lane pads to a full
        # 128-lane tile (profiled ~0.6 ms/step of select fusions)
        d2_safe = jnp.where(adj, d2, 1.0)
        dist = jnp.where(adj, jnp.sqrt(d2_safe), 0.0)
        inv = jnp.where(adj, jax.lax.rsqrt(d2_safe), 0.0)
        vec_n = vec * inv[..., None]

        a_na = self.param("A_na", _zero_padded_embed_init,
                          (cfg.max_z, D), jnp.float32)
        h = a_na[z]  # [G, M, D]

        rbf_params, rbf_fn = RadialBasis.make(
            self, cfg.radial_basis, cfg.n_rbf, cfg.cutoff,
            trainable=cfg.trainable_rbf)
        phi = rbf_fn(dist, rbf_params)  # [G, M, M, R]

        h = NodeInitDense(cfg, name="node_init")(z, h, dist, phi,
                                                 adj.astype(h.dtype))
        t_ij = EdgeInitDense(cfg, name="edge_init")(phi, h)
        rl_ij = spherical_harmonics(vec_n, cfg.lmax)  # [G, M, M, L]

        # per-source real-edge counts -> per-pair n_edges (src axis = j)
        counts_src = jnp.sum(pair_mask.astype(h.dtype), axis=1)  # [G, M]
        n_edges = jnp.broadcast_to(counts_src[:, None, :], (G, M, M))

        X = jnp.zeros((G, M, cfg.sh_dim, D), h.dtype)
        gata_cls = fnn.remat(GATADense) if cfg.remat else GATADense
        sd = cfg.pair_dtype if cfg.edge_state_pair_dtype else None
        if sd is not None:
            t_ij = t_ij.astype(sd)
        n = cfg.n_interactions
        if cfg.scan_layers and n > 1:
            # one lax.scan over the n-1 homogeneous layers with
            # layer-stacked params; the last layer (no edge update,
            # reference gotennet.py:874) is an unrolled tail below
            block = _DenseBlock
            if cfg.remat:
                block = fnn.remat(block)
            scanned = fnn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(fnn.broadcast,) * 4,
                length=n - 1,
            )(cfg, deterministic=deterministic, name="layers")
            (h, X, t_ij), _ = scanned((h, X, t_ij), rl_ij, dist,
                                      pair_mask, n_edges)
            start = n - 1
        else:
            start = 0
        for i in range(start, n):
            h, X, t_ij = gata_cls(
                cfg, last_layer=(i == n - 1),
                deterministic=deterministic, name=f"gata_{i}")(
                    h, X, t_ij, rl_ij, dist, pair_mask, n_edges)
            if sd is not None:
                t_ij = t_ij.astype(sd)
            h, X = EQFF(cfg, name=f"eqff_{i}")(h, X)

        return h, X
