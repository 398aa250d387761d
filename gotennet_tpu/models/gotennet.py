"""GotenNet representation core, TPU-native.

Re-design of the reference architecture
(/root/reference/gotennet/models/representation/gotennet.py) for
JAX/XLA: pure-functional flax modules over static-shape padded edge
lists, explicit gathers + masked segment reductions instead of PyG
``MessagePassing``, per-degree work vectorized with degree-index maps
instead of python-side splits.

Blocks (paper names in parentheses):
  * ``NodeInit`` / ``EdgeInit`` — unified structural embedding (Eq. 1-3;
    reference layers.py:1607-1714).
  * ``GATA`` — degree-wise tensor attention + steerable update
    (gotennet.py:77-657), including the HTR edge update
    (gotennet.py:561-611).
  * ``EQFF`` — equivariant feed-forward (gotennet.py:660-748).
  * ``GotenNet`` — the full stack (gotennet.py:751-1010).

Semantics preserved bit-for-bit (fp32): self-loop distances are zero,
self-loop SH vanish, NodeInit drops self-loops, attention softmax runs
per destination node over real edges only, last layer skips the edge
update, X starts at zero.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from gotennet_tpu.graph.batch import GraphBatch
from gotennet_tpu.graph.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from gotennet_tpu.nn.dense import MLP, Dense
from gotennet_tpu.nn.norms import TensorLayerNorm
from gotennet_tpu.ops.activations import get_activation
from gotennet_tpu.ops.cutoffs import cosine_cutoff
from gotennet_tpu.ops.rbf import RadialBasis, get_rbf
from gotennet_tpu.ops.spherical import (
    degree_index_map,
    degree_slices,
    num_sh_components,
    spherical_harmonics,
)

__all__ = [
    "GotenNetConfig",
    "NodeInit",
    "EdgeInit",
    "GATA",
    "EQFF",
    "GotenNet",
    "parse_edge_updates",
]


def parse_edge_updates(edge_updates: Union[bool, str]) -> dict:
    """Parse the reference's ``edge_updates`` feature string
    (gotennet.py:139-190) into an update-info dict."""
    info = {"gated": False, "rej": True, "mlp": False, "mlpa": False,
            "lin_w": 0, "lin_ln": 0}
    parts = edge_updates.split("_") if isinstance(edge_updates, str) else []
    allowed = {"gated", "gatedt", "norej", "norm", "mlp", "mlpa", "act",
               "linw", "linwa", "ln", "postln"}
    bad = [p for p in parts if p not in allowed]
    if bad:
        raise ValueError(f"Invalid edge update parts {bad}; allowed {sorted(allowed)}")
    if "gated" in parts:
        info["gated"] = "gated"
    if "gatedt" in parts:
        info["gated"] = "gatedt"
    if "act" in parts:
        info["gated"] = "act"
    if "norej" in parts:
        info["rej"] = False
    if "mlp" in parts:
        info["mlp"] = True
    if "mlpa" in parts:
        info["mlpa"] = True
    if "linw" in parts:
        info["lin_w"] = 1
    if "linwa" in parts:
        info["lin_w"] = 2
    if "ln" in parts:
        info["lin_ln"] = 1
    if "postln" in parts:
        info["lin_ln"] = 2
    return info


@dataclasses.dataclass(frozen=True)
class GotenNetConfig:
    """Hyper-parameters; defaults follow the shipped reference config
    (configs/model/gotennet.yaml:16-40)."""

    n_atom_basis: int = 256
    n_interactions: int = 4
    lmax: int = 2
    num_heads: int = 8
    n_rbf: int = 32
    cutoff: float = 5.0
    radial_basis: str = "expnorm"
    # Learnable radial-basis parameters (reference GaussianRBF /
    # ExpNormalSmearing ``trainable`` flags, layers.py:307-322,
    # 714-726): Gaussian lifts offsets+widths, expnorm lifts
    # means+betas into the parameter tree under 'radial_basis'.
    trainable_rbf: bool = False
    activation: str = "swish"
    max_z: int = 100
    epsilon: float = 1e-8
    weight_init: str = "xavier_uniform"
    bias_init: str = "zeros"
    layernorm: str = ""
    steerable_norm: str = ""
    attn_dropout: float = 0.0
    edge_updates: Union[bool, str] = True
    scale_edge: bool = False
    aggr: str = "add"
    evec_dim: Optional[int] = None
    emlp_dim: Optional[int] = None
    sep_htr: bool = True
    sep_dir: bool = True
    sep_tensor: bool = True
    edge_ln: str = ""
    # Per-node neighbor cap (reference GotenNetWrapper's Distance uses
    # max_num_neighbors=32, gotennet.py:1018; radius_graph keeps the
    # nearest k, layers.py:1589-1590).  The edge/ELL layouts cap in the
    # host-side neighbor builder; the dense layout builds adjacency
    # inside the forward pass and enforces the same nearest-k cap there
    # so all three layouts compute the same graph at any density.
    max_num_neighbors: int = 32
    dtype: Any = jnp.float32
    # Mesh axis along which the edge list is sharded (inside shard_map);
    # None = single-device semantics.  See graph/segment.py psum_axis.
    edge_axis: Optional[str] = None
    # Rematerialize each GATA block in the backward pass: trades ~1/3
    # more FLOPs for not storing the [E, L, D] edge intermediates of
    # every layer — the difference between fitting batch-256 QM9 on one
    # v5e chip and OOM.
    remat: bool = True
    # Storage dtype for the large per-pair tensors in the dense layout
    # (t_filter / o / sea).  bfloat16 halves HBM traffic on the
    # bandwidth-bound hot path; attention logits, softmax and all
    # accumulations stay float32.  float32 (default) is bit-parity with
    # the edge-list path and the reference.
    pair_dtype: Any = jnp.float32
    # Compute dtype for the per-layer NODE projections (W_q/W_k,
    # gamma_s, gamma_v, W_vq/W_vk, EQFF) — the steerable [N, L, D]
    # projections triple the node-matmul volume and f32 matmuls run at
    # ~1/4 the MXU's bf16 rate, so these dominate the non-kernel device
    # time at the QM9 headline (profiled: 11.6 ms/step of f32
    # "convolution fusions" at r05).  bfloat16 runs them at full MXU
    # rate; parameters, residual streams (h, X, t_ij), LayerNorms and
    # output heads stay float32.  float32 (default) is bit-parity with
    # the reference.
    node_dtype: Any = jnp.float32
    # Dense layout only: run message+aggregate as one fused Pallas
    # kernel (ops/pallas/fused_gata.py) with an analytic Pallas VJP.
    # Keeps the [G,M,M,mult*D] pair tensor in VMEM instead of HBM.
    # Requires swish/silu activation and aggr='add'; attention dropout
    # folds into the kernel's per-head scale input.
    fused: bool = False
    # Dense layout: keep the inter-layer edge state t_ij in pair_dtype
    # instead of f32.  t_ij is a [G,M,M,D] pair tensor — the last one
    # still stored f32 — and the XLA ops streaming it (gamma_t MLP,
    # HTR pair products and their backwards) are HBM-bound.  The
    # per-layer residual update rounds to bf16 once per layer.
    edge_state_pair_dtype: bool = False
    # Also run the HTR edge update as a Pallas kernel
    # (ops/pallas/fused_htr.py).  Validated but measured ~5% slower
    # than XLA's fusion of the same (pure-elementwise) math on v5e
    # (PERF.md), so off by default; kept for larger-D configs where
    # the gamma_t matmul dominates.
    fused_htr: bool = False
    # ELL layout, fused path: max node-table rows resident in VMEM per
    # kernel call.  Batches larger than this (with windowed-gather
    # metadata, i.e. gather_halo) run the SAME kernel over contiguous
    # row chunks against statically-sliced table windows of width
    # chunk_rows + 2*halo — extending the fused formulation to
    # 10^4-atom systems.  0 disables chunking (full table always).
    fused_table_rows: int = 2048
    # Fused path: compute position cotangents (g_rl / g_env) in the
    # Pallas VJP.  None = auto: GotenModel resolves it to the head's
    # ``derivative`` flag (forces need dE/dpos; energy-only training
    # does not, and skipping them trims the backward kernel).  Set
    # True explicitly if differentiating the bare representation
    # w.r.t. positions outside GotenModel.
    pos_grads: Optional[bool] = None
    # Dense layout: evaluate each projection GROUP as one wide matmul
    # (W_q|W_k|gamma_s_0|gamma_v_0 concatenated; gamma_s_1/gamma_v_1
    # stacked; W_vq + per-degree W_vk over-wide).  Identical math and
    # parameter tree — kernels concatenate at trace time — but one MXU
    # dispatch per group instead of one per projection, which matters
    # because the per-chunk node matmuls are dispatch/weight-load-bound
    # at QM9 shapes (PERF.md round 5).  f32-bit-parity caveat: wider
    # matmuls may tile differently, so outputs can differ from the
    # per-projection path by normal f32 reassociation noise.
    merge_proj: bool = True
    # Roll the homogeneous (GATA+EQFF) layers into one jax.lax.scan
    # with layer-stacked parameters instead of unrolling them in the
    # traced graph (the last layer — the only structurally different
    # one, reference gotennet.py:874 — stays an unrolled tail).  Cuts
    # XLA/Mosaic compile time ~40% (61 -> 36 s at the QM9 headline)
    # with identical math, but the scan's BACKWARD pays ~17 ms/step
    # extra in stacked-gradient accumulation/slicing fusions (measured
    # v5e r04) — a compile-vs-step tradeoff, so default off; the
    # forward-only cost is ~1 ms (inference-friendly).  The parameter
    # tree changes from gata_{i}/eqff_{i} to a stacked 'layers'
    # collection — utils/params.{roll,unroll}_layer_params convert.
    scan_layers: bool = False

    def __post_init__(self):
        if self.n_atom_basis % self.num_heads:
            raise ValueError(
                f"n_atom_basis={self.n_atom_basis} must be divisible by "
                f"num_heads={self.num_heads}")
        if self.lmax < 1:
            raise ValueError("lmax must be >= 1")
        if (self.n_atom_basis * self.multiplier) % self.num_heads:
            raise ValueError(
                "multiplier * n_atom_basis must be divisible by num_heads")
        if self.aggr not in ("add", "mean", "max"):
            raise ValueError(f"unknown aggr {self.aggr!r}")
        parse_edge_updates(self.edge_updates)  # validates the string
        if self.fused:
            from gotennet_tpu.ops.activations import is_silu_like
            if not is_silu_like(self.activation):
                raise ValueError(
                    "fused=True hardcodes silu in the Pallas kernels; "
                    f"got activation={self.activation!r} — set "
                    "fused=False to use the XLA path with any "
                    "activation")
            if self.aggr != "add":
                raise ValueError("fused=True supports aggr='add' only")

    @property
    def sh_dim(self) -> int:
        return num_sh_components(self.lmax)

    @property
    def multiplier(self) -> int:
        m = 3
        if self.sep_dir:
            m += self.lmax - 1
        if self.sep_tensor:
            m += self.lmax - 1
        return m


def _segment_aggregate(aggr: str, data, seg, n, mask, psum_axis=None):
    """Masked segment reduction with the reference's empty-segment
    convention (zeros)."""
    if aggr == "add":
        return segment_sum(data, seg, n, mask, indices_are_sorted=True,
                           psum_axis=psum_axis)
    if aggr == "mean":
        return segment_mean(data, seg, n, mask, indices_are_sorted=True,
                            psum_axis=psum_axis)
    if aggr == "max":
        out = segment_max(data, seg, n, mask, indices_are_sorted=True,
                          psum_axis=psum_axis)
        counts = segment_sum(mask.astype(jnp.int32), seg, n,
                             indices_are_sorted=True, psum_axis=psum_axis)
        c = counts
        while c.ndim < out.ndim:
            c = c[..., None]
        return jnp.where(c > 0, out, jnp.zeros_like(out))
    raise ValueError(f"Unknown aggr {aggr!r}")


def _zero_padded_embed_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default N(0,1) with row 0 zeroed
    (padding_idx=0, reference gotennet.py:856)."""
    w = jax.random.normal(key, shape, dtype)
    return w.at[0].set(0.0)


class NodeInit(fnn.Module):
    """Unified structural node embedding (paper Eq. 1-2; reference
    layers.py:1607-1675).  Neighbor atom-type embeddings, gated by a
    radial filter under the cosine cutoff, sum-aggregated over non-loop
    edges and fused with the center embedding."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, z, h, edge_src, edge_dst, edge_dist, phi,
                 edge_mask) -> jnp.ndarray:
        cfg = self.cfg
        act = get_activation(cfg.activation)
        d = cfg.n_atom_basis
        a_nbr = self.param(
            "A_nbr", jax.nn.initializers.normal(1.0), (cfg.max_z, d),
            jnp.float32)
        h_src = a_nbr[z]  # [N, D]
        env = cosine_cutoff(edge_dist, cfg.cutoff)  # [E]
        w_ndp = Dense(d, activation=None, weight_init=cfg.weight_init,
                      bias_init=cfg.bias_init, name="W_ndp")
        r_feat = w_ndp(phi) * env[:, None]  # [E, D]
        # strip self-loops (reference layers.py:1659-1664)
        msg_mask = edge_mask & (edge_src != edge_dst)
        msg = h_src[edge_src] * r_feat
        m_i = segment_sum(msg, edge_dst, h.shape[0], msg_mask,
                          indices_are_sorted=True,
                          psum_axis=cfg.edge_axis)
        fused = jnp.concatenate([h, m_i], axis=-1)
        return MLP([2 * d, d, d], activation=act, last_activation=None,
                   weight_init=cfg.weight_init, bias_init=cfg.bias_init,
                   norm="layer", name="W_nrd_nru")(fused)


class EdgeInit(fnn.Module):
    """Edge embedding t_ij = (h_i + h_j) * W_erp(phi_ij) (paper Eq. 3;
    reference layers.py:1677-1714).  Edge-wise — no aggregation."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, phi, h, edge_src, edge_dst) -> jnp.ndarray:
        w = Dense(self.cfg.n_atom_basis, activation=None,
                  weight_init="xavier_uniform", bias_init="zeros",
                  name="W_erp")(phi)
        return (h[edge_dst] + h[edge_src]) * w


class GATA(fnn.Module):
    """Geometry-aware tensor attention + hierarchical tensor refinement.

    One interaction block: degree-wise multi-head attention over edges
    (SDDMM score -> per-destination segment softmax -> weighted values),
    a cutoff-gated spatial filter path, steerable updates assembled from
    direction (r^l) and tensor (X_j^l) components, and — except in the
    last layer — the HTR edge update from per-degree vector-rejected
    inner products.  Reference: gotennet.py:77-657.
    """

    cfg: GotenNetConfig
    last_layer: bool = False
    deterministic: bool = True

    @fnn.compact
    def __call__(self, h, X, t_ij, rl_ij, edge_dist, edge_src, edge_dst,
                 edge_mask, n_edges):
        cfg = self.cfg
        act = get_activation(cfg.activation)
        D = cfg.n_atom_basis
        H = cfg.num_heads
        Dh = D // H
        mult = cfg.multiplier
        L = cfg.sh_dim
        info = parse_edge_updates(cfg.edge_updates)
        evec_dim = cfg.evec_dim or D
        emlp_dim = cfg.emlp_dim or D
        N = h.shape[0]
        nd = None if cfg.node_dtype == jnp.float32 else cfg.node_dtype
        dense_kw = dict(weight_init=cfg.weight_init, bias_init=cfg.bias_init)

        # optional pre-norms
        if cfg.layernorm:
            h = fnn.LayerNorm(epsilon=1e-5, name="layernorm")(h)
        if cfg.steerable_norm:
            X = TensorLayerNorm(D, cfg.lmax, trainable=False,
                                name="tensor_layernorm")(X)

        q = Dense(D, activation=None, **dense_kw, dtype=nd, name="W_q")(h)
        k = Dense(D, activation=None, **dense_kw, dtype=nd, name="W_k")(h)
        q = q.reshape(N, H, Dh)
        k = k.reshape(N, H, Dh)

        x_g = Dense(D, activation=act, **dense_kw, dtype=nd,
                    name="gamma_s_0")(h)
        x_g = Dense(mult * D, activation=None, **dense_kw, dtype=nd,
                    name="gamma_s_1")(x_g)
        v = Dense(D, activation=act, **dense_kw, dtype=nd,
                  name="gamma_v_0")(h)
        v = Dense(mult * D, activation=None, **dense_kw, dtype=nd,
                  name="gamma_v_1")(v)

        t_attn = Dense(D, activation=act, **dense_kw, name="W_re")(t_ij)
        t_filter = Dense(mult * D, activation=None, **dense_kw,
                         name="W_rs")(t_ij)

        # ---- message: SDDMM attention + segment softmax -------------
        E = edge_src.shape[0]
        logit = jnp.sum(
            q[edge_dst] * k[edge_src] * t_attn.reshape(E, H, Dh),
            axis=-1, keepdims=True)  # [E, H, 1]
        attn = segment_softmax(logit, edge_dst, N, edge_mask,
                               indices_are_sorted=True,
                               psum_axis=cfg.edge_axis)
        if cfg.scale_edge:
            norm = jnp.sqrt(n_edges)[:, None, None] / math.sqrt(D)
        else:
            norm = 1.0 / math.sqrt(D)
        attn = attn * norm
        if cfg.attn_dropout > 0.0:
            attn = fnn.Dropout(cfg.attn_dropout, name="attn_dropout")(
                attn, deterministic=self.deterministic)

        sea = (attn * v[edge_src].reshape(E, H, (mult * D) // H))
        sea = sea.reshape(E, mult * D)
        spatial = t_filter * x_g[edge_src] * cosine_cutoff(
            edge_dist, cfg.cutoff)[:, None]
        outputs = spatial + sea  # [E, mult*D]

        chunks = [outputs[:, i * D:(i + 1) * D] for i in range(mult)]
        o_s = chunks[0]
        rest = chunks[1:]
        deg_map = jnp.asarray(degree_index_map(cfg.lmax), jnp.int32) - 1

        X_j = X[edge_src]  # [E, L, D]
        if cfg.sep_dir:
            o_d = jnp.stack(rest[:cfg.lmax], axis=1)  # [E, lmax, D]
            rest = rest[cfg.lmax:]
            dX_R = rl_ij[:, :, None] * jnp.take(o_d, deg_map, axis=1)
        else:
            o_d, rest = rest[0], rest[1:]
            dX_R = rl_ij[:, :, None] * o_d[:, None, :]
        if cfg.sep_tensor:
            o_t = jnp.stack(rest[:cfg.lmax], axis=1)
            dX_X = X_j * jnp.take(o_t, deg_map, axis=1)
        else:
            dX_X = X_j * rest[0][:, None, :]
        dX = dX_R + dX_X  # [E, L, D]

        # ---- aggregate ----------------------------------------------
        d_h = _segment_aggregate(cfg.aggr, o_s, edge_dst, N, edge_mask,
                                 cfg.edge_axis)
        d_X = _segment_aggregate(cfg.aggr, dX, edge_dst, N, edge_mask,
                                 cfg.edge_axis)
        h = h + d_h
        X = X + d_X

        # ---- HTR edge update ----------------------------------------
        if not self.last_layer and cfg.edge_updates:
            EQ = Dense(evec_dim, use_bias=False, activation=None,
                       **dense_kw, dtype=nd, name="W_vq")(X)  # [N, L, evec]
            if cfg.sep_htr:
                blocks = []
                for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
                    blocks.append(Dense(
                        evec_dim, use_bias=False, activation=None,
                        **dense_kw, dtype=nd, name=f"W_vk_{l}")(
                            X[:, lo:hi, :]))
                EK = jnp.concatenate(blocks, axis=1)
            else:
                EK = Dense(evec_dim, use_bias=False, activation=None,
                           **dense_kw, dtype=nd, name="W_vk")(X)

            EQ_i = EQ[edge_dst]
            EK_j = EK[edge_src]

            def reject(rep, r):
                proj = jnp.sum(rep * r[:, :, None], axis=1, keepdims=True)
                return rep - proj * r[:, :, None]

            if cfg.sep_htr:
                w_ij = jnp.zeros((E, evec_dim), outputs.dtype)
                for lo, hi in degree_slices(cfg.lmax):
                    eq_l, ek_l = EQ_i[:, lo:hi], EK_j[:, lo:hi]
                    r_l = rl_ij[:, lo:hi]
                    if info["rej"]:
                        eq_l = reject(eq_l, r_l)
                        ek_l = reject(ek_l, -r_l)
                    w_ij = w_ij + jnp.sum(eq_l * ek_l, axis=1)
            elif not info["rej"]:
                w_ij = jnp.sum(EQ_i * EK_j, axis=1)
            else:
                w_ij = jnp.sum(
                    reject(EQ_i, rl_ij) * reject(EK_j, -rl_ij), axis=1)

            # gamma_t (reference gotennet.py:239-250)
            if info["mlp"] or info["mlpa"]:
                gamma_t = MLP(
                    [D, emlp_dim, D], activation=act,
                    last_activation=None if info["mlp"] else act,
                    norm=cfg.edge_ln, **dense_kw, name="gamma_t")
            else:
                gamma_t = MLP([D, D], activation=act, last_activation=act,
                              norm=cfg.edge_ln, **dense_kw, name="gamma_t")
            gt = gamma_t(t_ij)

            # gamma_w gate (reference gotennet.py:270-292)
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


class EQFF(fnn.Module):
    """Equivariant feed-forward channel mixing (reference
    gotennet.py:660-748): context = [h ; ||X W_vu||], two-layer MLP,
    residual scalar and gated steerable updates."""

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, h, X) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        act = get_activation(cfg.activation)
        D = cfg.n_atom_basis
        nd = None if cfg.node_dtype == jnp.float32 else cfg.node_dtype
        dense_kw = dict(weight_init=cfg.weight_init, bias_init=cfg.bias_init)
        X_p = Dense(D, use_bias=False, activation=None, **dense_kw,
                    dtype=nd, name="W_vu")(X)
        # the norm reduction accumulates f32 (8 squared bf16 terms lose
        # ~3 bits otherwise); X_p itself stays in node_dtype
        X_pn = jnp.sqrt(jnp.sum(X_p.astype(jnp.float32) ** 2, axis=-2)
                        + cfg.epsilon)  # [..., D]
        ctx = jnp.concatenate([h, X_pn], axis=-1)
        m = Dense(D, activation=act, **dense_kw, dtype=nd,
                  name="gamma_m_0")(ctx)
        m = Dense(2 * D, activation=None, **dense_kw, dtype=nd,
                  name="gamma_m_1")(m)
        m1, m2 = m[..., :D], m[..., D:]
        return h + m1, X + m2[..., None, :].astype(X.dtype) * X_p


class GotenNet(fnn.Module):
    """Full representation stack (reference gotennet.py:751-1010).

    ``__call__`` takes the same logical inputs as the reference's bare
    forward — atomic numbers, the edge list, raw edge vectors/distances
    — plus padding masks, and returns ``(h [N, D], X [N, L, D])``.
    """

    cfg: GotenNetConfig

    @fnn.compact
    def __call__(self, z, edge_src, edge_dst, edge_dist, edge_vec,
                 node_mask, edge_mask,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        N = z.shape[0]
        D = cfg.n_atom_basis

        a_na = self.param("A_na", _zero_padded_embed_init,
                          (cfg.max_z, D), jnp.float32)
        h = a_na[z]  # [N, D]

        rbf_params, rbf_fn = RadialBasis.make(
            self, cfg.radial_basis, cfg.n_rbf, cfg.cutoff,
            trainable=cfg.trainable_rbf)
        phi = rbf_fn(edge_dist, rbf_params)  # [E, n_rbf]

        h = NodeInit(cfg, name="node_init")(
            z, h, edge_src, edge_dst, edge_dist, phi, edge_mask)
        t_ij = EdgeInit(cfg, name="edge_init")(phi, h, edge_src, edge_dst)

        # normalize edge vectors for real non-loop edges; self-loops and
        # padded slots keep their exact-zero vectors (reference
        # gotennet.py:978-982)
        nonloop = edge_mask & (edge_src != edge_dst)
        safe_d = jnp.where(nonloop, edge_dist, 1.0)
        vec_n = jnp.where(nonloop[:, None], edge_vec / safe_d[:, None],
                          edge_vec)
        rl_ij = spherical_harmonics(vec_n, cfg.lmax)  # [E, L]

        # per-source real-edge counts (reference gotennet.py:986-989)
        counts = segment_sum(edge_mask.astype(h.dtype), edge_src, N,
                             psum_axis=cfg.edge_axis)
        n_edges = counts[edge_src]

        # h stays [N, D] throughout (the reference's [N, 1, D] axis only
        # serves torch broadcasting; dropping it saves a reshape per op)
        X = jnp.zeros((N, cfg.sh_dim, D), h.dtype)
        gata_cls = fnn.remat(GATA) if cfg.remat else GATA
        for i in range(cfg.n_interactions):
            h, X, t_ij = gata_cls(
                cfg, last_layer=(i == cfg.n_interactions - 1),
                deterministic=deterministic, name=f"gata_{i}")(
                    h, X, t_ij, rl_ij, edge_dist, edge_src, edge_dst,
                    edge_mask, n_edges)
            h, X = EQFF(cfg, name=f"eqff_{i}")(h, X)

        return h, X

    def from_batch(self, batch: GraphBatch, deterministic: bool = True):
        """Forward from a ``GraphBatch``, computing edge geometry from
        positions (differentiable — used by force heads)."""
        vec = batch.pos[batch.edge_src] - batch.pos[batch.edge_dst]
        nonloop = batch.edge_mask & (batch.edge_src != batch.edge_dst)
        sq = jnp.sum(vec ** 2, axis=-1)
        dist = jnp.where(nonloop, jnp.sqrt(jnp.where(nonloop, sq, 1.0)), 0.0)
        return self(batch.z, batch.edge_src, batch.edge_dst, dist, vec,
                    batch.node_mask, batch.edge_mask,
                    deterministic=deterministic)
