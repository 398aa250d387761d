"""Pure-PyTorch oracle of the reference GotenNet forward.

An independent re-derivation of the reference's math
(/root/reference/gotennet/models/representation/gotennet.py and
components/layers.py) in plain torch — no PyG — consuming
reference-format state dicts (the same key naming as published
checkpoints).  Used by tests/test_torch_parity.py to validate both the
JAX models and utils/torch_convert.py against a second framework's
numerics.

Covers the full configuration grammar exercised by the parity tests:
expnorm/gaussian/bessel radial bases, silu/swish activation, every
``edge_updates`` token (gated/gatedt/act/norej/mlp/mlpa/linw/linwa/
ln/postln), layernorm and steerable (tensor) pre-norms, and
aggr add/mean/max.
"""

from __future__ import annotations

import math

import numpy as np
import torch

from gotennet_tpu.ops.spherical import degree_slices


def _lin(x, sd, name, bias=True):
    w = torch.as_tensor(sd[f"{name}.weight"])
    y = x @ w.T
    if bias:
        y = y + torch.as_tensor(sd[f"{name}.bias"])
    return y


def _silu(x):
    return x * torch.sigmoid(x)


def _cos_cutoff(d, cutoff):
    return 0.5 * (torch.cos(d * math.pi / cutoff) + 1.0) * (d < cutoff)


def _expnorm(d, cutoff, n_rbf):
    """ExpNormalSmearing (reference layers.py:703-746), alpha=5/rc."""
    start = math.exp(-cutoff)
    means = torch.linspace(start, 1.0, n_rbf, dtype=d.dtype)
    beta = (2.0 / n_rbf * (1.0 - start)) ** -2
    alpha = 5.0 / cutoff
    env = _cos_cutoff(d, cutoff)[:, None]
    return env * torch.exp(
        -beta * (torch.exp(-alpha * d)[:, None] - means) ** 2)


def _gaussian(d, cutoff, n_rbf):
    """GaussianRBF (reference layers.py:276-325): gaussians at
    linspace(0, rc), width = grid spacing."""
    offsets = torch.linspace(0.0, cutoff, n_rbf, dtype=d.dtype)
    width = (offsets[1] - offsets[0]) if n_rbf > 1 else torch.tensor(1.0)
    return torch.exp(-0.5 / width ** 2 * (d[:, None] - offsets) ** 2)


def _bessel(d, cutoff, n_rbf):
    """BesselBasis (reference layers.py:328-358), zero-safe."""
    freqs = torch.arange(1, n_rbf + 1, dtype=d.dtype) * math.pi / cutoff
    denom = torch.where(d == 0, torch.ones_like(d), d)[:, None]
    return torch.sin(d[:, None] * freqs) / denom


def _rbf(name, d, cutoff, n_rbf):
    key = name.lower().replace("-", "").replace("_", "")
    return {"expnorm": _expnorm, "gaussianrbf": _gaussian,
            "besselbasis": _bessel}[key](d, cutoff, n_rbf)


def _tensor_layer_norm(X, lmax, eps=1e-12):
    """Non-trainable TensorLayerNorm (reference layers.py:1497-1563):
    per-degree max-min norm of the m-axis magnitudes."""
    parts = []
    for lo, hi in degree_slices(lmax):
        t = X[:, lo:hi, :]
        dist = torch.norm(t, dim=1, keepdim=True)
        if (dist == 0).all():
            parts.append(torch.zeros_like(t))
            continue
        dist = dist.clamp(min=eps)
        direct = t / dist
        max_val, _ = torch.max(dist, dim=-1)
        min_val, _ = torch.min(dist, dim=-1)
        delta = (max_val - min_val).view(-1)
        delta = torch.where(delta == 0, torch.ones_like(delta), delta)
        nd = (dist - min_val.view(-1, 1, 1)) / delta.view(-1, 1, 1)
        parts.append(torch.relu(nd) * direct)
    return torch.cat(parts, dim=1)


def _seg_softmax(logits, seg, n):
    """PyG-style segment softmax over axis 0 (+1e-16 denominator).

    The per-segment max shift is detached: softmax gradients are
    invariant to it, and index_reduce('amax') has no backward."""
    neg = torch.full((n,) + logits.shape[1:], -1e30, dtype=logits.dtype)
    mx = neg.index_reduce(0, seg, logits.detach(), "amax",
                          include_self=True)
    ex = torch.exp(logits - mx[seg])
    den = torch.zeros_like(neg).index_add_(0, seg, ex)
    return ex / (den[seg] + 1e-16)


def _scatter_add(values, seg, n):
    out = torch.zeros((n,) + values.shape[1:], dtype=values.dtype)
    return out.index_add_(0, seg, values)


def _scatter_aggr(aggr, values, seg, n):
    """PyG-style scatter with reduce add/mean/max (empty segments -> 0,
    mean divides by count clamped to 1)."""
    if aggr == "add":
        return _scatter_add(values, seg, n)
    if aggr == "mean":
        s = _scatter_add(values, seg, n)
        cnt = _scatter_add(torch.ones(values.shape[0]), seg, n)
        cnt = cnt.clamp(min=1.0).view((n,) + (1,) * (values.ndim - 1))
        return s / cnt
    if aggr == "max":
        neg = torch.full((n,) + values.shape[1:], -1e30,
                         dtype=values.dtype)
        out = neg.index_reduce(0, seg, values, "amax", include_self=True)
        return torch.where(out <= -1e29, torch.zeros_like(out), out)
    raise ValueError(aggr)


def _torch_spherical_harmonics(vec, lmax):
    """Torch translation of ops/spherical.spherical_harmonics (the same
    semi-normalized Legendre + azimuthal recurrence, validated against
    scipy in tests/test_spherical.py) so the oracle is differentiable
    w.r.t. positions for force-training parity."""
    import math as _math

    def _dfact(n):
        out = 1.0
        while n > 1:
            out *= n
            n -= 2
        return out

    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    r2 = x * x + y * y + z * z
    A = [torch.ones_like(x)]
    B = [torch.zeros_like(x)]
    for m in range(1, lmax + 1):
        A.append(z * A[m - 1] - x * B[m - 1])
        B.append(x * A[m - 1] + z * B[m - 1])
    P = {}
    for m in range(0, lmax + 1):
        P.setdefault(m, {})[m] = torch.full_like(x, _dfact(2 * m - 1))
        if m + 1 <= lmax:
            P.setdefault(m + 1, {})[m] = (2 * m + 1) * y * P[m][m]
        for l in range(m + 2, lmax + 1):
            P.setdefault(l, {})[m] = (
                (2 * l - 1) * y * P[l - 1][m]
                - (l - 1 + m) * r2 * P[l - 2][m]) / (l - m)
    comps = []
    for l in range(1, lmax + 1):
        c_l = 1.0 if l <= 2 else _math.sqrt(2 * l + 1)
        for m in range(l, 0, -1):
            n_lm = _math.sqrt(2.0 * _math.factorial(l - m)
                              / _math.factorial(l + m))
            comps.append((c_l * n_lm) * P[l][m] * B[m])
        comps.append(c_l * P[l][0])
        for m in range(1, l + 1):
            n_lm = _math.sqrt(2.0 * _math.factorial(l - m)
                              / _math.factorial(l + m))
            comps.append((c_l * n_lm) * P[l][m] * A[m])
    return torch.stack(comps, dim=-1)


def reference_forward(sd, cfg, z, pos, edge_src, edge_dst):
    """Reference GotenNet forward (h, X) on one flat graph batch.

    Args:
        sd: reference-format state dict (numpy arrays).
        cfg: GotenNetConfig (subset supported, see module docstring).
        z: [N] atomic numbers; edge_src/edge_dst: [E] int (real edges
            only, destination = center, self-loops included).
    """
    from gotennet_tpu.models.gotennet import parse_edge_updates
    assert cfg.activation in ("swish", "silu")
    info = parse_edge_updates(cfg.edge_updates)
    torch_z = torch.as_tensor(np.asarray(z), dtype=torch.long)
    # pass tensors through untouched so autograd w.r.t. positions
    # (force-training oracles) flows into the geometry
    if not isinstance(pos, torch.Tensor):
        pos = torch.as_tensor(np.asarray(pos), dtype=torch.float32)
    src = torch.as_tensor(np.asarray(edge_src), dtype=torch.long)
    dst = torch.as_tensor(np.asarray(edge_dst), dtype=torch.long)
    n = pos.shape[0]
    D = cfg.n_atom_basis
    H = cfg.num_heads
    mult = cfg.multiplier
    L = cfg.sh_dim

    vec = pos[src] - pos[dst]
    nonloop = src != dst
    d = torch.zeros(src.shape[0])
    d[nonloop] = torch.linalg.norm(vec[nonloop], dim=-1)

    h = torch.as_tensor(sd["A_na.weight"])[torch_z]
    phi = _rbf(cfg.radial_basis, d, cfg.cutoff, cfg.n_rbf)

    # NodeInit (self-loops stripped)
    h_src_emb = torch.as_tensor(sd["node_init.A_nbr.weight"])[torch_z]
    r_feat = _lin(phi, sd, "node_init.W_ndp.dense_layers.0") \
        * _cos_cutoff(d, cfg.cutoff)[:, None]
    msg = h_src_emb[src] * r_feat
    m_i = _scatter_add(msg[nonloop], dst[nonloop], n)
    fused = torch.cat([h, m_i], dim=-1)
    y = _lin(fused, sd, "node_init.W_nrd_nru.dense_layers.0")
    y = torch.nn.functional.layer_norm(
        y, (D,), torch.as_tensor(sd["node_init.W_nrd_nru.dense_layers.0.norm.weight"]),
        torch.as_tensor(sd["node_init.W_nrd_nru.dense_layers.0.norm.bias"]),
        eps=1e-5)
    y = _silu(y)
    h = _lin(y, sd, "node_init.W_nrd_nru.dense_layers.1")

    # EdgeInit
    t = (h[dst] + h[src]) * _lin(phi, sd, "edge_init.W_erp")

    # geometry (torch-differentiable so force-training oracles can
    # autograd through the spherical harmonics)
    vec_n = torch.where(nonloop[:, None],
                        vec / torch.where(nonloop, d, torch.ones_like(d)
                                          )[:, None], vec)
    rl = _torch_spherical_harmonics(vec_n, cfg.lmax)
    counts = _scatter_add(torch.ones_like(d), src, n)
    n_edges = counts[src]

    X = torch.zeros(n, L, D)
    for i in range(cfg.n_interactions):
        g = f"gata_list.{i}"
        if cfg.layernorm:
            h = torch.nn.functional.layer_norm(
                h, (D,), torch.as_tensor(sd[f"{g}.layernorm.weight"]),
                torch.as_tensor(sd[f"{g}.layernorm.bias"]))
        if cfg.steerable_norm:
            X = _tensor_layer_norm(X, cfg.lmax)
        q = _lin(h, sd, f"{g}.W_q").reshape(n, H, D // H)
        k = _lin(h, sd, f"{g}.W_k").reshape(n, H, D // H)
        xg = _lin(_silu(_lin(h, sd, f"{g}.gamma_s.0")), sd, f"{g}.gamma_s.1")
        v = _lin(_silu(_lin(h, sd, f"{g}.gamma_v.0")), sd, f"{g}.gamma_v.1")
        t_attn = _silu(_lin(t, sd, f"{g}.W_re"))
        t_filter = _lin(t, sd, f"{g}.W_rs")

        logit = (q[dst] * k[src]
                 * t_attn.reshape(-1, H, D // H)).sum(-1, keepdim=True)
        attn = _seg_softmax(logit, dst, n)
        if cfg.scale_edge:
            attn = attn * (torch.sqrt(n_edges)[:, None, None]
                           / math.sqrt(D))
        else:
            attn = attn / math.sqrt(D)
        sea = (attn * v[src].reshape(-1, H, (mult * D) // H)
               ).reshape(-1, mult * D)
        spatial = t_filter * xg[src] * _cos_cutoff(d, cfg.cutoff)[:, None]
        o = spatial + sea

        o_s = o[:, :D]
        off = D
        dX = torch.zeros(o.shape[0], L, D)
        for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
            o_d = o[:, off + (l * D if cfg.sep_dir else 0):
                    off + (l * D if cfg.sep_dir else 0) + D]
            dX[:, lo:hi, :] += rl[:, lo:hi, None] * o_d[:, None, :]
        off += (cfg.lmax if cfg.sep_dir else 1) * D
        for l, (lo, hi) in enumerate(degree_slices(cfg.lmax)):
            o_t = o[:, off + (l * D if cfg.sep_tensor else 0):
                    off + (l * D if cfg.sep_tensor else 0) + D]
            dX[:, lo:hi, :] += X[src][:, lo:hi, :] * o_t[:, None, :]

        h = h + _scatter_aggr(cfg.aggr, o_s, dst, n)
        X = X + _scatter_aggr(cfg.aggr, dX, dst, n)

        last = i == cfg.n_interactions - 1
        if not last and cfg.edge_updates:
            EQ = X @ torch.as_tensor(sd[f"{g}.W_vq.weight"]).T
            if cfg.sep_htr:
                EK = torch.cat([
                    X[:, lo:hi, :] @ torch.as_tensor(
                        sd[f"{g}.W_vk.{l}.weight"]).T
                    for l, (lo, hi) in enumerate(degree_slices(cfg.lmax))
                ], dim=1)
            else:
                EK = X @ torch.as_tensor(sd[f"{g}.W_vk.weight"]).T

            def reject(rep, r):
                proj = (rep * r[:, :, None]).sum(1, keepdim=True)
                return rep - proj * r[:, :, None]

            if cfg.sep_htr:
                w_ij = 0.0
                for lo, hi in degree_slices(cfg.lmax):
                    eq, ek = EQ[dst][:, lo:hi], EK[src][:, lo:hi]
                    if info["rej"]:
                        eq = reject(eq, rl[:, lo:hi])
                        ek = reject(ek, -rl[:, lo:hi])
                    w_ij = w_ij + (eq * ek).sum(1)
            elif not info["rej"]:
                w_ij = (EQ[dst] * EK[src]).sum(1)
            else:  # rejection over the full concatenated-degree axis
                w_ij = (reject(EQ[dst], rl)
                        * reject(EK[src], -rl)).sum(1)

            # gamma_t: MLP([D, emlp, D]) when mlp|mlpa (hidden layer
            # normed by edge_ln), else single Dense with activation
            # (reference gotennet.py:239-250)
            if info["mlp"] or info["mlpa"]:
                x0 = _lin(t, sd, f"{g}.gamma_t.dense_layers.0")
                if cfg.edge_ln == "layer":
                    x0 = torch.nn.functional.layer_norm(
                        x0, (x0.shape[-1],),
                        torch.as_tensor(
                            sd[f"{g}.gamma_t.dense_layers.0.norm.weight"]),
                        torch.as_tensor(
                            sd[f"{g}.gamma_t.dense_layers.0.norm.bias"]))
                x0 = _silu(x0)
                gt = _lin(x0, sd, f"{g}.gamma_t.dense_layers.1")
                if not info["mlp"]:  # mlpa keeps the last activation
                    gt = _silu(gt)
            else:
                gt = _silu(_lin(t, sd, f"{g}.gamma_t.dense_layers.0"))

            # gamma_w gate chain (reference gotennet.py:270-292)
            w = w_ij
            if info["lin_w"] > 0:
                if info["lin_ln"] == 1:
                    w = torch.nn.functional.layer_norm(
                        w, (w.shape[-1],),
                        torch.as_tensor(sd[f"{g}.gamma_w.0.weight"]),
                        torch.as_tensor(sd[f"{g}.gamma_w.0.bias"]))
                if info["lin_w"] % 10 == 2:
                    w = _silu(w)
                w = _lin(w, sd, f"{g}.W_edp")
                if info["lin_ln"] == 2:
                    w = torch.nn.functional.layer_norm(
                        w, (D,),
                        torch.as_tensor(sd[f"{g}.W_edp.norm.weight"]),
                        torch.as_tensor(sd[f"{g}.W_edp.norm.bias"]))
            if info["gated"] == "gatedt":
                w = torch.tanh(w)
            elif info["gated"] == "gated":
                w = torch.sigmoid(w)
            elif info["gated"] == "act":
                w = torch.nn.functional.silu(w)
            t = t + gt * w

        e = f"eqff_list.{i}"
        X_p = X @ torch.as_tensor(sd[f"{e}.W_vu.weight"]).T
        X_pn = torch.sqrt((X_p ** 2).sum(-2) + cfg.epsilon)
        ctx = torch.cat([h, X_pn], dim=-1)
        mm = _lin(_silu(_lin(ctx, sd, f"{e}.gamma_m.0")), sd,
                  f"{e}.gamma_m.1")
        m1, m2 = mm[:, :D], mm[:, D:]
        h = h + m1
        X = X + m2[:, None, :] * X_p

    return h, X


# ---------------------------------------------------------------------
# Output heads (reference outputs.py), consuming the same state-dict
# naming as published checkpoints (``output_modules.0.`` prefix).
# ---------------------------------------------------------------------

def atomwise_head(sd, h, z, batch_idx, n_graphs, n_layers=2,
                  act=_silu, prefix="output_modules.0."):
    """Reference Atomwise (outputs.py:232-376): SchnetMLP -> per-atom
    ScaleShift standardization -> +atomref -> graph scatter-sum."""
    x = h
    for i in range(n_layers):
        x = _lin(x, sd, f"{prefix}out_net.1.out_net.{i}")
        if i < n_layers - 1:
            x = act(x)
    mean = torch.as_tensor(sd.get(f"{prefix}standardize.mean",
                                  torch.zeros(1)))
    stddev = torch.as_tensor(sd.get(f"{prefix}standardize.stddev",
                                    torch.ones(1)))
    yi = x * stddev + mean
    ar_key = f"{prefix}atomref.weight"
    if ar_key in sd:
        yi = yi + torch.as_tensor(sd[ar_key])[
            torch.as_tensor(np.asarray(z), dtype=torch.long)]
    return _scatter_add(yi, batch_idx, n_graphs)


def _gated_equivariant_block(sd, l0, l1, n_sout, n_vout, name,
                             act=_silu, sact=None):
    """Reference GatedEquivariantBlock (outputs.py:24-92)."""
    w_mix = torch.as_tensor(sd[f"{name}.mix_vectors.weight"])
    vmix = l1 @ w_mix.T  # [N, 3, 2*n_vout]
    v_V, v_W = vmix[..., :n_vout], vmix[..., n_vout:]
    v_Vn = torch.norm(v_V, dim=-2)
    ctx = torch.cat([l0, v_Vn], dim=-1)
    x = act(_lin(ctx, sd, f"{name}.scalar_net.0"))
    x = _lin(x, sd, f"{name}.scalar_net.1")
    s_out, gate = x[..., :n_sout], x[..., n_sout:]
    v_out = gate.unsqueeze(-2) * v_W
    if sact is not None:
        s_out = sact(s_out)
    return s_out, v_out


def dipole_head(sd, h, X, pos, batch_idx, n_graphs, n_hidden,
                prefix="output_modules.0."):
    """Reference Dipole with predict_magnitude (outputs.py:379-468)."""
    l0, l1 = h, X[:, 0:3, :]
    l0, l1 = _gated_equivariant_block(
        sd, l0, l1, n_hidden, n_hidden,
        f"{prefix}equivariant_layers.0", sact=_silu)
    l0, l1 = _gated_equivariant_block(
        sd, l0, l1, 1, 1, f"{prefix}equivariant_layers.1")
    atomic_dipoles = torch.squeeze(l1, -1)
    y = atomic_dipoles + pos * l0
    y = _scatter_add(y, batch_idx, n_graphs)
    return torch.norm(y, dim=1, keepdim=True)


def _ssp(x):
    return torch.nn.functional.softplus(x) - math.log(2.0)


def ese_head(sd, h, z, pos, batch_idx, n_graphs, n_layers=2,
             prefix="output_modules.0."):
    """Reference ElectronicSpatialExtentV2 (outputs.py:471-542)."""
    x = h
    for i in range(n_layers):
        x = _lin(x, sd, f"{prefix}out_net.1.out_net.{i}")
        if i < n_layers - 1:
            x = _ssp(x)
    mass = torch.as_tensor(sd[f"{prefix}atomic_mass"])[
        torch.as_tensor(np.asarray(z), dtype=torch.long)].view(-1, 1)
    msum = _scatter_add(mass, batch_idx, n_graphs)
    c = _scatter_add(mass * pos, batch_idx, n_graphs) / msum
    yi = torch.norm(pos - c[batch_idx], dim=1, keepdim=True) ** 2 * x
    return _scatter_add(yi, batch_idx, n_graphs)


_BUFFER_SUFFIXES = ("standardize.mean", "standardize.stddev",
                    "atomref.weight", "atomic_mass")


class TorchGotenModel(torch.nn.Module):
    """Trainable pure-torch oracle of the FULL reference model
    (representation + Atomwise head): every state-dict entry becomes an
    ``nn.Parameter`` (buffers stay constant, like the reference's
    registered buffers / frozen atomref embedding), so torch autograd +
    torch.optim drive the exact reference math.  Used by the
    training-parity harness."""

    def __init__(self, sd, cfg, n_head_layers=2):
        super().__init__()
        self.cfg = cfg
        self.n_head_layers = n_head_layers
        self._param_keys = [k for k in sd
                            if not k.endswith(_BUFFER_SUFFIXES)]
        self._buffers_np = {k: np.asarray(sd[k], np.float32) for k in sd
                            if k.endswith(_BUFFER_SUFFIXES)}
        self.plist = torch.nn.ParameterList([
            torch.nn.Parameter(torch.as_tensor(
                np.asarray(sd[k], np.float32).copy()))
            for k in self._param_keys])

    def state(self):
        d = dict(zip(self._param_keys, self.plist))
        d.update({k: torch.as_tensor(v)
                  for k, v in self._buffers_np.items()})
        return d

    def grads_by_key(self):
        return {k: p.grad for k, p in zip(self._param_keys, self.plist)}

    def forward(self, z, pos, src, dst, batch_idx, n_graphs):
        sd = self.state()
        rep = {k[len("representation."):]: v for k, v in sd.items()
               if k.startswith("representation.")}
        h, _ = reference_forward(rep, self.cfg, z, pos, src, dst)
        bi = torch.as_tensor(np.asarray(batch_idx), dtype=torch.long)
        return atomwise_head(sd, h, z, bi, n_graphs,
                             n_layers=self.n_head_layers)
