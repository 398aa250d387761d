"""Benchmark: training-step throughput on the flagship QM9 config.

Prints ONE JSON line:
  {"metric": "edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": null, ...extras}

Protocol (north star in BASELINE.md): QM9-scale molecules, batch 256,
GotenNet base (n_atom_basis=256, n_interactions=4, lmax=2, n_rbf=64,
8 heads).  The metric counts REAL (unpadded) edges processed per second
through a full training step (forward + backward + AdamW).
``vs_baseline`` is null because the reference publishes no throughput
numbers (BASELINE.md).

Timing methodology: this session reaches the TPU through a relay where
async completion events are unreliable, so N dependent steps run inside
one ``lax.scan`` and the wall time of a single scalar readback is
measured; the separately-measured readback round-trip is subtracted.

Env knobs: BENCH_BATCH (default 256), BENCH_STEPS (default 20),
BENCH_MODE=train|eval|pallas (default train; 'eval' is the
forward-only inference pipeline with eval MFU — 'forward' is an
alias; 'pallas' runs the kernel-vs-XLA microbench),
BENCH_NDEV=n for the multi-chip scaling harness (one JSON line per
sharded mode; BENCH_FORCE_CPU=1 for virtual-mesh dryruns),
BENCH_LAYOUT=dense|edge|ell
(default dense — batched [G,M,M] MXU formulation; 'edge' is the flat
scatter/segment path; 'ell' is padded [N,K] neighbor rows),
BENCH_PAIR_DTYPE=bf16|f32 (default bf16:
pair-tensor storage dtype; matmul accumulation is always f32),
BENCH_CHUNK (default 16): graphs per gradient-accumulation chunk —
the optimizer still steps once per full batch; small chunks keep
pair tensors VMEM-resident (measured optimum ~4-8),
BENCH_DATASET=qm9|md22|large|xl (qm9: 12-29-atom molecules, batch
256; md22: ~120-atom frames, batch 32; large: 600-700-atom frames,
batch 8; xl: ~4000-atom frames, batch 2 — engages the chunked
halo-windowed fused-ELL path), BENCH_FUSED (default 1: fused Pallas
message kernel), BENCH_FUSED_HTR (default 1 for md22, else 0),
BENCH_REMAT (default 0 when fused+dense else 1), BENCH_T_STATE
(bf16 inter-layer edge state, default 0), BENCH_MAX_ATOMS (dense M
padding override), BENCH_VMEM_KIB (scoped-vmem limit for the fused
VJP; default 64M, 96M for md22/large/xl), BENCH_BUCKET (size-bucketed
dense loader, default 1 for qm9), BENCH_TABLE_ROWS (chunked fused-ELL
table-window budget, default 2048).
"""

import functools
import json
import os
import sys
import time

import numpy as np


def _peak_flops(device) -> float:
    """bf16 peak FLOP/s of the benched chip (BENCH_PEAK_TFLOPS
    overrides)."""
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = getattr(device, "device_kind", str(device)).lower()
    if "v6" in kind:
        return 918e12
    if "v5 lite" in kind or "v5e" in kind or "lite" in kind:
        return 394e12
    if "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    return 394e12


def analytic_train_flops(cfg, padded_pairs: int, padded_nodes: int) -> float:
    """Matmul-dominated analytic FLOPs for ONE optimizer step of the
    dense-layout model (backward counted as 2x forward, the standard
    convention).  Counts the MXU work: pair filter projections
    (W_re/W_rs — the dominant term), SDDMM, degree/tensor
    j-aggregations, HTR pair products + gamma_t, node projections,
    node/edge init, EQFF.  Elementwise chains, softmax, norms and the
    optimizer are excluded, so the derived MFU is a LOWER bound on
    true utilization (the roofline position of the executed padded
    work; padding waste counts against it, as it should)."""
    D = cfg.n_atom_basis
    mult = cfg.multiplier
    L = cfg.sh_dim
    R = cfg.n_rbf
    C = cfg.evec_dim or D
    n = cfg.n_interactions
    P, N = float(padded_pairs), float(padded_nodes)

    fwd = 0.0
    # node/edge init: W_ndp + W_erp pair projections, NodeInit MLP
    fwd += 2 * P * R * D * 2
    fwd += N * (2 * D * D + D * D) * 2
    per_layer = 0.0
    # pair: filter projections + SDDMM + combine + j-aggregations
    per_layer += P * (D * D + D * mult * D) * 2
    per_layer += P * D * 3
    per_layer += P * mult * D * 4
    per_layer += P * 2 * L * D * 2
    # node: W_q, W_k, gamma_s (2-layer), gamma_v (2-layer)
    per_layer += N * (2 * D * D + 2 * (D * D + D * mult * D)) * 2
    # EQFF: W_vu over degrees + gamma_m MLP
    per_layer += N * (L * D * D + 4 * D * D) * 2
    # HTR (all but the last layer): EQ/EK projections, gamma_t,
    # per-degree pair products
    htr = N * 2 * L * D * C * 2 + P * D * D * 2 + P * L * C * 6
    fwd += n * per_layer + (n - 1) * htr
    return 3.0 * fwd


def _rtt_seconds():
    """Median host<->device scalar readback round-trip."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    samples = []
    for _ in range(5):
        t0 = time.time()
        float(f(x))
        samples.append(time.time() - t0)
    return float(np.median(samples))


def bench_pallas():
    """Microbench BENCH_MODE=pallas: compiled fused-GATA kernel vs the
    XLA formulation of the same message+aggregate step, flagship dense
    shapes (M=32, D=256, H=8, lmax=2, sep_dir/sep_tensor on), forward
    and forward+analytic-VJP."""
    import math

    import jax
    import jax.numpy as jnp

    from gotennet_tpu.ops.pallas.fused_gata import fused_gata_message
    from gotennet_tpu.ops.spherical import degree_slices

    # many steps: sub-ms kernels must aggregate far past the ~29 ms
    # relay RTT for the subtraction to be meaningful
    G = int(os.environ.get("BENCH_BATCH", 8))
    n_steps = int(os.environ.get("BENCH_STEPS", 500))
    M, D, H, lmax = 32, 256, 8, 2
    L = (lmax + 1) ** 2 - 1
    mult = 3 + 2 * (lmax - 1)
    key = jax.random.PRNGKey(0)

    def rand(*s):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, s, jnp.float32) * 0.3

    t = rand(G, M, M, D)
    q, k_, xg, v = rand(G, M, D), rand(G, M, D), rand(G, M, mult * D), \
        rand(G, M, mult * D)
    rl, X = rand(G, M, M, L), rand(G, M, L, D)
    env = jnp.abs(rand(G, M, M))
    scale = jnp.full((G, M, M), 1.0 / math.sqrt(D))
    W_re, b_re = rand(D, D), rand(D)
    W_rs, b_rs = rand(D, mult * D), rand(mult * D)
    rtt = _rtt_seconds()

    def make_xla_step(pd):
        def xla_step(t):
            """Same math in plain XLA, pair tensors in dtype pd
            (pd=bf16 mirrors the production GATADense path)."""
            tp = t.astype(pd)
            ta = (tp @ W_re.astype(pd) + b_re).astype(pd)
            ta = ta * jax.nn.sigmoid(ta)
            tf = (tp @ W_rs.astype(pd) + b_rs).astype(pd)
            Dh = D // H
            logits = jnp.einsum(
                "gihd,gjhd,gijhd->gijh", q.reshape(G, M, H, Dh).astype(pd),
                k_.reshape(G, M, H, Dh).astype(pd),
                ta.reshape(G, M, M, H, Dh),
                preferred_element_type=jnp.float32)
            ex = jnp.exp(logits - jnp.max(logits, 2, keepdims=True))
            attn = ex / (ex.sum(2, keepdims=True) + 1e-16) * scale[..., None]
            af = jnp.repeat(attn.astype(pd), (mult * D) // H, -1)
            o = tf * xg.astype(pd)[:, None] * env.astype(pd)[..., None] \
                + af * v.astype(pd)[:, None]
            d_h = o[..., :D].astype(jnp.float32).sum(2)
            off = D
            blocks = []
            for l, (lo, hi) in enumerate(degree_slices(lmax)):
                o_d = o[..., off + l * D: off + (l + 1) * D]
                cols = [jnp.sum((rl[..., m:m + 1].astype(pd)
                                 * o_d).astype(jnp.float32), axis=2)
                        for m in range(lo, hi)]
                blocks.append(jnp.stack(cols, 2))
            off += lmax * D
            for l, (lo, hi) in enumerate(degree_slices(lmax)):
                o_t = o[..., off + l * D: off + (l + 1) * D]
                cols = [jnp.sum((X[:, None, :, m, :].astype(pd)
                                 * o_t).astype(jnp.float32), axis=2)
                        for m in range(lo, hi)]
                blocks[l] = blocks[l] + jnp.stack(cols, 2)
            return d_h, jnp.concatenate(blocks, 2)
        return xla_step

    copts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
             if jax.default_backend() == "tpu" else None)

    def timed(fn):
        @functools.partial(jax.jit, compiler_options=copts)
        def run(t):
            def body(c, _):
                d_h, dX = fn(t + c * 1e-20)[:2]
                return c + jnp.sum(d_h[0, 0, :1]) + jnp.sum(dX[0, 0, 0, :1]), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_steps))
            return out
        float(run(t))  # compile
        t0 = time.time()
        float(run(t))
        return max(time.time() - t0 - rtt, 1e-9) / n_steps

    env_signed = jnp.where(env > 0, env, -1.0)

    def make_fused(pd):
        return lambda tt: fused_gata_message(
            tt, q, k_, xg, v, rl, X, env_signed, scale, W_re, b_re,
            W_rs, b_rs, lmax=lmax, num_heads=H, sep_dir=True,
            sep_tensor=True, pair_dtype=pd)

    from gotennet_tpu.ops.pallas.fused_gata import make_fused_gata

    def make_fused_grad(pd, pos_grads=True):
        fn = make_fused_gata(lmax, H, True, True, pair_dtype=pd,
                             pos_grads=pos_grads)

        def loss(tt):
            d_h, dX = fn(tt, q, k_, xg, v, rl, X, env_signed, scale,
                         W_re, b_re, W_rs, b_rs)
            return jnp.sum(d_h) + jnp.sum(dX)

        def both(tt):
            g = jax.grad(loss)(tt)
            return g[:, :, 0, :], g[:, :, None, 0, :1] * 0.0
        return both

    def make_xla_grad(pd):
        step = make_xla_step(pd)

        def loss(tt):
            d_h, dX = step(tt)
            return jnp.sum(d_h) + jnp.sum(dX)

        def both(tt):
            g = jax.grad(loss)(tt)
            return g[:, :, 0, :], g[:, :, None, 0, :1] * 0.0
        return both

    dt_fused = timed(make_fused(jnp.bfloat16))
    dt_fused_f32 = timed(make_fused(jnp.float32))
    dt_xla = timed(make_xla_step(jnp.bfloat16))
    dt_xla_f32 = timed(make_xla_step(jnp.float32))
    dt_fused_g = timed(make_fused_grad(jnp.bfloat16))
    # energy-only training path: VJP without position cotangents
    dt_fused_g_nopos = timed(make_fused_grad(jnp.bfloat16,
                                             pos_grads=False))
    dt_xla_g = timed(make_xla_grad(jnp.bfloat16))
    pairs = G * M * M
    print(json.dumps({
        "metric": "fused_gata_pairs_per_s",
        "value": round(pairs / dt_fused, 1),
        "unit": "pairs/s",
        "vs_baseline": None,
        "mode": "pallas",
        "xla_pairs_per_s": round(pairs / dt_xla, 1),
        "fused_ms": round(dt_fused * 1e3, 3),
        "fused_f32_ms": round(dt_fused_f32 * 1e3, 3),
        "xla_ms": round(dt_xla * 1e3, 3),
        "xla_f32_ms": round(dt_xla_f32 * 1e3, 3),
        "fused_fwdbwd_ms": round(dt_fused_g * 1e3, 3),
        "fused_fwdbwd_nopos_ms": round(dt_fused_g_nopos * 1e3, 3),
        "xla_fwdbwd_ms": round(dt_xla_g * 1e3, 3),
        "batch_graphs": G,
        "device": str(jax.devices()[0]),
    }))


def bench_multichip():
    """BENCH_NDEV=n: per-chip edges/s + weak-scaling efficiency for
    every sharded trainer mode (data-parallel dense, data x edge edge
    partitioning, ELL row sharding) over the first n visible devices —
    utils/bench_multichip.py through the real Trainer/shard_map path.
    One JSON line per mode.  Hardware day (a real multi-chip slice) is
    exactly this invocation; BENCH_FORCE_CPU=1 proves the plumbing on a
    virtual CPU mesh when the slice has fewer devices.  BENCH_NDEV_D /
    BENCH_NDEV_LAYERS size the model (default 128/3 — big enough that
    collectives overlap matters, small enough for CPU dryruns);
    BENCH_BATCH is the per-device graphs per step (default 32)."""
    import jax

    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.utils.bench_multichip import multichip_bench

    n = int(os.environ["BENCH_NDEV"])
    avail = len(jax.devices())
    if n > avail:
        raise SystemExit(
            f"BENCH_NDEV={n} but only {avail} devices visible; on a "
            f"CPU host set BENCH_FORCE_CPU=1 (virtual mesh) or run on "
            f"a TPU slice with >= {n} chips")
    cfg = GotenNetConfig(
        n_atom_basis=int(os.environ.get("BENCH_NDEV_D", 128)),
        n_interactions=int(os.environ.get("BENCH_NDEV_LAYERS", 3)),
        lmax=2, n_rbf=32, num_heads=8, attn_dropout=0.0)
    for r in multichip_bench(
            n, cfg=cfg,
            steps=int(os.environ.get("BENCH_STEPS", 5)),
            batch_size=int(os.environ.get("BENCH_BATCH", 32))):
        print(json.dumps({
            "metric": "multichip_scaling_efficiency",
            "value": r["efficiency"],
            "unit": "per-chip edges/s ratio vs 1 device",
            "vs_baseline": None,  # reference publishes no scaling data
            **r,
        }))


def main():
    import jax
    import jax.numpy as jnp

    # persistent XLA cache (production default, GOTENNET_XLA_CACHE=0
    # disables): compile_s below is therefore the LAUNCH cost a user
    # pays — ~60 s on a cold cache, seconds once warm
    from gotennet_tpu.utils.xla_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()

    if os.environ.get("BENCH_MODE") == "pallas":
        return bench_pallas()

    if os.environ.get("BENCH_NDEV"):
        return bench_multichip()

    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    mode = os.environ.get("BENCH_MODE", "train")
    if mode == "eval":
        # evaluation/inference throughput (≙ reference
        # testing_pipeline.py as a first-class pipeline): forward-only,
        # deterministic (dropout off), same real-edge accounting
        mode = "forward"
    layout = os.environ.get("BENCH_LAYOUT", "dense")
    pair_dtype = os.environ.get("BENCH_PAIR_DTYPE", "bf16")
    dataset = os.environ.get("BENCH_DATASET", "qm9")
    if dataset == "md22":
        # dense wins even at M=120 with ~7x pair padding (see PERF.md);
        # set BENCH_LAYOUT=edge to measure the sparse path
        layout = os.environ.get("BENCH_LAYOUT", "dense")
        batch_size = int(os.environ.get("BENCH_BATCH", 32))
        # fused sweep (PERF.md): 4-frame chunks optimal (133.8 ms vs
        # 137.0 at 1); the unfused path prefers single-frame chunks
        default_chunk = (4 if os.environ.get("BENCH_FUSED", "1") == "1"
                         else 1)
    elif dataset == "large":
        # 10^3-atom regime (the ELL layout's target): 600-700-atom
        # frames at condensed-phase density, batch 8
        layout = os.environ.get("BENCH_LAYOUT", "ell")
        batch_size = int(os.environ.get("BENCH_BATCH", 8))
        default_chunk = 1
    elif dataset == "xl":
        # 10^4-atom regime: single ~4000-atom frames — node tables
        # exceed the fused kernel's VMEM bound, so the chunked
        # (halo-windowed) fused path engages (fused_table_rows)
        layout = os.environ.get("BENCH_LAYOUT", "ell")
        batch_size = int(os.environ.get("BENCH_BATCH", 2))
        default_chunk = 1
    else:
        # train: 16-graph chunks overtook 8 once merge_proj + the
        # SH-assembly fix cut the per-chunk dispatch overhead (42.8 vs
        # 43.4 ms; pre-merge the pair was a tie at 44.8/44.9 — PERF.md
        # round 5).  eval measured best at 8 (12.2 ms vs 13.1 at 32).
        default_chunk = 16 if mode == "train" else 8
    if layout == "ell" and dataset == "md22":
        # fused-ELL node tables are VMEM-resident: ~120-atom frames
        # hold to ~4 frames (N~480) per accumulation chunk
        default_chunk = 4
    chunk = int(os.environ.get("BENCH_CHUNK", default_chunk
                               if layout in ("dense", "ell")
                               else batch_size))
    chunk = min(chunk, batch_size)
    n_chunks = batch_size // chunk

    from gotennet_tpu.data.dataset import (
        BatchLoader, DenseLoader, ELLLoader, synthetic_molecules)
    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.optim import make_optimizer
    from gotennet_tpu.train.trainer import make_loss_fn

    # fused Pallas message kernel is the default headline path
    # (1.19M vs 1.08M edges/s unfused at batch-256 QM9, v5e-1)
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    # HTR kernel: loses to XLA's elementwise fusion at QM9 shapes but
    # wins at MD22 pair volume (PERF.md) — default per dataset; the
    # ELL layout has its own HTR kernel (the dominant 10^3-atom cost)
    fused_htr = os.environ.get(
        "BENCH_FUSED_HTR",
        "1" if fused and (dataset == "md22" or layout == "ell")
        else "0") == "1"
    # remat: with the fused kernels the big pair tensors never become
    # residuals (the custom_vjp saves only node tensors + softmax), so
    # block remat buys nothing and costs a forward recompute
    remat = os.environ.get(
        "BENCH_REMAT",
        "0" if (fused and layout in ("dense", "ell")) else "1") == "1"
    cfg = GotenNetConfig(
        n_atom_basis=256, n_interactions=4, lmax=2, n_rbf=64, num_heads=8,
        attn_dropout=0.0, fused=fused, fused_htr=fused_htr, remat=remat,
        edge_state_pair_dtype=os.environ.get("BENCH_T_STATE", "0") == "1",
        # chunked fused-ELL table budget (BENCH_TABLE_ROWS, rows)
        fused_table_rows=int(os.environ.get("BENCH_TABLE_ROWS", 2048)),
        # lax.scan over the homogeneous layers (BENCH_SCAN, default
        # off): compiles ~40% faster but the scan's backward pays
        # ~17 ms/step in stacked-gradient accumulation fusions at the
        # QM9 headline (measured r04) — a compile-vs-step tradeoff
        scan_layers=os.environ.get("BENCH_SCAN", "0") == "1",
        pair_dtype=jnp.bfloat16 if pair_dtype == "bf16" else jnp.float32,
        # node-projection compute dtype (BENCH_NODE_DTYPE, default
        # bf16): the steerable [N, L, D] projections + EQFF are the
        # bulk of the non-kernel matmul time and f32 runs them at ~1/4
        # MXU rate; params/residual streams stay f32 (PERF.md r05)
        node_dtype=(jnp.bfloat16
                    if os.environ.get("BENCH_NODE_DTYPE", "bf16") == "bf16"
                    else jnp.float32))
    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    model = GotenModel(cfg, task.build_head(), layout=layout)

    if dataset == "md22":
        # MD22 AT-AT-CG-CG-scale frames: >100 atoms at condensed-phase
        # density (~25-30 neighbors within the 5 A cutoff)
        ds = synthetic_molecules(batch_size, seed=0, min_atoms=110,
                                 max_atoms=120, box=6.3)
    elif dataset == "large":
        # same condensed-phase density as the md22 mode (box is
        # density-normalized: ~0.05 atoms/A^3, ~25-30 neighbors in
        # the 5 A cutoff) at 600-700 atoms -> ELL K~32 vs dense
        # M=704 (20x pair padding)
        ds = synthetic_molecules(batch_size, seed=0, min_atoms=600,
                                 max_atoms=700, box=6.3)
    elif dataset == "xl":
        # BENCH_MIN_ATOMS/BENCH_MAX_ATOMS override the frame size
        # (hardware size sweeps; CPU integration dry-runs)
        ds = synthetic_molecules(
            batch_size, seed=0,
            min_atoms=int(os.environ.get("BENCH_MIN_ATOMS", 4000)),
            max_atoms=int(os.environ.get("BENCH_MAX_ATOMS", 4200)),
            box=6.3)
    else:
        # QM9-like size distribution (~18 atoms mean, <=29 max)
        ds = synthetic_molecules(batch_size, seed=0, min_atoms=12,
                                 max_atoms=29)
    # real edge count (the throughput unit) always from the edge builder
    eb = next(iter(BatchLoader(ds, batch_size=batch_size, cutoff=cfg.cutoff)))
    real_edges = int(np.asarray(eb.edge_mask).sum())
    real_nodes = int(np.asarray(eb.node_mask).sum())
    # size bucketing (dense layout): pad each accumulation chunk only
    # to its own max molecule size (multiple of 8) instead of the
    # global max — ~1.7x fewer padded pairs at QM9's 12-29-atom spread
    # for a handful of compiled M shapes (BENCH_BUCKET=0 to disable)
    bucket = (layout == "dense"
              and os.environ.get(
                  "BENCH_BUCKET", "1" if dataset == "qm9" else "0") == "1")
    pack = layout == "dense" and os.environ.get("BENCH_PACK", "0") == "1"
    if layout == "dense":
        # BENCH_MAX_ATOMS overrides the dense M padding (the fused
        # kernel i-tiles M into multiple-of-8 divisors; M=120 -> TI=24)
        # BENCH_PACK=1: block-diagonal packing — several molecules per
        # M=32 slab, cross-molecule pairs masked (collate_dense_packed)
        ma = os.environ.get("BENCH_MAX_ATOMS")
        chunks = list(DenseLoader(ds, batch_size=chunk,
                                  max_atoms=int(ma) if ma else None,
                                  bucket=bucket and not pack,
                                  pack=pack,
                                  bucket_window=n_chunks))[:n_chunks]
        padded_pairs = int(sum(c.num_graphs * c.max_atoms ** 2
                               for c in chunks))
        padded_nodes = int(sum(c.num_graphs * c.max_atoms
                               for c in chunks))
        example = max(chunks, key=lambda c: c.max_atoms)
    elif layout == "ell":
        # windowed one-hot gathers (spatially sorted atoms) replace
        # XLA's pathological [N, K] row gathers; default on for the
        # 10^3-atom mode (BENCH_SPATIAL=0 / BENCH_BLOCK_ROWS override)
        spatial = os.environ.get(
            "BENCH_SPATIAL",
            "1" if dataset in ("large", "xl") else "0") == "1"
        br = (int(os.environ.get("BENCH_BLOCK_ROWS", "64"))
              if spatial else None)
        chunks = list(ELLLoader(ds, batch_size=chunk, cutoff=cfg.cutoff,
                                neighbor_probe="full",
                                spatial_sort=spatial,
                                block_rows=br))[:n_chunks]
        example = chunks[0]
        padded_pairs = int(n_chunks * example.num_nodes
                           * example.max_neighbors)
        padded_nodes = int(n_chunks * example.num_nodes)
    else:
        chunks = list(BatchLoader(ds, batch_size=chunk,
                                  cutoff=cfg.cutoff))[:n_chunks]
        example = chunks[0]
        padded_pairs = int(n_chunks * example.num_edges)
        padded_nodes = int(n_chunks * example.num_nodes)
    # group same-shape chunks into stacks: the jitted step scans each
    # stack (bucketing yields one stack per M; unbucketed = one stack)
    groups = {}
    for c in chunks:
        # key includes the treedef: static metadata (ELL gather
        # windows) must match within a stack, not just leaf shapes
        key = (jax.tree.structure(c),
               tuple(tuple(x.shape) for x in jax.tree.leaves(c)))
        groups.setdefault(key, []).append(c)
    stacks = tuple(jax.tree.map(lambda *xs: jnp.stack(xs), *g)
                   for g in groups.values())

    # md22: the i-tiled dense VJP; large: the fused-ELL VJP's table +
    # grad accumulators (N=704 needs 66M unchunked); xl: the chunked
    # kernels' halo windows (pair blocks self-cap to this budget,
    # ops/pallas/fused_ell.py:capped_pairs)
    vmem_kib = os.environ.get(
        "BENCH_VMEM_KIB",
        "114688" if dataset == "xl"
        else "98304" if dataset in ("md22", "large") else "65536")
    on_tpu = jax.default_backend() == "tpu"
    init_copts = ({"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
                  if (fused and on_tpu) else None)
    params = jax.jit(model.init, compiler_options=init_copts)(
        jax.random.PRNGKey(0), example)
    loss_fn = make_loss_fn(model, task)
    rtt = _rtt_seconds()

    if mode == "train":
        import optax
        tx = make_optimizer(1e-4, weight_decay=0.0)
        opt_state = tx.init(params)

        def one_step(carry, i):
            params, opt_state = carry
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            if n_chunks == 1:
                (loss, _), grads = grad_fn(params, chunks[0], rng, False)
                loss = jnp.float32(loss)
            else:
                def accum(acc, b):
                    g_acc, l_acc = acc
                    (l, _), g = grad_fn(params, b, rng, False)
                    return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None
                carry_g = (jax.tree.map(jnp.zeros_like, params),
                           jnp.float32(0.0))
                # one scan per same-shape stack (bucketing: one per M)
                for stack in stacks:
                    carry_g, _ = jax.lax.scan(accum, carry_g, stack)
                g_sum, l_sum = carry_g
                grads = jax.tree.map(lambda x: x / n_chunks, g_sum)
                loss = l_sum / n_chunks
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        # the fused Pallas VJP's working set exceeds the 16M default
        # scoped-vmem limit at flagship shapes; v5e has 128M VMEM
        copts = ({"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
                 if (fused and on_tpu) else None)

        @functools.partial(jax.jit, compiler_options=copts)
        def run(params, opt_state):
            (params, opt_state), losses = jax.lax.scan(
                one_step, (params, opt_state), jnp.arange(n_steps))
            return losses[-1]

        t0 = time.time()
        float(run(params, opt_state))
        compile_s = time.time() - t0
        t0 = time.time()
        float(run(params, opt_state))
        dt = max(time.time() - t0 - rtt, 1e-9) / n_steps
    else:
        def one_fwd(carry, i):
            # tie each iteration to the carry so XLA cannot hoist the
            # loop-invariant forward out of the scan
            if n_chunks == 1:
                b = chunks[0].replace(pos=chunks[0].pos + carry * 1e-20)
                loss, _ = loss_fn(params, b, None, True)
                return carry + loss, None

            def body(acc, ch):
                b = ch.replace(pos=ch.pos + acc * 1e-20)
                l, _ = loss_fn(params, b, None, True)
                return acc + l, None
            total = carry
            for stack in stacks:
                total, _ = jax.lax.scan(body, total, stack)
            return total, None

        @jax.jit
        def run():
            total, _ = jax.lax.scan(one_fwd, jnp.float32(0.0),
                                    jnp.arange(n_steps))
            return total

        t0 = time.time()
        float(run())
        compile_s = time.time() - t0
        t0 = time.time()
        float(run())
        dt = max(time.time() - t0 - rtt, 1e-9) / n_steps

    if os.environ.get("BENCH_PROFILE", "0") == "1":
        # device-time breakdown of the timed step (any mode/dataset):
        # top HLO categories + ops via the JAX profiler
        from gotennet_tpu.utils.profiling import profile_fn
        if mode == "train":
            s = profile_fn(lambda: float(run(params, opt_state)),
                           top_k=60)
        else:
            s = profile_fn(lambda: float(run()), top_k=60)
        # profiler totals cover the whole scan (n_steps steps);
        # divide so the printout is per-step, matching the timing line
        print(f"  per-step device time (profiled run / {n_steps} steps):")
        for op in s["top_ops"]:
            if op["name"].startswith("while"):
                continue  # scan wrappers nest everything below
            print(f"  {op['us'] / 1e3 / n_steps:9.3f} ms  {op['name']}  "
                  f"{(op.get('hlo') or '')[:90]}")

    edges_per_s = real_edges / dt
    record = {
        "metric": "edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": None,
        "mode": mode,
        "batch_graphs": batch_size,
        "real_edges": real_edges,
        "real_nodes": real_nodes,
        "layout": layout,
        "fused": fused,
        "pair_dtype": pair_dtype,
        "dataset": dataset,
        "accum_chunks": n_chunks,
        "padded_edges": padded_pairs,
        "bucketed": bucket and not pack,
        "packed": pack,
        "step_ms": round(dt * 1e3, 3),
        "rtt_ms": round(rtt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "xla_cache": cache_dir,
        "device": str(jax.devices()[0]),
    }
    if layout == "dense":
        # auditable roofline position: analytic matmul FLOPs of the
        # executed (padded) step over the chip's bf16 peak.  Eval mode
        # is forward-only: 1/3 of the fwd+bwd convention's count.
        flops = analytic_train_flops(cfg, padded_pairs, padded_nodes)
        if mode != "train":
            flops /= 3.0
        peak = _peak_flops(jax.devices()[0])
        record["mfu"] = round(flops / dt / peak, 4)
        record["analytic_tflops_per_step"] = round(flops / 1e12, 3)
    print(json.dumps(record))


if __name__ == "__main__":
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        # virtual CPU mesh for BENCH_NDEV plumbing dryruns; must happen
        # before the first jax import (all jax imports live inside the
        # bench functions)
        n = os.environ.get("BENCH_NDEV", "8")
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={n}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    sys.exit(main())
