"""Benchmark: training-step throughput on the flagship QM9 config.

Prints ONE JSON line:
  {"metric": "edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": null, ...extras}

Protocol (north star in BASELINE.md): QM9-scale molecules, batch 256,
GotenNet base (n_atom_basis=256, n_interactions=4, lmax=2, n_rbf=64,
8 heads).  The metric counts REAL (unpadded) edges processed per second
through a full jitted training step (forward + backward + AdamW).
``vs_baseline`` is null because the reference publishes no throughput
numbers (BASELINE.md).

Env knobs: BENCH_BATCH (default 256), BENCH_STEPS (default 20),
BENCH_MODE=train|forward (default train).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    mode = os.environ.get("BENCH_MODE", "train")

    from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
    from gotennet_tpu.models.gotennet import GotenNetConfig
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.optim import make_optimizer
    from gotennet_tpu.train.trainer import make_loss_fn

    cfg = GotenNetConfig(n_atom_basis=256, n_interactions=4, lmax=2,
                         n_rbf=64, num_heads=8, attn_dropout=0.0)
    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    model = GotenModel(cfg, task.build_head())

    # QM9-like size distribution (~18 atoms mean, <=29 max)
    ds = synthetic_molecules(batch_size, seed=0, min_atoms=12, max_atoms=29)
    loader = BatchLoader(ds, batch_size=batch_size, cutoff=cfg.cutoff)
    batch = next(iter(loader))
    real_edges = int(np.asarray(batch.edge_mask).sum())
    real_nodes = int(np.asarray(batch.node_mask).sum())

    params = model.init(jax.random.PRNGKey(0), batch)
    loss_fn = make_loss_fn(model, task)

    if mode == "train":
        import optax
        tx = make_optimizer(1e-4, weight_decay=0.0)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, batch, rng):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, _), grads = grad_fn(params, batch, rng, False)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, batch, rng)
        jax.block_until_ready(loss)
        compile_s = time.time() - t0

        t0 = time.time()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, batch, rng)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / n_steps
    else:
        fwd = jax.jit(lambda p, b: loss_fn(p, b, None, True)[0])
        t0 = time.time()
        jax.block_until_ready(fwd(params, batch))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n_steps):
            out = fwd(params, batch)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n_steps

    edges_per_s = real_edges / dt
    print(json.dumps({
        "metric": "edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": None,
        "mode": mode,
        "batch_graphs": batch_size,
        "real_edges": real_edges,
        "real_nodes": real_nodes,
        "padded_edges": int(batch.num_edges),
        "step_ms": round(dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
