"""Multi-chip scaling measurement harness.

The reference delegates all scaling to Lightning DDP/NCCL and publishes
no scaling numbers (SURVEY §2.9); the north-star target here is >=85%
per-chip edges/s efficiency at 2 hosts (BASELINE.md).  This module
measures it for every sharded trainer mode through the SAME
``Trainer``/``shard_map`` code path real training uses:

  dense_dp   dense (MXU) layout, pure data parallelism over the mesh
  edge_ep    edge layout, data x edge mesh (edge-partitioned graphs,
             psum-aggregated segment reductions)
  ell_rows   ELL layout, destination-row sharding over the edge axis

For each mode it times the jitted train step at world size n and at
world size 1 with the *same per-device workload* (weak scaling) and
reports per-chip real-edges/s plus efficiency(n) = per_chip(n) /
per_chip(1).

Runs on anything ``jax.devices()`` exposes: real multi-chip TPU slices
(hardware day is ``BENCH_NDEV=n python bench.py``) or the virtual
8-device CPU mesh (``xla_force_host_platform_device_count``), where the
absolute numbers are meaningless but the full measurement plumbing —
meshes, shardings, collectives, timing, efficiency math — is exercised
end to end (``__graft_entry__.dryrun_multichip`` prints one line per
mode).
"""

from __future__ import annotations

import tempfile
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

__all__ = ["multichip_bench", "MODES"]

MODES = ("dense_dp", "edge_ep", "ell_rows")


def _count_real_edges(ds, n_graphs: int, cutoff: float) -> int:
    """Real (cutoff) edge count of the first ``n_graphs`` molecules —
    the layout-independent throughput unit (matches bench.py's
    accounting via the edge builder)."""
    from gotennet_tpu.data.dataset import BatchLoader

    sub = ds.subset(range(n_graphs))
    eb = next(iter(BatchLoader(sub, batch_size=n_graphs, cutoff=cutoff)))
    return int(np.asarray(eb.edge_mask).sum())


def _make_loader(mode: str, ds, cfg, batch_size: int):
    from gotennet_tpu.data.dataset import (
        BatchLoader,
        DenseLoader,
        ELLLoader,
    )

    if mode == "dense_dp":
        return DenseLoader(ds, batch_size=batch_size)
    if mode == "ell_rows":
        return ELLLoader(ds, batch_size=batch_size, cutoff=cfg.cutoff)
    return BatchLoader(ds, batch_size=batch_size, cutoff=cfg.cutoff)


_LAYOUT = {"dense_dp": "dense", "edge_ep": "edge", "ell_rows": "ell"}


def _time_mode(mode: str, cfg, ds, *, batch_size: int, data_parallel: int,
               edge_parallel: int, steps: int, lr: float = 1e-4) -> float:
    """Seconds per optimizer step for one (mode, mesh) point."""
    from gotennet_tpu.models.model import GotenModel
    from gotennet_tpu.tasks.qm9 import QM9Task
    from gotennet_tpu.train.trainer import Trainer, TrainerConfig

    task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
    model = GotenModel(cfg, task.build_head(), layout=_LAYOUT[mode])
    loader = _make_loader(mode, ds, cfg, batch_size)
    with tempfile.TemporaryDirectory() as wd:
        tcfg = TrainerConfig(lr=lr, workdir=wd,
                             data_parallel=data_parallel,
                             edge_parallel=edge_parallel)
        trainer = Trainer(model, task, tcfg)
        params = trainer.model.init(jax.random.PRNGKey(0),
                                    next(iter(loader)))
        batch = next(iter(trainer._train_batches(loader)))
        opt_state = trainer.tx.init(params)
        rng = jax.random.PRNGKey(1)
        # warmup = compile; then K timed sequential steps.  The batch is
        # reused (only params/opt_state are donated); carries stay on
        # device, one block at the end.
        params, opt_state, rng, logs = trainer._train_step(
            params, opt_state, batch, rng, 1.0)
        jax.block_until_ready(logs["loss"])
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, rng, logs = trainer._train_step(
                params, opt_state, batch, rng, 1.0)
        jax.block_until_ready(logs["loss"])
        return (time.time() - t0) / steps


def multichip_bench(n_devices: Optional[int] = None, *,
                    cfg=None, steps: int = 5, batch_size: int = 8,
                    n_mol_min: int = 12, n_mol_max: int = 29,
                    modes: Sequence[str] = MODES,
                    seed: int = 0) -> List[Dict]:
    """Measure per-chip edges/s + weak-scaling efficiency per mode.

    Returns one record per mode:
    ``{mode, n_devices, mesh, step_ms, per_chip_edges_per_s,
    per_chip_edges_per_s_1dev, efficiency}``.
    """
    from gotennet_tpu.data.dataset import synthetic_molecules
    from gotennet_tpu.models.gotennet import GotenNetConfig

    if n_devices is None:
        n_devices = len(jax.devices())
    if cfg is None:
        cfg = GotenNetConfig(n_atom_basis=64, n_interactions=2, lmax=2,
                             n_rbf=16, num_heads=4, attn_dropout=0.0)
    # weak scaling: every device consumes ``batch_size`` graphs per
    # step in both the 1-device and the n-device run
    ds = synthetic_molecules(batch_size * n_devices, seed=seed,
                             min_atoms=n_mol_min, max_atoms=n_mol_max)
    records = []
    for mode in modes:
        if mode == "dense_dp":
            dp_n, ep_n = n_devices, 1
        else:
            # edge/row sharding rides the inner mesh axis
            ep_n = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
            dp_n = n_devices // ep_n
            if ep_n == 1 and n_devices > 1:
                continue  # odd world size: no edge axis to measure
        dt_n = _time_mode(mode, cfg, ds, batch_size=batch_size,
                          data_parallel=dp_n, edge_parallel=ep_n,
                          steps=steps)
        dt_1 = _time_mode(mode, cfg, ds, batch_size=batch_size,
                          data_parallel=1, edge_parallel=1, steps=steps)
        # per-chip real-edge throughput: the n-device step consumes the
        # first n*batch_size molecules (loaders iterate in dataset
        # order), the 1-device step the first batch_size
        edges_n = _count_real_edges(ds, batch_size * n_devices,
                                    cfg.cutoff)
        edges_1 = _count_real_edges(ds, batch_size, cfg.cutoff)
        per_chip_n = edges_n / dt_n / n_devices
        per_chip_1 = edges_1 / dt_1
        records.append({
            "mode": mode,
            "n_devices": n_devices,
            "mesh": {"data": dp_n, "edge": ep_n},
            "step_ms": round(dt_n * 1e3, 3),
            "per_chip_edges_per_s": round(per_chip_n, 1),
            "per_chip_edges_per_s_1dev": round(per_chip_1, 1),
            "efficiency": round(per_chip_n / per_chip_1, 4),
        })
    return records
