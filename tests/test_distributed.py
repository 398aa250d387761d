"""Real multi-HOST (multi-process) execution: two CPU processes under
``jax.distributed`` train through the full Trainer path (global mesh,
per-host loader shards, cross-host metric reduction, rank-0 NPZ
checkpointing) and must produce exactly the gradients/params of the
equivalent single-process data-parallel run.

≙ the reference's Lightning DDP ``num_nodes`` capability
(configs/datamodule/qm9.yaml:21), proven here the way SURVEY.md §4
prescribes: multi-process simulation on CPU without a pod.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.trainer import Trainer, TrainerConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the worker script run by each process; kept in-file so the test is
# self-contained and the worker provably uses the production code path
_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from gotennet_tpu.parallel import initialize_distributed
info = initialize_distributed()
assert info["process_count"] == 2, info
rank, world = info["process_index"], info["process_count"]

import numpy as np
from gotennet_tpu.data.dataset import BatchLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.trainer import Trainer, TrainerConfig

CFG = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1, n_rbf=8,
                     num_heads=4, attn_dropout=0.0)
ds = synthetic_molecules(32, seed=0, min_atoms=5, max_atoms=10)
task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                   "std": float(ds.y.std())})
model = GotenModel(CFG, task.build_head())
init_loader = BatchLoader(ds, batch_size=8, cutoff=CFG.cutoff)
train_loader = BatchLoader(ds, batch_size=8, cutoff=CFG.cutoff,
                           shuffle=True, seed=1)
val_loader = BatchLoader(ds, batch_size=8, cutoff=CFG.cutoff)
train_loader.set_shard(world, rank)
val_loader.set_shard(world, rank, pad=True)

workdir = sys.argv[1]
tcfg = TrainerConfig(lr=5e-3, max_epochs=2, scheduler="none",
                     workdir=workdir, data_parallel=2, distributed=True,
                     log_every=1000)
trainer = Trainer(model, task, tcfg)
params = model.init(jax.random.PRNGKey(0), next(iter(init_loader)))
params, history = trainer.fit(params, train_loader, val_loader)
if rank == 0:
    with open(os.path.join(workdir, "result.json"), "w") as f:
        json.dump({"history": history}, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    workdir = tmp_path / "dist"
    os.makedirs(workdir)

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(workdir)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # ---- single-process reference: same data, same dp=2 mesh ----------
    cfg = GotenNetConfig(n_atom_basis=32, n_interactions=2, lmax=1,
                         n_rbf=8, num_heads=4, attn_dropout=0.0)
    ds = synthetic_molecules(32, seed=0, min_atoms=5, max_atoms=10)
    task = QM9Task("U0", dataset_meta={"mean": float(ds.y.mean()),
                                       "std": float(ds.y.std())})
    model = GotenModel(cfg, task.build_head())
    init_loader = BatchLoader(ds, batch_size=8, cutoff=cfg.cutoff)
    train_loader = BatchLoader(ds, batch_size=8, cutoff=cfg.cutoff,
                               shuffle=True, seed=1)
    val_loader = BatchLoader(ds, batch_size=8, cutoff=cfg.cutoff)
    trainer = Trainer(model, task, TrainerConfig(
        lr=5e-3, max_epochs=2, scheduler="none",
        workdir=str(tmp_path / "ref"), data_parallel=2, log_every=1000))
    params0 = model.init(jax.random.PRNGKey(0), next(iter(init_loader)))
    params_ref, hist_ref = trainer.fit(params0, train_loader, val_loader)

    # multi-process checkpoints are NPZ (rank-0, no orbax collectives)
    ckpt = workdir / "ckpt_last"
    assert (ckpt / "params.npz").exists()
    from gotennet_tpu.train.checkpoint import load_checkpoint
    _, params_dist, _ = load_checkpoint(str(ckpt))

    ref_leaves = jax.tree.leaves(params_ref)
    dist_leaves = jax.tree.leaves(params_dist)
    assert len(ref_leaves) == len(dist_leaves)
    for a, b in zip(ref_leaves, dist_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # cross-host-reduced validation metrics match the single-process run
    result = json.load(open(workdir / "result.json"))
    for h_ref, h_dist in zip(hist_ref, result["history"]):
        np.testing.assert_allclose(h_dist["MeanAbsoluteError"],
                                   h_ref["MeanAbsoluteError"], rtol=1e-4)
        np.testing.assert_allclose(h_dist["val_loss"],
                                   h_ref["val_loss"], rtol=1e-4)
