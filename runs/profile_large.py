"""Profile one large-mode (600-700 atom, fused ELL) train step on TPU."""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gotennet_tpu.data.dataset import BatchLoader, ELLLoader, synthetic_molecules
from gotennet_tpu.models.gotennet import GotenNetConfig
from gotennet_tpu.models.model import GotenModel
from gotennet_tpu.tasks.qm9 import QM9Task
from gotennet_tpu.train.optim import make_optimizer
from gotennet_tpu.train.trainer import make_loss_fn
from gotennet_tpu.utils.profiling import profile_fn

batch_size, chunk = 8, 1
cfg = GotenNetConfig(
    n_atom_basis=256, n_interactions=4, lmax=2, n_rbf=64, num_heads=8,
    attn_dropout=0.0, fused=True, fused_htr=False, remat=False,
    fused_table_rows=2048, pair_dtype=jnp.bfloat16)
task = QM9Task("U0", dataset_meta={"mean": 0.0, "std": 1.0})
model = GotenModel(cfg, task.build_head(), layout="ell")
ds = synthetic_molecules(batch_size, seed=0, min_atoms=600, max_atoms=700,
                         box=6.3)
chunks = list(ELLLoader(ds, batch_size=chunk, cutoff=cfg.cutoff,
                        neighbor_probe="full", spatial_sort=True,
                        block_rows=64))[:batch_size]
groups = {}
for c in chunks:
    key = (jax.tree.structure(c),
           tuple(tuple(x.shape) for x in jax.tree.leaves(c)))
    groups.setdefault(key, []).append(c)
stacks = tuple(jax.tree.map(lambda *xs: jnp.stack(xs), *g)
               for g in groups.values())
print("n stacks:", len(stacks))

copts = {"xla_tpu_scoped_vmem_limit_kib": "98304"}
params = jax.jit(model.init, compiler_options=copts)(
    jax.random.PRNGKey(0), chunks[0])
loss_fn = make_loss_fn(model, task)
tx = make_optimizer(1e-4, weight_decay=0.0)
opt_state = tx.init(params)
n_chunks = len(chunks)


@functools.partial(jax.jit, compiler_options=copts)
def step(params, opt_state):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum(acc, b):
        g_acc, l_acc = acc
        (l, _), g = grad_fn(params, b, jax.random.PRNGKey(1), False)
        return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None
    carry = (jax.tree.map(jnp.zeros_like, params), jnp.float32(0.0))
    for stack in stacks:
        carry, _ = jax.lax.scan(accum, carry, stack)
    g_sum, l_sum = carry
    grads = jax.tree.map(lambda x: x / n_chunks, g_sum)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, l_sum / n_chunks


params, opt_state, l = step(params, opt_state)
float(l)  # compile + run once

s = profile_fn(lambda: float(step(params, opt_state)[2]), top_k=250)
kern = sum(op["us"] for op in s["top_ops"] if "gata" in op["name"]
           and "fusion" not in op["name"])
print(f"pallas kernels total: {kern/1e3:.2f} ms")
fus = [op for op in s["top_ops"]
       if "fusion" in op["name"] or "while" in op["name"]]
print(f"top fusions ({sum(o['us'] for o in fus)/1e3:.1f} ms shown):")
for op in fus[:35]:
    print(f"  {op['us']/1e3:8.2f} ms {op['name'][:36]:38s}"
          f" {(op['hlo'] or '')[:110]}")
