"""Training loop: jitted steps, loss EMA, plateau/cosine scheduling,
checkpointing, JSONL/CSV/TensorBoard logging, early stopping, and
first-class multi-device (data x edge parallel) training.

Capability equivalent of the reference's Lightning stack
(/root/reference/gotennet/models/goten_model.py +
training_pipeline.py): AdamW(eps 1e-7) with grad-clip 5.0, linear LR
warmup, ReduceLROnPlateau or cosine annealing on a monitored validation
metric, per-stage EMA *of the loss value* replacing the logged loss
(goten_model.py:448-519 — not weight EMA), separate checkpoint-selection
and early-stopping monitors (configs/experiment/qm9.yaml:33-39),
best/last checkpoints with the config serialized alongside
(config-in-checkpoint capability), and fp64 metric accumulation.

Multi-device: where the reference delegates to Lightning DDP over NCCL
(configs/trainer/default.yaml:7), ``TrainerConfig.data_parallel`` /
``edge_parallel`` build a (data, edge) mesh and run the same train/eval
math under ``shard_map`` — gradients are pmean'd over the mesh, edge
segment reductions psum over the edge axis, and XLA schedules the
collectives over ICI.  Gradient accumulation composes with both.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gotennet_tpu.models.model import GotenModel, apply_with_forces
from gotennet_tpu.train.metrics import MetricAccumulator
from gotennet_tpu.train.optim import (
    PlateauState,
    cosine_scale,
    make_optimizer,
    plateau_update,
    warmup_scale,
)

__all__ = ["TrainerConfig", "Trainer", "make_loss_fn"]


def _chunked(loader, n_accum: int):
    """Yield single batches (n_accum == 1) or stacks of n_accum
    consecutive batches along a new leading axis.  A trailing partial
    group is padded to n_accum with all-zero (fully masked) batches —
    zero masks make their loss and gradients exact zeros, and
    ``_accum_grads`` divides by the REAL chunk count (graph_mask tells
    it apart), so every loader batch trains and the final optimizer
    step of an epoch has the same semantics as a full group.  Batches
    whose capacities diverged mid-epoch (loader rebucketing,
    size-bucketed dense loaders) are zero-padded to a common shape
    before stacking."""
    if n_accum == 1:
        yield from loader
        return
    from gotennet_tpu.graph.batch import pad_stack
    buf = []
    for b in loader:
        buf.append(b)
        if len(buf) == n_accum:
            yield pad_stack(buf)
            buf = []
    if buf:
        empty = jax.tree.map(jnp.zeros_like, buf[-1])
        buf.extend([empty] * (n_accum - len(buf)))
        yield pad_stack(buf)


def _grouped(it, n: int):
    """Group an iterator into lists of n (trailing partial group is
    yielded as-is — callers decide whether to pad or fall back)."""
    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: Optional[float] = 5.0
    lr_warmup_steps: int = 0
    scheduler: str = "plateau"          # 'plateau' | 'cosine' | 'none'
    lr_decay: float = 0.8               # plateau factor
    lr_patience: int = 15
    lr_minlr: float = 1e-7
    cosine_t_max: int = 1_000_000
    max_epochs: int = 1000
    early_stopping_patience: int = 150
    # Early-stop + LR-plateau monitor (reference EarlyStopping on
    # validation/val_loss, configs/experiment/qm9.yaml:33-36).
    monitor: str = "val_loss"
    # Checkpoint-selection monitor; defaults to ``monitor``.  The
    # reference selects checkpoints on validation MAE while
    # early-stopping on val_loss (configs/experiment/qm9.yaml:37-39).
    monitor_checkpoint: Optional[str] = None
    # Loss-value EMA (reference goten_model.py:479-497): per-stage EMA
    # replaces the logged/monitored loss for stages in ``ema_stages``
    # (reference default ["train", "validation"], goten_model.py:145-148).
    # Default deviation: the EMA here is LOG/MONITOR-ONLY — the
    # optimized training objective is the raw per-batch loss.
    # The reference substitutes the EMA-smoothed value into the loss it
    # backprops when use_ema is on (goten_model.py:488-496); since the
    # previous EMA is detached there, the only gradient effect is a
    # rescale by ema_rate.  Set ``use_ema_in_loss=True`` to reproduce
    # that exactly: gradients are scaled by ema_rate (inside the jitted
    # step, BEFORE global-norm clipping — the reference clips the
    # already-scaled autograd grads) from the second train batch on,
    # while the EMA state itself stays host-side.
    ema_rate: float = 0.0               # 0 = off
    ema_stages: Tuple[str, ...] = ("train", "validation")
    use_ema_in_loss: bool = False       # reference-EMA gradient parity
    seed: int = 1
    log_every: int = 50
    workdir: str = "runs/default"
    logger: str = "jsonl"               # 'jsonl' | 'csv' | 'wandb' (+jsonl)
    tensorboard: bool = False           # also write TB event files
    resume: bool = False                # resume params from ckpt_last
    # Accumulate gradients over N consecutive loader batches before the
    # optimizer update (effective batch = N * batch_size).  Also a
    # throughput lever: on a 16 GB v5e, 4 x 64-graph chunks beat one
    # 256-graph step by ~15% (smaller live pair tensors schedule
    # better) at identical optimization semantics.
    grad_accum_steps: int = 1
    # Device mesh: data_parallel x edge_parallel devices.  1 x 1 =
    # single-device.  data: batches sharded per device, grads pmean'd.
    # edge: each batch's graph additionally split across devices — the
    # 'edge' layout shards the edge list (segment reductions psum over
    # the axis), the 'ell' layout shards destination rows (pair
    # tensors and edge state live on the owning device, node state
    # reassembled by psum) — for graphs too big for one chip.
    # Replaces the reference's Lightning DDP.
    data_parallel: int = 1
    edge_parallel: int = 1
    # Multi-HOST (multi-process) execution: the mesh spans every
    # process's devices (data_parallel/edge_parallel are GLOBAL
    # counts), each process feeds only its addressable shard of the
    # batch (jax.make_array_from_process_local_data), metrics reduce
    # across hosts, and checkpoint/log writes are rank-zero-guarded.
    # The caller (cli.train) must run
    # parallel.initialize_distributed() first.  ≙ Lightning DDP
    # num_nodes (reference configs/datamodule/qm9.yaml:21).
    distributed: bool = False


def make_loss_fn(model: GotenModel, task) -> Callable:
    """Build the weighted multi-loss closure shared by train and eval."""
    specs = task.get_losses()

    def loss_fn(params, batch, rng, deterministic):
        rngs = None if rng is None else {"dropout": rng}
        out = apply_with_forces(model, params, batch,
                                deterministic=deterministic, rngs=rngs)
        targets = task.get_targets(batch)
        total = jnp.asarray(0.0, jnp.float32)
        logs = {}
        for spec in specs:
            pred = out[spec["prediction"]]
            tgt, mask = targets[spec["target"]]
            li = spec["loss_fn"](pred.reshape(tgt.shape), tgt, mask)
            logs[spec["name"]] = li
            total = total + spec["loss_weight"] * li
        return total, (logs, out)

    return loss_fn


def _accum_grads(grad_fn, params, batch, step_rng, n_accum):
    """Gradient (and loss) over one batch, or the mean over a leading
    accumulation axis of ``n_accum`` stacked chunks.  All-masked pad
    chunks (from _chunked's trailing-group padding) contribute zero
    loss/grads and are excluded from the divisor, so partial groups
    average over their real chunks only."""
    if n_accum == 1:
        (loss, (logs, _)), grads = grad_fn(params, batch, step_rng, False)
        return loss, logs, grads

    def accum(carry, xs):
        g_acc, l_acc, n_real = carry
        chunk, i = xs
        r = jax.random.fold_in(step_rng, i)
        (l, _), g = grad_fn(params, chunk, r, False)
        real = jnp.any(chunk.graph_mask).astype(jnp.float32)
        return (jax.tree.map(jnp.add, g_acc, g), l_acc + l,
                n_real + real), None

    zero = jax.tree.map(jnp.zeros_like, params)
    (g_sum, l_sum, n_real), _ = jax.lax.scan(
        accum, (zero, jnp.float32(0.0), jnp.float32(0.0)),
        (batch, jnp.arange(n_accum)))
    n_real = jnp.maximum(n_real, 1.0)
    grads = jax.tree.map(lambda x: x / n_real, g_sum)
    return l_sum / n_real, {}, grads


class Trainer:
    """Single- or multi-device trainer.

    The model handed in may carry any ``edge_axis``; the trainer
    derives a serial variant (edge_axis=None) for single-device work
    and a sharded variant (edge_axis='edge') when ``edge_parallel > 1``
    — both share one parameter tree.
    """

    def __init__(self, model: GotenModel, task, cfg: TrainerConfig):
        self.task = task
        self.cfg = cfg
        # serial model: no collective axes — used for init, single-device
        # steps, eval fallback, and checkpoint metadata
        self.model = GotenModel(
            dataclasses.replace(model.cfg, edge_axis=None), model.head,
            layout=model.layout)
        self.tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.grad_clip)
        self.loss_fn = make_loss_fn(self.model, task)
        self.mesh = None
        self.edge_axis = None
        self.n_proc = jax.process_count() if cfg.distributed else 1
        n_dev = cfg.data_parallel * cfg.edge_parallel
        if cfg.distributed:
            if n_dev != len(jax.devices()):
                raise ValueError(
                    f"distributed=True: data_parallel*edge_parallel "
                    f"({n_dev}) must equal the GLOBAL device count "
                    f"({len(jax.devices())})")
            if cfg.data_parallel % self.n_proc:
                raise ValueError(
                    f"data_parallel ({cfg.data_parallel}) must divide "
                    f"evenly over {self.n_proc} processes")
        if n_dev > 1:
            if cfg.edge_parallel > 1 and model.layout not in ("edge",
                                                              "ell"):
                raise ValueError(
                    "edge_parallel > 1 requires the 'edge' layout "
                    "(edge partitioning) or 'ell' (destination-row "
                    "sharding)")
            from gotennet_tpu.parallel import make_mesh
            self.mesh = make_mesh((cfg.data_parallel, cfg.edge_parallel),
                                  axis_names=("data", "edge"))
            self.edge_axis = "edge" if cfg.edge_parallel > 1 else None
            par_model = GotenModel(
                dataclasses.replace(model.cfg, edge_axis=self.edge_axis),
                model.head, layout=model.layout)
            self.par_loss_fn = make_loss_fn(par_model, task)
            self._train_step = self._build_parallel_train_step()
            self._par_eval_step = self._build_parallel_eval_step()
        else:
            self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.ema: Dict[str, float] = {}
        self.plateau = PlateauState(cfg.lr_decay, cfg.lr_patience,
                                    cfg.lr_minlr)
        os.makedirs(cfg.workdir, exist_ok=True)
        from gotennet_tpu.utils.logging import make_logger
        self._logger = make_logger(cfg.workdir, cfg.logger,
                                   tensorboard=cfg.tensorboard)

    # ---- step builders -------------------------------------------------
    def _jit(self, fn, **kw):
        """jit with per-model compiler options: the fused Pallas VJP's
        working set exceeds the 16M default scoped-vmem limit at
        production shapes (v5e has 128M VMEM), so raise it when the
        model uses the fused kernel on a real TPU."""
        copts = None
        if (getattr(self.model.cfg, "fused", False)
                and jax.default_backend() == "tpu"):
            copts = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
        return jax.jit(fn, compiler_options=copts, **kw)

    def _build_train_step(self):
        loss_fn = self.loss_fn
        tx = self.tx
        n_accum = max(1, self.cfg.grad_accum_steps)

        def train_step(params, opt_state, batch, rng, lr_scale,
                       ema_scale=1.0):
            """``batch`` has a leading accumulation axis when
            grad_accum_steps > 1 (see _chunked).  ``ema_scale`` is the
            reference-EMA gradient rescale (use_ema_in_loss; 1.0 when
            off), applied before the optimizer chain so grad clipping
            sees the scaled gradients like the reference's autograd."""
            rng, step_rng = jax.random.split(rng)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            loss, logs, grads = _accum_grads(grad_fn, params, batch,
                                             step_rng, n_accum)
            grads = jax.tree.map(lambda g: g * ema_scale, grads)
            # inject scheduled LR: inner state of chain = (clip, adamw)
            opt_state = self._set_lr(opt_state, lr_scale)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            logs = dict(logs, loss=loss, grad_norm=gnorm)
            return params, opt_state, rng, logs

        return self._jit(train_step, donate_argnums=(0, 1))

    def _build_parallel_train_step(self):
        """Data(+edge)-parallel train step under shard_map: per-device
        grads (optionally accumulated), pmean over the mesh, optimizer
        update replicated — one jitted call per optimizer step."""
        from jax.sharding import PartitionSpec as P

        from gotennet_tpu.parallel.data_parallel import pspec_for_layout

        loss_fn = self.par_loss_fn
        tx = self.tx
        mesh = self.mesh
        axes = mesh.axis_names
        edge_axis = self.edge_axis
        n_accum = max(1, self.cfg.grad_accum_steps)
        with_forces = self.model.head.derivative

        def device_step(params, opt_state, batch, step_rng, lr_scale,
                        ema_scale):
            # strip the per-device leading axis added by stacking
            local = jax.tree.map(lambda x: x[0], batch)
            my_rng = step_rng
            for ax in axes:
                my_rng = jax.random.fold_in(my_rng, jax.lax.axis_index(ax))
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            loss, logs, grads = _accum_grads(grad_fn, params, local,
                                             my_rng, n_accum)
            grads = jax.tree.map(lambda g: g * ema_scale, grads)
            grads = jax.lax.pmean(grads, axes)
            loss = jax.lax.pmean(loss, axes)
            logs = jax.lax.pmean(logs, axes)
            opt_state = self._set_lr(opt_state, lr_scale)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            logs = dict(logs, loss=loss, grad_norm=gnorm)
            return params, opt_state, logs

        bspec = pspec_for_layout(self.model.layout, edge_axis,
                                 with_forces=with_forces)
        # with accumulation the batch layout is [device, accum, ...]:
        # keep the device axis sharded, leave the accum axis whole, and
        # shift any edge sharding one axis right
        if n_accum > 1:
            def insert_accum_axis(s):
                parts = tuple(s)
                if len(parts) > 1:
                    return P(parts[0], None, *parts[1:])
                return s
            bspec = jax.tree.map(insert_accum_axis, bspec)
        mapped = jax.shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), P(), bspec, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

        def train_step(params, opt_state, batch, rng, lr_scale,
                       ema_scale=1.0):
            rng, step_rng = jax.random.split(rng)
            params, opt_state, logs = mapped(params, opt_state, batch,
                                             step_rng, lr_scale,
                                             jnp.float32(ema_scale))
            return params, opt_state, rng, logs

        return self._jit(train_step, donate_argnums=(0, 1))

    def _set_lr(self, opt_state, lr_scale):
        """Write ``base_lr * lr_scale`` into the injected hyperparams."""
        base = self.cfg.lr

        def set_in(state):
            if hasattr(state, "hyperparams") and "learning_rate" in getattr(
                    state, "hyperparams", {}):
                state.hyperparams["learning_rate"] = base * lr_scale
            return state

        # InjectHyperparamsState is itself a NamedTuple — check for the
        # hyperparams attribute before treating the state as a chain.
        if hasattr(opt_state, "hyperparams"):
            return set_in(opt_state)
        if isinstance(opt_state, tuple):
            return tuple(set_in(s) for s in opt_state)
        return opt_state

    def _make_eval_fn(self, loss_fn):
        metrics = self.task.get_metrics()

        def eval_step(params, batch):
            loss, (logs, out) = loss_fn(params, batch, None, True)
            preds = {}
            targets = self.task.get_targets(batch)
            for m in metrics:
                tgt, mask = targets[m["target"]]
                preds[m["name"]] = (
                    out[m["prediction"]].reshape(tgt.shape), tgt, mask)
            return loss, logs, preds

        return eval_step

    def _build_eval_step(self):
        return self._jit(self._make_eval_fn(self.loss_fn))

    def _build_parallel_eval_step(self):
        """Sharded eval: each data shard evaluates its own batch; preds
        come back concatenated along the device axis (edge-sharded
        forward outputs are identical across the edge axis)."""
        from jax.sharding import PartitionSpec as P

        from gotennet_tpu.parallel.data_parallel import pspec_for_layout

        inner = self._make_eval_fn(self.par_loss_fn)

        def device_step(params, batch):
            local = jax.tree.map(lambda x: x[0], batch)
            loss, logs, preds = inner(params, local)
            # re-add the device axis so out_specs can concatenate
            expand = lambda x: jnp.asarray(x)[None]
            return (expand(loss), jax.tree.map(expand, logs),
                    jax.tree.map(expand, preds))

        bspec = pspec_for_layout(self.model.layout, self.edge_axis,
                                 with_forces=self.model.head.derivative)
        mapped = jax.shard_map(
            device_step, mesh=self.mesh,
            in_specs=(P(), bspec),
            out_specs=(P("data"), P("data"), P("data")),
            check_vma=False,
        )
        return self._jit(mapped)

    # ---- loops ---------------------------------------------------------
    def lr_scale(self, step: int) -> float:
        w = warmup_scale(step, self.cfg.lr_warmup_steps)
        if self.cfg.scheduler == "plateau":
            return w * self.plateau.scale
        if self.cfg.scheduler == "cosine":
            return w * cosine_scale(step, self.cfg.cosine_t_max)
        return w

    def _update_ema(self, key: str, value: float) -> float:
        """Per-stage loss-value EMA (reference goten_model.py:479-497):
        ema <- rate * value + (1 - rate) * ema, replacing the value."""
        rate = self.cfg.ema_rate
        if not (0.0 < rate < 1.0) or math.isnan(value):
            return value
        prev = self.ema.get(key)
        ema = value if prev is None else rate * value + (1 - rate) * prev
        self.ema[key] = ema
        return ema

    def _stage_ema(self, stage: str, value: float) -> float:
        if stage in self.cfg.ema_stages:
            return self._update_ema(f"{stage}_loss", value)
        return value

    def _ema_grad_scale(self) -> float:
        """Gradient rescale for the next train step under
        ``use_ema_in_loss`` (reference goten_model.py:488-496: the
        backprop'd loss is rate*loss + (1-rate)*detached EMA, so grads
        scale by ema_rate once an EMA value exists — i.e. from the
        second train batch, or immediately after a resume)."""
        cfg = self.cfg
        if (cfg.use_ema_in_loss and 0.0 < cfg.ema_rate < 1.0
                and "train" in cfg.ema_stages
                and "train_loss" in self.ema):
            return cfg.ema_rate
        return 1.0

    def _stack_group(self, group):
        """Stack a group of per-device batches and lay it out on the
        mesh.  In a multi-process run the group holds only this host's
        slots of the data axis; the shards are glued into global
        arrays."""
        from gotennet_tpu.parallel.data_parallel import (
            make_global_batch,
            shard_graph_batch,
            stack_batches,
        )
        stacked = stack_batches(group)
        if self.n_proc > 1:
            return make_global_batch(stacked, self.mesh,
                                     edge_axis=self.edge_axis,
                                     layout=self.model.layout)
        return shard_graph_batch(stacked, self.mesh,
                                 edge_axis=self.edge_axis,
                                 layout=self.model.layout)

    @property
    def _dp_local(self) -> int:
        """Data-axis slots this process feeds (= data_parallel on a
        single host)."""
        return self.cfg.data_parallel // self.n_proc

    def _train_batches(self, loader):
        """Yield per-optimizer-step batches: accumulation-chunked, and
        grouped+sharded across the data axis when a mesh is active
        (trailing partial device groups are dropped, like DDP)."""
        chunks = _chunked(loader, max(1, self.cfg.grad_accum_steps))
        if self.mesh is None:
            yield from chunks
            return
        dp = self._dp_local
        for group in _grouped(chunks, dp):
            if len(group) < dp:
                break
            yield self._stack_group(group)

    def fit(self, params, train_loader: Iterable, val_loader: Iterable,
            max_steps: Optional[int] = None):
        cfg = self.cfg
        # the jitted steps donate the param/opt-state buffers; copy once
        # at entry so the caller's arrays survive fit()
        params = jax.tree.map(jnp.array, params)
        step = 0
        start_epoch = 0
        rng = jax.random.PRNGKey(cfg.seed)
        monitor_ckpt = cfg.monitor_checkpoint or cfg.monitor
        best_stop = math.inf   # early-stop monitor
        best_ckpt = math.inf   # checkpoint-selection monitor
        bad_epochs = 0
        opt_state = self.tx.init(params)
        if cfg.resume:
            last = os.path.join(cfg.workdir, "ckpt_last")
            if os.path.isdir(last):
                # full-state resume (≙ Lightning ckpt_path,
                # training_pipeline.py:44-50): params, optimizer
                # moments, scheduler/EMA state, epoch, best metrics
                # and RNG all continue the saved trajectory
                from gotennet_tpu.train.checkpoint import (
                    load_checkpoint,
                    load_train_state,
                )
                _, params, step = load_checkpoint(last)
                params = jax.tree.map(jnp.asarray, params)
                opt_state = self.tx.init(params)
                restored_opt, ts = load_train_state(last, opt_state)
                if restored_opt is not None:
                    opt_state = restored_opt
                if ts:
                    start_epoch = int(ts.get("epoch", -1)) + 1
                    best_stop = float(ts.get("best_stop", math.inf))
                    best_ckpt = float(ts.get("best_ckpt", math.inf))
                    bad_epochs = int(ts.get("bad_epochs", 0))
                    self.ema = dict(ts.get("ema") or {})
                    pl = ts.get("plateau")
                    if pl:
                        self.plateau = dataclasses.replace(
                            self.plateau, **pl)
                    if ts.get("rng") is not None:
                        rng = jnp.asarray(
                            np.asarray(ts["rng"], np.uint32))
        history = []

        from gotennet_tpu.data.prefetch import prefetch

        for epoch in range(start_epoch, cfg.max_epochs):
            # epoch-deterministic shuffling: resumed runs reproduce the
            # uninterrupted run's batch order (≙ torch's set_epoch)
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            t0 = time.time()
            train_losses = []
            for batch in prefetch(self._train_batches(train_loader)):
                params, opt_state, rng, logs = self._train_step(
                    params, opt_state, batch, rng, self.lr_scale(step),
                    self._ema_grad_scale())
                step += 1
                loss = self._stage_ema("train", float(logs["loss"]))
                if step % cfg.log_every == 0:
                    self._log({"phase": "train", "step": step,
                               **{k: float(v) for k, v in logs.items()},
                               "loss": loss})
                train_losses.append(loss)
                if max_steps is not None and step >= max_steps:
                    break

            val = self.evaluate(params, val_loader, phase="validation")
            val["train_loss"] = (float(np.mean(train_losses))
                                 if train_losses else math.nan)
            val["epoch"] = epoch
            val["step"] = step
            val["lr_scale"] = self.lr_scale(step)
            val["epoch_time_s"] = time.time() - t0
            history.append(val)
            self._log({"phase": "val_epoch", **val})

            for key in {cfg.monitor, monitor_ckpt}:
                if key not in val:
                    raise KeyError(
                        f"monitor {key!r} not among validation metrics "
                        f"{sorted(val)}")
            monitored = val[cfg.monitor]
            if cfg.scheduler == "plateau":
                self.plateau = plateau_update(self.plateau, monitored, cfg.lr)

            improved_ckpt = val[monitor_ckpt] < best_ckpt
            if improved_ckpt:
                best_ckpt = val[monitor_ckpt]
            if monitored < best_stop:
                best_stop = monitored
                bad_epochs = 0
            else:
                bad_epochs += 1
            train_state = {
                "epoch": epoch,
                "best_stop": best_stop,
                "best_ckpt": best_ckpt,
                "bad_epochs": bad_epochs,
                "ema": dict(self.ema),
                "plateau": {"best": self.plateau.best,
                            "num_bad": self.plateau.num_bad,
                            "scale": self.plateau.scale},
                "rng": np.asarray(jax.device_get(rng)).tolist(),
            }
            if improved_ckpt:
                self.save_checkpoint(params, opt_state, step, "best",
                                     train_state=train_state)
            self.save_checkpoint(params, opt_state, step, "last",
                                 train_state=train_state)

            if bad_epochs > cfg.early_stopping_patience:
                break
            if max_steps is not None and step >= max_steps:
                break
        return params, history

    @staticmethod
    def _local_rows(tree):
        """This process's addressable rows of arrays sharded along the
        leading (data) axis, concatenated in axis order.  On a single
        process this is the whole array."""
        def rows(x):
            if hasattr(x, "addressable_shards"):
                shards = sorted(
                    x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
                return np.concatenate(
                    [np.asarray(s.data) for s in shards], axis=0)
            return np.asarray(x)
        return jax.tree.map(rows, tree)

    def evaluate(self, params, loader: Iterable,
                 phase: str = "test") -> Dict[str, float]:
        metrics = self.task.get_metrics()
        accs = {m["name"]: MetricAccumulator() for m in metrics}
        losses = []

        def consume(loss, preds):
            # per-batch stage EMA replaces the logged loss (reference
            # calculate_loss, goten_model.py:479-497); multi-host runs
            # apply the EMA once to the globally-reduced epoch loss
            # instead so every host monitors the same value
            loss = float(loss)
            losses.append(loss if self.n_proc > 1
                          else self._stage_ema(phase, loss))
            for name, (p, t, m) in preds.items():
                accs[name].update(np.asarray(p), np.asarray(t),
                                  np.asarray(m))

        if self.mesh is None:
            for batch in loader:
                loss, logs, preds = self._eval_step(params, batch)
                consume(loss, preds)
        else:
            dp = self._dp_local
            for group in _grouped(iter(loader), dp):
                # pad a trailing partial group to the device count by
                # repeating a real batch and discarding the duplicate
                # results — one compiled eval shape per loader instead
                # of a fresh _eval_step compile per odd-shaped tail
                n_real = len(group)
                if n_real < dp:
                    group = group + [group[0]] * (dp - n_real)
                ls, _, ps = self._par_eval_step(
                    params, self._stack_group(group))
                ls, ps = self._local_rows(ls), self._local_rows(ps)
                for i in range(n_real):
                    consume(ls[i], jax.tree.map(lambda x: x[i], ps))

        def kind_of(m):
            # tasks declare which statistic the metric reports; fall
            # back to name-sniffing only for third-party tasks that
            # predate the 'kind' field
            return m.get("kind") or (
                "mae" if "Absolute" in m["name"] else "mse")

        if self.n_proc > 1:
            # reduce the raw sums across hosts so every process
            # computes identical metrics (and therefore identical
            # plateau / early-stop / checkpoint decisions)
            from jax.experimental import multihost_utils
            parts = [float(np.sum(losses)), float(len(losses))]
            for m in metrics:
                a = accs[m["name"]]
                parts += [a.abs_sum, a.sq_sum, a.count]
            tot = np.asarray(multihost_utils.process_allgather(
                np.asarray(parts, np.float64))).sum(axis=0)
            val = tot[0] / max(tot[1], 1.0)
            out = {"val_loss": self._stage_ema(phase, float(val))}
            for j, m in enumerate(metrics):
                a_sum, s_sum, cnt = tot[2 + 3 * j: 5 + 3 * j]
                out[m["name"]] = float(
                    (a_sum if kind_of(m) == "mae" else s_sum)
                    / max(cnt, 1.0))
            return out

        out = {"val_loss": float(np.mean(losses)) if losses else math.nan}
        for m in metrics:
            out[m["name"]] = accs[m["name"]].compute()[kind_of(m)]
        return out

    # ---- persistence ---------------------------------------------------
    def save_checkpoint(self, params, opt_state, step: int, tag: str,
                        train_state: Optional[Dict] = None) -> None:
        from gotennet_tpu.train.checkpoint import save_checkpoint
        if self.n_proc > 1:
            # params/opt_state are fully replicated (out_specs P()):
            # pull host-local copies everywhere, write from rank 0 only
            from gotennet_tpu.utils.logging import is_main_process
            params = jax.device_get(params)
            opt_state = jax.device_get(opt_state)
            if not is_main_process():
                return
        extra = {"task": getattr(self.task, "name", None),
                 "label": getattr(self.task, "label_name",
                                  getattr(self.task, "label", None))}
        save_checkpoint(os.path.join(self.cfg.workdir, f"ckpt_{tag}"),
                        params, step=step, model=self.model,
                        extra_meta=extra, opt_state=opt_state,
                        train_state=train_state)

    def _log(self, record: Dict[str, Any]) -> None:
        self._logger.log(record)
