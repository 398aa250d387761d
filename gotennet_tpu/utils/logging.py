"""Logging helpers and experiment-metric logger backends.

Equivalent of the reference's rank-zero-aware ``get_logger``
(/root/reference/gotennet/utils/__init__.py:42-68) — in a multi-process
``jax.distributed`` run only process 0 emits info-level logs — plus
the experiment-tracking capability of the reference's logger configs
(/root/reference/gotennet/configs/logger/: wandb, tensorboard, csv,
mlflow, neptune, comet, many_loggers).  ``make_logger`` builds a
MetricLogger that always writes ``metrics.jsonl`` and can
additionally mirror records to CSV, W&B, MLflow, Neptune, Comet
(all gated imports) and TensorBoard event files; a comma-separated
backend string activates several sinks at once (≙ many_loggers).
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Any, Dict

import numpy as np

__all__ = ["get_logger", "is_main_process", "MetricLogger", "make_logger"]

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def is_main_process() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "gotennet_tpu") -> logging.Logger:
    """Process-0-aware logger (other processes log warnings and up)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO if is_main_process()
                        else logging.WARNING)
        logger.propagate = False
    return logger


def _scalarize(record: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in record.items():
        if isinstance(v, (int, np.integer)):
            out[k] = int(v)
        elif isinstance(v, (float, np.floating)):
            out[k] = float(v)
        else:
            out[k] = v
    return out


class MetricLogger:
    """Structured metric sink: JSONL always, optional CSV / W&B /
    TensorBoard mirrors.  All writes are no-ops on non-zero processes
    (rank-zero guard, ≙ reference rank_zero_only decorators)."""

    def __init__(self, workdir: str, backend: str = "jsonl",
                 tensorboard: bool = False):
        self.workdir = workdir
        self._main = is_main_process()
        self._jsonl = None
        self._csv_enabled = False
        self._csv_files: Dict[str, Any] = {}   # phase -> (file, columns)
        self._wandb = None
        self._mlflow = None
        self._neptune = None
        self._comet = None
        self._tb = None
        if not self._main:
            return
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        # comma-separated backends mirror every record to several sinks
        # at once (≙ reference configs/logger/many_loggers.yaml)
        backends = {b.strip() for b in backend.split(",") if b.strip()}
        if "csv" in backends:
            self._csv_enabled = True
        if "wandb" in backends:
            try:
                import wandb
                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "gotennet_tpu"),
                    dir=workdir, resume="allow")
            except Exception as e:  # wandb absent or offline init failure
                get_logger().warning(
                    "wandb backend unavailable (%s); JSONL only", e)
        if "mlflow" in backends:
            # ≙ reference configs/logger/mlflow.yaml; gated import —
            # mlflow isn't baked into this image, JSONL always remains
            try:
                import mlflow
                mlflow.set_tracking_uri(os.environ.get(
                    "MLFLOW_TRACKING_URI",
                    "file://" + os.path.join(workdir, "mlruns")))
                mlflow.set_experiment(os.environ.get(
                    "MLFLOW_EXPERIMENT", "gotennet_tpu"))
                self._mlflow = mlflow
                self._mlflow_run = mlflow.start_run()
            except Exception as e:
                get_logger().warning(
                    "mlflow backend unavailable (%s); JSONL only", e)
        if "neptune" in backends:
            # ≙ reference configs/logger/neptune.yaml (gated import)
            try:
                import neptune
                self._neptune = neptune.init_run(
                    project=os.environ.get("NEPTUNE_PROJECT"),
                    name=os.environ.get("NEPTUNE_RUN_NAME"))
            except Exception as e:
                get_logger().warning(
                    "neptune backend unavailable (%s); JSONL only", e)
        if "comet" in backends:
            # ≙ reference configs/logger/comet.yaml (gated import)
            try:
                import comet_ml
                self._comet = comet_ml.Experiment(
                    project_name=os.environ.get(
                        "COMET_PROJECT", "gotennet_tpu"))
            except Exception as e:
                get_logger().warning(
                    "comet backend unavailable (%s); JSONL only", e)
        if tensorboard or "tensorboard" in backends:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except ImportError:
                pass

    def log(self, record: Dict[str, Any]) -> None:
        if not self._main:
            return
        rec = _scalarize(record)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        step = int(rec.get("step", 0))
        phase = rec.get("phase", "misc")
        if self._csv_enabled:
            # one CSV per phase: train records (loss, grad_norm) and
            # val_epoch records (MAE, lr_scale, ...) have disjoint key
            # sets, so a single shared header would silently drop
            # whichever phase logs second (≙ reference CSVLogger's
            # per-phase key sets)
            entry = self._csv_files.get(phase)
            if entry is None:
                f = open(os.path.join(self.workdir,
                                      f"metrics_{phase}.csv"), "a")
                cols = sorted(rec)
                f.write(",".join(cols) + "\n")
                entry = self._csv_files[phase] = (f, cols)
            f, cols = entry
            f.write(",".join(str(rec.get(c, "")) for c in cols) + "\n")
            f.flush()
        if self._wandb is not None:
            self._wandb.log(
                {f"{phase}/{k}": v for k, v in rec.items()
                 if isinstance(v, (int, float))}, step=step)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {f"{phase}/{k}": float(v) for k, v in rec.items()
                 if isinstance(v, (int, float)) and np.isfinite(v)},
                step=step)
        if self._neptune is not None:
            for k, v in rec.items():
                if isinstance(v, (int, float)) and np.isfinite(v):
                    self._neptune[f"{phase}/{k}"].append(v, step=step)
        if self._comet is not None:
            self._comet.log_metrics(
                {k: v for k, v in rec.items()
                 if isinstance(v, (int, float)) and np.isfinite(v)},
                prefix=phase, step=step)
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("phase", "step", "epoch"):
                    continue
                if isinstance(v, (int, float)) and np.isfinite(v):
                    self._tb.add_scalar(f"{phase}/{k}", v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        for f, _ in self._csv_files.values():
            f.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._mlflow is not None:
            self._mlflow.end_run()
        if self._neptune is not None:
            self._neptune.stop()
        if self._comet is not None:
            self._comet.end()


def make_logger(workdir: str, backend: str = "jsonl",
                tensorboard: bool = False) -> MetricLogger:
    return MetricLogger(workdir, backend, tensorboard=tensorboard)
