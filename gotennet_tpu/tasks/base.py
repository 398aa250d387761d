"""Task interface: losses, metrics, head construction, output mapping.

Equivalent of the reference ``Task`` ABC
(/root/reference/gotennet/models/tasks/Task.py:11-154), reduced to the
functional pieces the JAX trainer needs.  A loss/metric spec is a dict:
``{'name', 'prediction', 'target', 'loss_fn', 'loss_weight'}`` where
``prediction`` keys into the model result dict and ``target`` selects
the label source in the batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from gotennet_tpu.models.model import HeadConfig

__all__ = ["Task", "l1_loss", "mse_loss"]


def mse_loss(pred, target, mask):
    """Masked mean-squared error (mean over real entries)."""
    se = (pred - target) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1)


def l1_loss(pred, target, mask):
    ae = jnp.abs(pred - target) * mask
    return jnp.sum(ae) / jnp.maximum(jnp.sum(mask), 1)


_LOSSES = {"MSELoss": mse_loss, "L1Loss": l1_loss}


class Task:
    """Base task: single graph-level scalar property."""

    name = "base"

    def __init__(self, label: Any, dataset_meta: Optional[Dict] = None,
                 task_config: Optional[Dict] = None):
        self.label = label
        self.dataset_meta = dataset_meta or {}
        self.task_config = task_config or {}
        self.cast_to_float64 = True  # metrics accumulate in fp64

    # -- losses / metrics ------------------------------------------------
    def get_losses(self) -> List[dict]:
        loss_name = self.task_config.get("task_loss", "L1Loss")
        return [{
            "name": loss_name,
            "prediction": "property",
            "target": "y",
            "loss_fn": _LOSSES[loss_name],
            "loss_weight": 1.0,
        }]

    def get_metrics(self) -> List[dict]:
        # 'kind' selects the accumulator statistic ('mae' | 'mse') —
        # explicit, so metric names are free-form
        return [
            {"name": "MeanSquaredError", "prediction": "property",
             "target": "y", "loss_fn": mse_loss, "kind": "mse"},
            {"name": "MeanAbsoluteError", "prediction": "property",
             "target": "y", "loss_fn": l1_loss, "kind": "mae"},
        ]

    # -- head ------------------------------------------------------------
    def build_head(self) -> HeadConfig:
        mean = float(self.dataset_meta.get("mean") or 0.0)
        std = float(self.dataset_meta.get("std") or 1.0)
        return HeadConfig(kind="atomwise", mean=mean, stddev=std,
                          atomref=self.dataset_meta.get("atomref"))

    # -- targets ---------------------------------------------------------
    def get_targets(self, batch) -> Dict[str, tuple]:
        """Map target name -> (values, mask) extracted from the batch.
        Packed dense batches carry one molecule slot per (slab, local)
        pair — ``y [G, P, T]`` flattens to the model's ``[G*P]`` graph
        axis (graph/dense_batch.py flatten_nodes)."""
        y, gm = batch.y, batch.graph_mask
        if y.ndim == 3:
            y = y.reshape(-1, y.shape[-1])
            gm = gm.reshape(-1)
        gm = gm.astype(jnp.float32)[:, None]
        return {"y": (y[:, :1], gm)}
