"""Energy + force regression tasks (rMD17 / MD22).

First-class here, unlike the reference (which registers only QM9 and
merely validates rMD17 checkpoint aliases, utils/file.py:193-196).
The loss is the standard weighted sum
``rho_E * L(E) + rho_F * L(F)`` with forces ``-dE/dpos`` produced by
the task layer's grad path (models/model.py:apply_with_forces).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from gotennet_tpu.models.model import HeadConfig
from gotennet_tpu.tasks.base import Task, _LOSSES

__all__ = ["MD17Task", "MD22Task"]


class MD17Task(Task):
    name = "rMD17"

    def __init__(self, label: Any, dataset_meta: Optional[Dict] = None,
                 task_config: Optional[Dict] = None):
        super().__init__(label, dataset_meta, task_config)
        self.energy_weight = float(self.task_config.get("energy_weight", 0.05))
        self.force_weight = float(self.task_config.get("force_weight", 0.95))

    def get_losses(self) -> List[dict]:
        loss_name = self.task_config.get("task_loss", "MSELoss")
        fn = _LOSSES[loss_name]
        return [
            {"name": f"energy_{loss_name}", "prediction": "property",
             "target": "y", "loss_fn": fn,
             "loss_weight": self.energy_weight},
            {"name": f"force_{loss_name}", "prediction": "forces",
             "target": "dy", "loss_fn": fn,
             "loss_weight": self.force_weight},
        ]

    def get_metrics(self) -> List[dict]:
        from gotennet_tpu.tasks.base import l1_loss, mse_loss
        return [
            {"name": "MeanAbsoluteError_energy", "prediction": "property",
             "target": "y", "loss_fn": l1_loss, "kind": "mae"},
            {"name": "MeanAbsoluteError_force", "prediction": "forces",
             "target": "dy", "loss_fn": l1_loss, "kind": "mae"},
            {"name": "MeanSquaredError_energy", "prediction": "property",
             "target": "y", "loss_fn": mse_loss, "kind": "mse"},
        ]

    def build_head(self) -> HeadConfig:
        mean = float(self.dataset_meta.get("mean") or 0.0)
        std = float(self.dataset_meta.get("std") or 1.0)
        return HeadConfig(
            kind="atomwise", mean=mean, stddev=std,
            atomref=self.dataset_meta.get("atomref"),
            activation="silu", derivative=True)

    def get_targets(self, batch) -> Dict[str, tuple]:
        y, gm = batch.y, batch.graph_mask
        if y.ndim == 3:  # packed dense batches: [G, P, T] molecule slots
            y = y.reshape(-1, y.shape[-1])
            gm = gm.reshape(-1)
        gm = gm.astype(jnp.float32)[:, None]
        # node_mask is [N] (edge/ell) or [G, M] (dense): mask per-atom
        # force rows along a new trailing axis either way
        nm = batch.node_mask.astype(jnp.float32)[..., None]
        out = {"y": (y[:, :1], gm)}
        if batch.dy is not None:
            out["dy"] = (batch.dy, nm)
        return out


class MD22Task(MD17Task):
    """MD22 large molecules: same energy+force structure, longer cutoff
    and larger graphs are handled by the data layer/config."""

    name = "MD22"
