"""Streaming metric accumulators (MAE / MSE) in float64.

Equivalent of the torchmetrics usage in the reference
(/root/reference/gotennet/models/tasks/QM9Task.py:136-154 with
``cast_to_float64``, Task.py:process_outputs): sums of |e| / e^2 and
counts accumulate across batches on host; ``compute`` divides.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

__all__ = ["MetricAccumulator"]


@dataclasses.dataclass
class MetricAccumulator:
    """Accumulates masked absolute/squared error sums."""

    abs_sum: float = 0.0
    sq_sum: float = 0.0
    count: float = 0.0

    def update(self, pred: np.ndarray, target: np.ndarray,
               mask: np.ndarray) -> None:
        p = np.asarray(pred, np.float64)
        t = np.asarray(target, np.float64)
        m = np.asarray(mask, np.float64)
        err = (p - t) * m
        self.abs_sum += float(np.abs(err).sum())
        self.sq_sum += float((err ** 2).sum())
        self.count += float(m.sum())

    def compute(self) -> Dict[str, float]:
        n = max(self.count, 1.0)
        return {"mae": self.abs_sum / n, "mse": self.sq_sum / n}

    def reset(self) -> None:
        self.abs_sum = self.sq_sum = self.count = 0.0
