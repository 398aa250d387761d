"""Optimizer and LR scheduling.

Reproduces the reference training recipe
(/root/reference/gotennet/models/goten_model.py:521-578): AdamW with
eps=1e-7, global-norm gradient clipping, linear LR warmup over
``lr_warmup_steps``, then either cosine annealing or
ReduceLROnPlateau(factor, patience, min_lr) driven by a monitored
validation metric.  The plateau decision is host-side (it runs once
per validation epoch); the product ``warmup * plateau_scale`` is
injected into the jitted update via ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import optax

__all__ = ["make_optimizer", "PlateauState", "plateau_update",
           "warmup_scale", "cosine_scale"]


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   grad_clip: Optional[float] = 5.0,
                   eps: float = 1e-7) -> optax.GradientTransformation:
    """AdamW(eps=1e-7) + optional global-norm clip; the learning rate is
    an injected hyperparameter (update via
    ``opt_state.hyperparams['learning_rate']``)."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def warmup_scale(step: int, warmup_steps: int) -> float:
    """Linear warmup multiplier (reference optimizer_step,
    goten_model.py:558-576)."""
    if warmup_steps <= 0:
        return 1.0
    return min(1.0, float(step + 1) / float(warmup_steps))


def cosine_scale(step: int, t_max: int, eta_min_ratio: float = 0.0) -> float:
    """CosineAnnealingLR multiplier over ``t_max`` steps."""
    if t_max <= 0:
        return 1.0
    c = 0.5 * (1 + math.cos(math.pi * min(step, t_max) / t_max))
    return eta_min_ratio + (1 - eta_min_ratio) * c


@dataclasses.dataclass
class PlateauState:
    """Host-side ReduceLROnPlateau state (mode='min', rel threshold) —
    exact torch.optim.lr_scheduler.ReduceLROnPlateau semantics (the
    reference's scheduler, goten_model.py:528-539): improvement means
    ``metric < best * (1 - threshold)`` with torch's default rel
    threshold 1e-4; ``num_bad > patience`` reduces and resets."""

    factor: float = 0.8
    patience: int = 15
    min_lr: float = 1e-7
    best: float = float("inf")
    num_bad: int = 0
    scale: float = 1.0
    threshold: float = 1e-4


def plateau_update(state: PlateauState, metric: float,
                   base_lr: float) -> PlateauState:
    """Advance the plateau scheduler by one validation epoch."""
    if math.isinf(state.best):
        better = metric < state.best
    else:
        better = metric < state.best * (1.0 - state.threshold)
    if better:
        return dataclasses.replace(state, best=metric, num_bad=0)
    num_bad = state.num_bad + 1
    if num_bad > state.patience:
        new_scale = max(state.scale * state.factor,
                        state.min_lr / max(base_lr, 1e-30))
        return dataclasses.replace(state, num_bad=0, scale=new_scale)
    return dataclasses.replace(state, num_bad=num_bad)
