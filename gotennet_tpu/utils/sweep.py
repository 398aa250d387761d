"""Grid and random-search sweeps over config overrides.

Capability equivalent of the reference's Hydra multirun + Optuna
sweeper with grid sampler (configs/hydra/default.yaml:7-8; e.g.
``train.py -m label=mu,alpha,homo``): comma-separated values in
overrides expand to a cartesian grid, each trial runs in its own run
dir, and a summary table (JSONL) collects the optimized metric per
trial.  Failed trials are recorded and skipped, like the reference's
``task_wrapper`` keeping multiruns alive (utils/utils.py:90-118).

Beyond the grid, distribution expressions enable random search (the
reference wires Optuna for this, configs/hydra/default.yaml:7):

    model.lr=loguniform(1e-5,1e-3)   log-uniform float
    model.weight_decay=uniform(0,0.1)
    model.representation.lmax=int(1,3)       inclusive integer range
    model.representation.aggr=choice(add,mean,max)

Run with ``sampler=random n_trials=N`` (CLI) or ``run_random_search``.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import re
import traceback
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["expand_grid", "run_sweep", "sample_overrides",
           "run_random_search"]

_DIST_RE = re.compile(r"^(uniform|loguniform|int|choice)\((.*)\)$")


def expand_grid(overrides: List[str]) -> List[List[str]]:
    """['a=1,2', 'b=x'] -> [['a=1','b=x'], ['a=2','b=x']]."""
    axes: List[List[str]] = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        values = raw.split(",") if "," in raw else [raw]
        axes.append([f"{key}={v}" for v in values])
    return [list(combo) for combo in itertools.product(*axes)]


def sample_overrides(overrides: List[str],
                     rng: np.random.Generator) -> List[str]:
    """Sample one trial: distribution expressions are drawn, plain
    values pass through verbatim."""
    out = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        m = _DIST_RE.match(raw.strip())
        if not m:
            out.append(ov)
            continue
        kind, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
        if kind == "uniform":
            lo, hi = float(args[0]), float(args[1])
            val = float(rng.uniform(lo, hi))
        elif kind == "loguniform":
            lo, hi = math.log(float(args[0])), math.log(float(args[1]))
            val = float(math.exp(rng.uniform(lo, hi)))
        elif kind == "int":
            lo, hi = int(args[0]), int(args[1])
            val = int(rng.integers(lo, hi + 1))
        else:  # choice
            val = args[int(rng.integers(0, len(args)))]
        out.append(f"{key}={val}")
    return out


def _run_trials(train_fn, load_cfg, trials, sweep_dir, metric):
    os.makedirs(sweep_dir, exist_ok=True)
    summary_path = os.path.join(sweep_dir, "sweep.jsonl")
    out = []
    best = None
    with open(summary_path, "a") as summary:
        for idx, trial in enumerate(trials):
            workdir = os.path.join(sweep_dir, f"trial_{idx}")
            cfg = load_cfg(trial + [f"workdir={workdir}"])
            rec: Dict = {"trial": idx, "overrides": trial}
            try:
                results = train_fn(cfg)
                rec["results"] = results
                if metric and metric in results:
                    rec["metric"] = results[metric]
                    if best is None or results[metric] < best[1]:
                        best = (trial, results[metric])
            except Exception as e:  # keep the sweep alive
                rec["error"] = f"{type(e).__name__}: {e}"
                rec["traceback"] = traceback.format_exc(limit=5)
                results = {}
            summary.write(json.dumps(rec) + "\n")
            summary.flush()
            out.append((trial, results))
        if best is not None:
            summary.write(json.dumps(
                {"best_overrides": best[0], "best_metric": best[1],
                 "metric_name": metric}) + "\n")
    return out


def run_random_search(train_fn: Callable[[Dict], Dict],
                      load_cfg: Callable, overrides: List[str],
                      n_trials: int, seed: int = 0,
                      sweep_dir: str = "runs/sweep",
                      metric: Optional[str] = None):
    """Random search over distribution expressions in ``overrides``
    (minimizing ``metric``); the best trial is appended to sweep.jsonl.
    """
    rng = np.random.default_rng(seed)
    trials = [sample_overrides(overrides, rng) for _ in range(n_trials)]
    return _run_trials(train_fn, load_cfg, trials, sweep_dir, metric)


def run_sweep(train_fn: Callable[[Dict], Dict], load_cfg: Callable,
              overrides: List[str], sweep_dir: str = "runs/sweep",
              metric: Optional[str] = None) -> List[Tuple[List[str], Dict]]:
    """Run the cartesian grid; returns [(trial_overrides, results)].

    ``train_fn(cfg) -> results dict``; ``load_cfg(extra_overrides)``
    builds a config from base + trial overrides.
    """
    return _run_trials(train_fn, load_cfg, expand_grid(overrides),
                       sweep_dir, metric)
