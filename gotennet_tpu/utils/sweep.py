"""Grid sweeps over config overrides.

Capability equivalent of the reference's Hydra multirun + grid sampler
(configs/hydra/default.yaml:7-8; e.g. ``train.py -m
label=mu,alpha,homo``): comma-separated values in overrides expand to
a cartesian grid, each trial runs in its own run dir, and a summary
table (JSONL) collects the optimized metric per trial.  Failed trials
are recorded and skipped, like the reference's ``task_wrapper``
keeping multiruns alive (utils/utils.py:90-118).
"""

from __future__ import annotations

import itertools
import json
import os
import traceback
from typing import Callable, Dict, List, Optional, Tuple

__all__ = ["expand_grid", "run_sweep"]


def expand_grid(overrides: List[str]) -> List[List[str]]:
    """['a=1,2', 'b=x'] -> [['a=1','b=x'], ['a=2','b=x']]."""
    axes: List[List[str]] = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        values = raw.split(",") if "," in raw else [raw]
        axes.append([f"{key}={v}" for v in values])
    return [list(combo) for combo in itertools.product(*axes)]


def run_sweep(train_fn: Callable[[Dict], Dict], load_cfg: Callable,
              overrides: List[str], sweep_dir: str = "runs/sweep",
              metric: Optional[str] = None) -> List[Tuple[List[str], Dict]]:
    """Run the cartesian grid; returns [(trial_overrides, results)].

    ``train_fn(cfg) -> results dict``; ``load_cfg(extra_overrides)``
    builds a config from base + trial overrides.
    """
    os.makedirs(sweep_dir, exist_ok=True)
    summary_path = os.path.join(sweep_dir, "sweep.jsonl")
    out = []
    with open(summary_path, "a") as summary:
        for idx, trial in enumerate(expand_grid(overrides)):
            workdir = os.path.join(sweep_dir, f"trial_{idx}")
            cfg = load_cfg(trial + [f"workdir={workdir}"])
            rec: Dict = {"trial": idx, "overrides": trial}
            try:
                results = train_fn(cfg)
                rec["results"] = results
                if metric and metric in results:
                    rec["metric"] = results[metric]
            except Exception as e:  # keep the sweep alive
                rec["error"] = f"{type(e).__name__}: {e}"
                rec["traceback"] = traceback.format_exc(limit=5)
                results = {}
            summary.write(json.dumps(rec) + "\n")
            summary.flush()
            out.append((trial, results))
    return out
