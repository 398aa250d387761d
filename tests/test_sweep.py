"""Sweep grid expansion + sweep execution with a failing trial."""

import json
import os

from gotennet_tpu.utils.sweep import expand_grid, run_sweep


def test_expand_grid():
    trials = expand_grid(["a=1,2", "b=x", "c=0.1,0.2"])
    assert len(trials) == 4
    assert ["a=1", "b=x", "c=0.1"] in trials
    assert ["a=2", "b=x", "c=0.2"] in trials
    assert expand_grid(["k=v"]) == [["k=v"]]


def test_run_sweep_survives_failures(tmp_path):
    def load_cfg(overrides):
        cfg = {}
        for ov in overrides:
            k, _, v = ov.partition("=")
            cfg[k] = v
        return cfg

    def train_fn(cfg):
        if cfg["x"] == "bad":
            raise ValueError("boom")
        return {"MeanAbsoluteError": float(cfg["x"])}

    out = run_sweep(train_fn, load_cfg, ["x=1,bad,3"],
                    sweep_dir=str(tmp_path), metric="MeanAbsoluteError")
    assert len(out) == 3
    assert out[0][1]["MeanAbsoluteError"] == 1.0
    assert out[1][1] == {}  # failed trial recorded, sweep continued
    assert out[2][1]["MeanAbsoluteError"] == 3.0
    lines = open(os.path.join(str(tmp_path), "sweep.jsonl")).read().strip()
    recs = [json.loads(x) for x in lines.split("\n")]
    assert any("error" in r for r in recs)
