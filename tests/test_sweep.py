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


def test_sample_overrides_distributions():
    import numpy as np
    from gotennet_tpu.utils.sweep import sample_overrides
    rng = np.random.default_rng(0)
    ovs = ["model.lr=loguniform(1e-5,1e-3)",
           "model.weight_decay=uniform(0,0.1)",
           "model.representation.lmax=int(1,3)",
           "model.representation.aggr=choice(add,mean,max)",
           "label=homo"]
    for _ in range(20):
        t = sample_overrides(ovs, rng)
        kv = dict(o.split("=", 1) for o in t)
        assert 1e-5 <= float(kv["model.lr"]) <= 1e-3
        assert 0.0 <= float(kv["model.weight_decay"]) <= 0.1
        assert int(kv["model.representation.lmax"]) in (1, 2, 3)
        assert kv["model.representation.aggr"] in ("add", "mean", "max")
        assert kv["label"] == "homo"


def test_run_random_search_records_best(tmp_path):
    import json
    from gotennet_tpu.utils.sweep import run_random_search

    def fake_train(cfg):
        lr = cfg["lr"]
        return {"MeanAbsoluteError": (lr - 0.3) ** 2}

    def load(extra):
        cfg = {"lr": 0.0}
        for ov in extra:
            k, _, v = ov.partition("=")
            if k == "lr":
                cfg["lr"] = float(v)
        return cfg

    out = run_random_search(fake_train, load, ["lr=uniform(0,1)"],
                            n_trials=6, seed=1,
                            sweep_dir=str(tmp_path),
                            metric="MeanAbsoluteError")
    assert len(out) == 6
    lines = [json.loads(l) for l in
             open(tmp_path / "sweep.jsonl")]
    best = [l for l in lines if "best_overrides" in l]
    assert len(best) == 1
    vals = [l["metric"] for l in lines if "metric" in l]
    assert best[0]["best_metric"] == min(vals)


def test_run_adaptive_search_concentrates(tmp_path):
    """TPE-style adaptive search: after the random warmup, trials
    concentrate near the optimum and the best metric beats the warmup
    phase's (≙ reference Optuna sweeper)."""
    import numpy as np

    from gotennet_tpu.utils.sweep import run_adaptive_search

    def fake_train(cfg):
        return {"MeanAbsoluteError": abs(cfg["lr"] - 0.3)
                + 0.5 * abs(cfg["k"] - 2)}

    def load(extra):
        cfg = {"lr": 0.0, "k": 1}
        for ov in extra:
            key, _, v = ov.partition("=")
            if key == "lr":
                cfg["lr"] = float(v)
            elif key == "k":
                cfg["k"] = int(v)
        return cfg

    out = run_adaptive_search(
        fake_train, load, ["lr=uniform(0,1)", "k=int(1,4)"],
        n_trials=24, seed=0, n_startup=6,
        sweep_dir=str(tmp_path), metric="MeanAbsoluteError")
    assert len(out) == 24
    metrics = [r["MeanAbsoluteError"] for _, r in out]
    # adaptive phase finds something at least as good as the warmup
    assert min(metrics[6:]) <= min(metrics[:6])
    assert min(metrics) < 0.08
    # the exploitation phase concentrates: its mean beats the warmup's
    assert np.mean(metrics[12:]) < np.mean(metrics[:6])
