"""Profiling: trace capture + device-time breakdown.

The reference ships no active profiling (a commented-out
PyTorchProfiler hook, training_pipeline.py:101); here tracing is a
first-class utility: capture an ``jax.profiler`` trace around any
callable and summarize device time by HLO category and by op — the
workflow used to find and kill the scatter/relayout bottlenecks in
this repo (see PERF.md).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, Optional

__all__ = ["capture_trace", "summarize_trace", "profile_fn"]


def capture_trace(fn: Callable[[], None],
                  trace_dir: Optional[str] = None) -> str:
    """Run ``fn`` under the JAX profiler; returns the trace directory.

    ``fn`` must block on its final result (e.g. ``float(out)``) so the
    device work lands inside the trace window.
    """
    import jax
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="gotennet_trace_")
    with jax.profiler.trace(trace_dir):
        fn()
    return trace_dir


def summarize_trace(trace_dir: str, top_k: int = 15) -> Dict:
    """Parse the captured trace into per-category and per-op device
    totals (microseconds)."""
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*",
                     "*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace files under {trace_dir}")
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_bytes: Dict[str, int] = {}
    op_info: Dict[str, str] = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        by_cat[cat] += e["dur"]
        by_op[e["name"]] += e["dur"]
        if "bytes_accessed" in args:
            op_bytes[e["name"]] = int(args["bytes_accessed"])
        if "long_name" in args:
            op_info[e["name"]] = args["long_name"][:160]
    return {
        "total_us": sum(by_cat.values()),
        "by_category_us": dict(by_cat.most_common()),
        "top_ops": [
            {"name": n, "us": us, "bytes": op_bytes.get(n),
             "hlo": op_info.get(n)}
            for n, us in by_op.most_common(top_k)
        ],
    }


def profile_fn(fn: Callable[[], None], top_k: int = 15,
               print_summary: bool = True) -> Dict:
    """Capture + summarize in one call; optionally pretty-print."""
    d = capture_trace(fn)
    s = summarize_trace(d, top_k)
    if print_summary:
        print(f"device total: {s['total_us'] / 1e3:.2f} ms")
        for cat, us in s["by_category_us"].items():
            print(f"  {us / 1e3:9.2f} ms  {cat}")
    return s
