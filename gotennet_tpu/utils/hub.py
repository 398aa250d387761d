"""Pretrained-checkpoint resolution: alias / URL / local path + cache.

Capability equivalent of the reference's download_checkpoint
(/root/reference/gotennet/utils/file.py:147-367): the three-part alias
scheme ``{task}_{size}_{label}`` is validated against the task registry
(QM9 sizes small/base/large; rMD17 base only), resolved to a hub URL,
downloaded into ``~/.gotennet_tpu/checkpoints`` (override with
``$CHECKPOINT_PATH``) with size verification and partial-file cleanup.
This container has no network egress, so downloads fail with a clear
message while cache hits and local paths work.
"""

from __future__ import annotations

import os

__all__ = ["resolve_checkpoint", "download_file", "ALIAS_SIZES"]

HUB_URL = ("https://huggingface.co/sarpaykent/GotenNet/resolve/main/"
           "pretrained/{task}/{size}/gotennet_{label}.ckpt")

ALIAS_SIZES = {"QM9": ["small", "base", "large"], "rMD17": ["base"]}
_QM9_LABELS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
               "U0", "U", "H", "G", "Cv"]


def _cache_dir() -> str:
    root = os.environ.get(
        "CHECKPOINT_PATH",
        os.path.join(os.path.expanduser("~"), ".gotennet_tpu", "checkpoints"))
    os.makedirs(root, exist_ok=True)
    return root


def download_file(url: str, dest: str, timeout: int = 60) -> str:
    """Stream a file to ``dest`` with Content-Length verification and
    partial-file cleanup (reference download_file, file.py:27-144)."""
    import requests

    tmp = dest + ".partial"
    try:
        with requests.get(url, stream=True, timeout=timeout) as r:
            r.raise_for_status()
            expected = int(r.headers.get("Content-Length", 0))
            with open(tmp, "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
        if expected and os.path.getsize(tmp) != expected:
            raise IOError(
                f"size mismatch: got {os.path.getsize(tmp)}, "
                f"expected {expected}")
        os.replace(tmp, dest)
        return dest
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def resolve_checkpoint(name_or_path: str) -> str:
    """Resolve an alias / URL / path to a local checkpoint location.

    Aliases look like ``QM9_small_homo``.  Local paths and cached
    downloads resolve immediately; fresh downloads require network.
    """
    if os.path.exists(name_or_path):
        return name_or_path

    if name_or_path.startswith(("http://", "https://")):
        url = name_or_path
        fname = url.rsplit("/", 1)[-1]
    else:
        parts = name_or_path.split("_")
        if len(parts) != 3:
            raise ValueError(
                f"{name_or_path!r} is neither a path, URL, nor a "
                "'{task}_{size}_{label}' alias")
        task, size, label = parts
        if task not in ALIAS_SIZES:
            raise ValueError(f"unknown task {task!r}; known: "
                             f"{sorted(ALIAS_SIZES)}")
        if size not in ALIAS_SIZES[task]:
            raise ValueError(
                f"task {task} has sizes {ALIAS_SIZES[task]}, not {size!r}")
        if task == "QM9" and label not in _QM9_LABELS:
            raise ValueError(f"unknown QM9 label {label!r}")
        url = HUB_URL.format(task=task, size=size, label=label)
        fname = f"{task}_{size}_{label}.ckpt"

    dest = os.path.join(_cache_dir(), fname)
    if os.path.exists(dest):
        return dest
    return download_file(url, dest)
