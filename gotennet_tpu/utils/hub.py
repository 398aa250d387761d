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

__all__ = ["resolve_checkpoint", "download_file",
           "download_with_fallback", "ALIAS_SIZES"]

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
    return download_with_fallback([url] + _mirror_urls(url), dest)


def _mirror_urls(primary: str) -> list:
    """Additional URL candidates from ``$GOTENNET_TPU_CHECKPOINT_MIRRORS``
    (comma-separated base URLs; the primary's path after the host is
    appended).  Mirrors the reference's urls_to_try list
    (file.py:165-241, HF primary + any extras)."""
    bases = os.environ.get("GOTENNET_TPU_CHECKPOINT_MIRRORS", "")
    if not bases:
        return []
    from urllib.parse import urlparse
    path = urlparse(primary).path.lstrip("/")
    return [b.rstrip("/") + "/" + path for b in bases.split(",") if b]


def download_with_fallback(urls: list, dest: str) -> str:
    """Try each URL in order — HEAD accessibility check, download,
    non-empty verification, cleanup of empty/partial files — and fall
    through to the next on any failure, raising only after every source
    fails (reference download_checkpoint's retry-over-URL loop,
    file.py:277-367)."""
    import requests

    from gotennet_tpu.utils.logging import get_logger
    log = get_logger()

    last_error = None
    for i, url in enumerate(urls):
        log.info("download attempt %d/%d: %s", i + 1, len(urls), url)
        try:
            head = requests.head(url, allow_redirects=True, timeout=10)
            head.raise_for_status()
            download_file(url, dest)
            if not os.path.exists(dest):
                raise FileNotFoundError("file missing after download")
            if os.path.getsize(dest) == 0:
                os.remove(dest)
                raise FileNotFoundError("downloaded file is empty")
            return dest
        except Exception as e:  # noqa: BLE001 — every failure falls through
            last_error = e
            log.warning("download from %s failed: %s", url, e)
            if os.path.exists(dest) and os.path.getsize(dest) == 0:
                try:
                    os.remove(dest)
                except OSError:
                    pass
    msg = (f"failed to download {os.path.basename(dest)} from all "
           f"{len(urls)} source(s): {', '.join(urls)}")
    raise FileNotFoundError(msg) from last_error
