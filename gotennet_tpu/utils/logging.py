"""Logging helpers.

Equivalent of the reference's rank-zero-aware ``get_logger``
(/root/reference/gotennet/utils/__init__.py:42-68): in a multi-process
``jax.distributed`` run only process 0 emits info-level logs so output
is not duplicated per host.
"""

from __future__ import annotations

import logging
import sys

__all__ = ["get_logger", "is_main_process"]

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def is_main_process() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "gotennet_tpu") -> logging.Logger:
    """Process-0-aware logger (other processes log warnings and up)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO if is_main_process()
                        else logging.WARNING)
        logger.propagate = False
    return logger
