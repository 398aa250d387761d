"""Pallas TPU kernels (see PERF.md for environment status)."""

from gotennet_tpu.ops.pallas.fused_gata import fused_gata_message

__all__ = ["fused_gata_message"]
