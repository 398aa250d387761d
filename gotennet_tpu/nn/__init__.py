"""Flax building blocks: Dense/MLP with pluggable init, steerable norms."""

from gotennet_tpu.nn.dense import MLP, Dense, get_weight_init
from gotennet_tpu.nn.norms import TensorLayerNorm

__all__ = ["Dense", "MLP", "get_weight_init", "TensorLayerNorm"]
