"""GotenNet-TPU: a TPU-native equivariant message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
GotenNet reference (E(3)-equivariant graph attention for molecular
property prediction, ICLR 2025) built for TPU hardware:

- static-shape padded graph batches (XLA-friendly),
- masked segment ops / fused Pallas kernels for the edge-wise hot loops,
- ``pjit``/``shard_map`` data- and edge-parallel scaling over device meshes,
- forces via ``jax.grad`` through atomic positions.

Public API mirrors the reference's capability surface
(/root/reference/gotennet/__init__.py:5-10): ``GotenNet``, ``GATA``,
``EQFF`` plus the graph substrate that replaces PyG.
"""

__version__ = "0.1.0"

from gotennet_tpu.graph.batch import GraphBatch  # noqa: F401

__all__ = ["GraphBatch", "GotenNet", "GATA", "EQFF", "__version__"]


def __getattr__(name):
    # Lazy model imports keep `import gotennet_tpu` cheap for data-only use.
    if name in ("GotenNet", "GATA", "EQFF"):
        from gotennet_tpu.models import gotennet as _g
        return getattr(_g, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
