"""Multi-host bootstrap.

The reference leans on Lightning's DDP launcher; the JAX equivalent is
``jax.distributed.initialize`` + a global mesh.  This module wraps the
boilerplate: initialize from standard cluster env vars (or explicit
args), build the global ('data', 'edge') mesh over all processes'
devices, and report topology.  With the shard_map train steps in
``parallel.data_parallel`` this is all a multi-host run needs — XLA
routes the gradient psum over ICI within a slice and DCN across
slices.
"""

from __future__ import annotations

from typing import Optional, Tuple

from jax.sharding import Mesh

__all__ = ["initialize_distributed", "global_mesh"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op for single process).

    Explicit args win; otherwise the standard environment variables
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` are used (this is how the 2-process CPU test and
    non-TPU clusters bootstrap); on TPU pods with none of those set,
    jax auto-detects the cluster from pod metadata.  Returns a topology
    summary.  Called by ``cli.train`` when ``trainer.distributed`` is
    set.
    """
    import os

    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if (num_processes is not None and num_processes > 1) or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_mesh(edge_dim: int = 1,
                axis_names: Tuple[str, str] = ("data", "edge")) -> Mesh:
    """Mesh over all global devices: data = n_devices // edge_dim."""
    import jax

    from gotennet_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    if n % edge_dim:
        raise ValueError(f"{n} devices not divisible by edge_dim {edge_dim}")
    return make_mesh((n // edge_dim, edge_dim), axis_names)
