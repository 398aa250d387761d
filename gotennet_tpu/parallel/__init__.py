"""Scale-out over TPU device meshes.

The reference delegates everything to Lightning DDP/NCCL
(/root/reference/gotennet/configs/trainer/default.yaml:7); here
parallelism is first-class JAX:

  * **Data parallel** — per-device graph batches, gradients pmean'd
    over the ``data`` mesh axis inside one ``shard_map``-wrapped jitted
    train step.
  * **Edge parallel** (the graph analog of sequence/context
    parallelism; no reference counterpart) — the destination-sorted
    edge list is sharded along the ``edge`` axis with node features
    replicated; every segment reduction finishes with one
    psum/pmax collective over ICI (graph/segment.py ``psum_axis``).
    This is how molecules larger than one chip's edge budget (MD22,
    Molecule3D) scale.

Both compose in a single 2-D mesh ``('data', 'edge')``.
"""

from gotennet_tpu.parallel.mesh import make_mesh
from gotennet_tpu.parallel.data_parallel import (
    batch_pspec,
    make_global_batch,
    make_parallel_train_step,
    shard_graph_batch,
    stack_batches,
)
from gotennet_tpu.parallel.distributed import (
    global_mesh,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "stack_batches",
    "shard_graph_batch",
    "batch_pspec",
    "make_global_batch",
    "make_parallel_train_step",
    "initialize_distributed",
    "global_mesh",
]
