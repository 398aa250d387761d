"""Task registry: maps dataset/task names to task handlers.

Extends the reference's registry (/root/reference/gotennet/models/
tasks/__init__.py:8-10, QM9-only) with first-class energy+force tasks
for rMD17/MD22 (the reference validates those aliases but ships no
handler, utils/file.py:193-196).
"""

from gotennet_tpu.tasks.base import Task
from gotennet_tpu.tasks.force_task import MD17Task, MD22Task
from gotennet_tpu.tasks.molecule3d import Molecule3DTask
from gotennet_tpu.tasks.qm9 import QM9Task

TASK_DICT = {
    "QM9": QM9Task,
    "rMD17": MD17Task,
    "MD17": MD17Task,
    "MD22": MD22Task,
    "Molecule3D": Molecule3DTask,
}

__all__ = ["Task", "QM9Task", "MD17Task", "MD22Task", "Molecule3DTask",
           "TASK_DICT"]
