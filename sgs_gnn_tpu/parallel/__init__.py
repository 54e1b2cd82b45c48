from .mesh import make_mesh, device_count
from .partitioned import (stack_batches, make_parallel_train_step,
                          make_parallel_eval_step)

__all__ = ["make_mesh", "device_count", "stack_batches",
           "make_parallel_train_step", "make_parallel_eval_step"]
