from .mesh import make_mesh, device_count
from .partitioned import (stack_batches, make_parallel_train_step,
                          make_parallel_eval_step)
from .halo_train import (HaloBatch, build_halo_batch, shard_halo_batch,
                         make_halo_train_step, make_halo_eval_step)
from .distributed import (init_distributed, is_primary, make_global_mesh,
                          local_slot_indices, stack_local_to_global)
from .tensor_parallel import (make_dp_tp_mesh, shard_params_tp,
                              tp_param_spec)

__all__ = ["make_mesh", "device_count", "stack_batches",
           "make_parallel_train_step", "make_parallel_eval_step",
           "HaloBatch", "build_halo_batch", "shard_halo_batch",
           "make_halo_train_step", "make_halo_eval_step",
           "init_distributed", "is_primary", "make_global_mesh",
           "local_slot_indices", "stack_local_to_global",
           "make_dp_tp_mesh", "shard_params_tp", "tp_param_spec"]
