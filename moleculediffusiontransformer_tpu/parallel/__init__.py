"""Device mesh + sharding (data parallelism over ICI; SURVEY §2.10)."""
from .mesh import (batch_sharding, make_mesh, pad_to_multiple, replicate,
                   replicated, shard_batch)
from .multihost import (distributed_init, make_global_mesh, mesh_process_count,
                        place_global, process_local_batch_size,
                        replicate_global, shard_batch_global)
from .fsdp import fsdp_specs, shard_state_fsdp, state_sharding
from .sp import seq_sharding, shard_batch_sp, shard_seq
from .ep import (expert_parallel_specs, make_mesh_ep, shard_batch_ep,
                 shard_params_ep)
from .pp import (make_layer_apply, pipeline_forward, pipeline_layers,
                 shard_stacked, split_microbatches, stack_layer_params,
                 unstack_layer_params)
