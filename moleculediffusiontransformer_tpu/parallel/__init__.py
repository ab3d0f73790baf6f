"""Device mesh + sharding (data parallelism over ICI; SURVEY §2.10)."""
from .mesh import (batch_sharding, make_mesh, pad_to_multiple, replicate,
                   replicated, shard_batch)
