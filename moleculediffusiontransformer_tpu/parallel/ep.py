"""Expert parallelism (ep): shard stacked MoE experts over the mesh.

Pairs with ``nn/moe.py`` (the TPU-native MoE extension — the reference
zoo is dense-only).  Expert parameters are STACKED ``(E, ...)`` arrays,
so expert parallelism is a one-line placement: ``P('expert')`` on the
leading axis.  Everything else (router, attention, embeddings) stays
replicated over 'expert' and data-parallel over 'data'.

This is pure GSPMD, same discipline as ``parallel/tp.py``: annotate the
PLACEMENT of params + batch, ``jit`` propagates.  With the dispatch
expressed as ``einsum('tec,td->ecd', ...)`` (see ``nn/moe.py``), XLA
shards the E dimension of the dispatched activations to follow the
expert weights and lowers the token shuffle to all-to-all / reduce-scatter
collectives over ICI — the GShard lowering — instead of host-side
scatter/gather.

Exactness: placement never changes the math; ``tests/test_ep.py`` pins
the expert-sharded loss AND grads against the single-device oracle.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_EXPERT_LEAVES = ("w_in", "w_out")


def make_mesh_ep(n_data: int, n_expert: int,
                 backend: Optional[str] = None) -> Mesh:
    """('data', 'expert') mesh; 'expert' innermost so expert all-to-alls
    ride adjacent ICI links."""
    devices = (jax.devices(backend) if backend else jax.devices())
    n = n_data * n_expert
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_expert),
                ("data", "expert"))


def expert_parallel_specs(params: Any, num_experts: int,
                          axis: str = "expert") -> Any:
    """PartitionSpec tree: stacked expert leaves (named w_in/w_out with a
    leading E axis) shard over `axis`; everything else replicates."""
    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (name in _EXPERT_LEAVES and leaf.ndim >= 2
                and leaf.shape[0] == num_experts):
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_ep(mesh: Mesh, params: Any, num_experts: int,
                    batch_axis: str = "data",
                    expert_axis: str = "expert") -> Tuple[Any, Any]:
    """Device-put params with experts sharded; returns (params, specs)."""
    specs = expert_parallel_specs(params, num_experts, expert_axis)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
    return placed, specs


def shard_batch_ep(mesh: Mesh, tree: Any, batch_axis: str = "data") -> Any:
    """Batch over 'data', replicated over 'expert' (the MoE dispatch
    reshuffles tokens across experts internally)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(batch_axis) if getattr(x, "ndim", 0)
                             else P())), tree)
