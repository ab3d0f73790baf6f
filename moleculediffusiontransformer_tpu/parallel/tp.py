"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

The model family tops out at 91M params, so pure data parallelism is the
production configuration (SURVEY §2.10) — but the framework supports a
'model' mesh axis for scaling the architecture up: large kernels are
sharded on their output (column-parallel) or input (row-parallel) feature
dimension and GSPMD propagates activation shardings and inserts the
collectives (all-gather / reduce-scatter over ICI).

Usage:
    mesh = make_mesh_2d(data=4, model=2)
    specs = tensor_parallel_specs(params, mesh)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(data: int, model: int, *,
                 backend: Optional[str] = None) -> Mesh:
    devices = jax.devices(backend) if backend else jax.devices()
    assert len(devices) >= data * model, (
        f"need {data * model} devices, have {len(devices)}")
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def tensor_parallel_specs(params: Any, mesh: Mesh,
                          axis: str = "model",
                          min_elements: int = 4096) -> Any:
    """PartitionSpec pytree: column-parallel for large matmul kernels,
    replicated for everything small (biases, norms, scalars).

    Heuristic per leaf (our param layouts — see nn/primitives.py):
      * rank-2 (in, out) dense kernels and rank-3 (k, in, out) conv kernels
        shard 'out' when divisible, else 'in', else replicate;
      * rank-2 embedding tables shard the feature dim;
      * rank-1 (biases, norm scales) replicate — GSPMD reconciles them
        against sharded matmul outputs.
    """
    n_model = mesh.shape[axis]

    def spec(x) -> P:
        shape = tuple(x.shape)
        if len(shape) < 2 or int(np.prod(shape)) < min_elements:
            return P()
        if len(shape) == 2:
            if shape[1] % n_model == 0:
                return P(None, axis)
            if shape[0] % n_model == 0:
                return P(axis, None)
            return P()
        if len(shape) == 3:                       # conv (k, in, out)
            if shape[2] % n_model == 0:
                return P(None, None, axis)
            if shape[1] % n_model == 0:
                return P(None, axis, None)
            return P()
        return P()

    return jax.tree_util.tree_map(spec, params)


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place a param pytree with tensor-parallel shardings on the mesh."""
    specs = tensor_parallel_specs(params, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
