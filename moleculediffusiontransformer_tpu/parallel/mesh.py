"""Device mesh + sharding helpers.

The reference has zero distributed machinery (SURVEY §2.10) — training is a
single-GPU loop.  Here data parallelism is first-class and TPU-native:

  * a 1-D ``('data',)`` mesh over all local devices (v5e-8: 8 chips on ICI);
  * batches sharded over 'data' with ``NamedSharding``; params replicated;
  * the train step is a plain ``jit`` — XLA inserts the gradient all-reduce
    (psum over ICI) automatically from the output sharding constraint, which
    is the idiomatic JAX formulation of DDP (scaling-book recipe);
  * multi-host: see ``parallel.multihost`` — distributed init, host-major
    global mesh, and per-process global-batch assembly (DCN+ICI).

Works degenerate (1 device) on CPU; tests exercise an 8-device virtual CPU
mesh via ``--xla_force_host_platform_device_count=8``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data",
              backend: Optional[str] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    ``backend`` selects the platform explicitly (e.g. 'cpu' for the
    8-device virtual mesh in tests — needed when a TPU plugin is the
    default backend)."""
    devices = jax.devices(backend) if backend else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put a host batch pytree with its leading axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading axis up to a multiple (for even device division)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = np.repeat(x[:1], rem, axis=0)
    return np.concatenate([x, pad], axis=0)
