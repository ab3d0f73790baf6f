"""Multi-host (DCN) data parallelism.

The reference has zero distributed machinery (SURVEY §2.10) — this is the
framework's scale-out path beyond one TPU pod slice.  Topology-aware design:
the mesh's outer axis spans hosts (traffic rides DCN), the inner axis spans
each host's local chips (traffic rides ICI).  For pure data parallelism the
only cross-host collective is the gradient all-reduce, which GSPMD emits as
a two-stage (ICI reduce-scatter / DCN all-reduce / ICI all-gather) pattern —
the scaling-book recipe for DP over hybrid networks.

Each process feeds only its local shard of the global batch;
:func:`shard_batch_global` assembles the global array view with
``jax.make_array_from_process_local_data`` so the train step is byte-for-byte
the same jit as single-host.

Single-process (tests, one host) everything degrades to the local mesh.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     **extra: Any) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, autodetects from the environment (TPU pod metadata
    or ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
    Call ONCE per process, before any other jax API touches the backend.
    """
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized (must not probe backends here —
            #         jax.process_count() would itself initialize XLA)
    except (ImportError, AttributeError):
        # private-API probe only; if jax moves it, fall through and let
        # jax.distributed.initialize raise its own 'already initialized'
        # RuntimeError, which we treat as the idempotent no-op.
        pass
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    kwargs.update(extra)
    if kwargs or coordinator_address is None:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:  # pragma: no cover - depends on jax ver.
            if "already" not in str(e).lower():
                raise


def make_global_mesh(axis_name: str = "data",
                     backend: Optional[str] = None) -> Mesh:
    """1-D data mesh over ALL devices of ALL processes, ordered host-major
    so that each host's devices are contiguous: batch shards stay on their
    producing host, and the gradient all-reduce decomposes into ICI-local +
    DCN stages.

    Single-process this is exactly ``make_mesh()``.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (axis_name,))


def mesh_process_count(mesh: Mesh) -> int:
    """Number of processes participating in ``mesh`` (derived from the mesh
    devices, NOT ``jax.process_count()`` — the latter consults the default
    backend, which may be a different platform than the mesh's)."""
    return len({d.process_index for d in mesh.devices.flat})


def process_local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """The slice of the global batch this process must produce."""
    n = mesh_process_count(mesh)
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def shard_batch_global(mesh: Mesh, batch: Any,
                       axis_name: str = "data") -> Any:
    """Assemble a GLOBAL batch-sharded array from each process's LOCAL
    numpy shard (leading axis = the local slice of the global batch).

    Uses ``jax.make_array_from_single_device_arrays`` explicitly rather
    than ``make_array_from_process_local_data`` because the latter consults
    the DEFAULT backend's process count — wrong when the data mesh lives on
    a non-default backend (e.g. the multi-process CPU mesh in tests while a
    TPU plugin is the default).  Works single-process too (== shard_batch).
    """
    n_proc = mesh_process_count(mesh)
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x) -> jax.Array:
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        idx_map = sharding.addressable_devices_indices_map(global_shape)
        starts = [idx[0].indices(global_shape[0])[0]
                  for idx in idx_map.values()]
        offset = min(starts)  # this process's slice of the global batch
        arrays = [
            jax.device_put(
                x[idx[0].indices(global_shape[0])[0] - offset:
                  idx[0].indices(global_shape[0])[1] - offset], d)
            for d, idx in idx_map.items()]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays)

    return jax.tree_util.tree_map(put, batch)


def place_global(mesh: Mesh, tree: Any, specs: Any) -> Any:
    """Place host-replicated values onto a (possibly multi-process) mesh
    with arbitrary per-leaf ``PartitionSpec``s.

    Every process must hold the SAME full host value for each leaf (the
    same-seed-init convention used throughout the multihost path); each
    process contributes only its addressable devices' slices, assembled
    with ``jax.make_array_from_single_device_arrays``.  This is the
    multi-process generalization of ``shard_state_fsdp``'s ``device_put``
    placement: it lets FSDP/TP/pp layouts (``fsdp_specs``,
    ``pp.stack_layer_params`` + ``P('stage')``) span the DCN boundary.

    ``specs`` is a pytree of ``PartitionSpec`` matching ``tree``'s leaves
    (the form ``fsdp_specs`` returns), or a single spec applied to all.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if isinstance(specs, P):
        spec_leaves = [specs] * len(leaves)
    else:
        spec_leaves = treedef.flatten_up_to(specs)

    def put(x, spec) -> jax.Array:
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        idx_map = sharding.addressable_devices_indices_map(x.shape)
        arrays = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
        return jax.make_array_from_single_device_arrays(
            x.shape, sharding, arrays)

    return treedef.unflatten([put(x, s)
                              for x, s in zip(leaves, spec_leaves)])


def replicate_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host pytree (params, PRNG keys) across a global mesh.
    Every process holds the same host values (e.g. same-seed init); each
    contributes its addressable replicas."""
    sharding = NamedSharding(mesh, P())

    def put(x) -> jax.Array:
        x = np.asarray(x)
        arrays = [jax.device_put(x, d) for d in sharding.addressable_devices]
        return jax.make_array_from_single_device_arrays(
            x.shape, sharding, arrays)

    return jax.tree_util.tree_map(put, tree)
