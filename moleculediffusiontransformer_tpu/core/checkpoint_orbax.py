"""Orbax-backed checkpointing: async save, mesh-aware sharded restore.

The msgpack path (`core/checkpoint.py`) is the exact-resume baseline the
reference lacks (it saves bare ``state_dict`` and drops optimizer state,
`generative.py:582-584,1168-1172`).  This module is the PRODUCTION tier on
top of it, built on `orbax.checkpoint` (the standard JAX/TPU checkpoint
stack):

  * **async save** — serialization and filesystem writes ride a background
    thread, so the train loop resumes dispatching the next step while the
    previous state is still flushing (a synchronous 91M-state save blocks
    the step stream for device_get + disk time);
  * **sharded restore** — each leaf is restored DIRECTLY into its target
    ``NamedSharding``: on a mesh, every host/device materializes only its
    own shards (no full-tree host copy then re-shard), which is the only
    restore that scales to multi-host DCN (`parallel/multihost.py`);
  * retention + atomicity (tmp-dir commit) come from ``CheckpointManager``.

API mirrors `core/checkpoint.py` so trainers can swap tiers via config.
"""
from __future__ import annotations

from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class OrbaxCheckpointer:
    """``CheckpointManager`` wrapper: ``save(step, state)`` is async by
    default; ``restore(target=...)`` is sharding-aware.

    ``target`` drives the restore: leaves that are ``jax.Array`` with a
    ``NamedSharding`` are restored into exactly that sharding; a host
    (numpy) target restores to host arrays.
    """

    def __init__(self, directory: str, *, keep: int = 3,
                 async_save: bool = True,
                 save_interval_steps: int = 1):
        import os
        ocp = _ocp()
        self._ocp = ocp
        # tensorstore requires absolute paths; the msgpack tier accepts
        # relative ones — keep the tiers swap-compatible
        directory = os.path.abspath(directory)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(directory, options=opts)

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        """Enqueue an (async) save of ``state`` at ``step``.  Returns
        whether a save was actually started (the manager skips steps
        below ``save_interval_steps`` unless ``force``)."""
        return self._mgr.save(
            step, args=self._ocp.args.StandardSave(state), force=force)

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``target`` (defaults to
        the latest step)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint in {self._mgr.directory}")
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait_until_finished(self) -> None:
        """Block until every enqueued async save has committed — call
        before reading the directory or exiting the process."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "OrbaxCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def shard_restore_target(abstract_or_state: Any, mesh,
                         param_spec=None) -> Any:
    """Build a restore target whose leaves carry the mesh shardings.

    ``abstract_or_state`` can be a concrete state or a
    ``jax.eval_shape`` result; every leaf becomes a ``ShapeDtypeStruct``
    with a ``NamedSharding`` — replicated by default, or per-leaf specs
    from ``param_spec`` (a matching pytree of ``PartitionSpec``, e.g.
    ``parallel.tp.tensor_parallel_specs``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(leaf, spec):
        s = NamedSharding(mesh, spec if spec is not None else P())
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=s)

    if param_spec is None:
        return jax.tree_util.tree_map(lambda l: one(l, None),
                                      abstract_or_state)
    return jax.tree_util.tree_map(one, abstract_or_state, param_spec)
