"""Checkpoint / resume.

The reference saves bare ``model.state_dict()`` each eval interval and never
persists optimizer state (`generative.py:582-584,1168-1172`).  Here a
checkpoint is a single msgpack file holding the full train state pytree
(params + optimizer state + step), so resume is exact.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.serialization


def save_checkpoint(path: str, state: Any) -> str:
    """Serialize a pytree train-state to ``path`` (atomic rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Load a checkpoint into the structure of ``target``."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


_STEP_RE = re.compile(r"step_(\d+)\.msgpack$")


def save_step_checkpoint(directory: str, state: Any, step: int, keep: int = 3) -> str:
    """Save ``step_{N}.msgpack`` under ``directory`` and prune old ones."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}.msgpack")
    save_checkpoint(path, state)
    steps = sorted(all_checkpoint_steps(directory))
    for old in steps[:-keep]:
        os.remove(os.path.join(directory, f"step_{old}.msgpack"))
    return path


def all_checkpoint_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = _STEP_RE.search(name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_checkpoint(directory: str) -> Optional[str]:
    steps = all_checkpoint_steps(directory)
    if not steps:
        return None
    return os.path.join(directory, f"step_{max(steps)}.msgpack")
