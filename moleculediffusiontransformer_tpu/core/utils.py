"""Functional utilities.

TPU-native re-design of the reference utility layer
(`/root/reference/MoleculeDiffusion/utils.py:18-88`): Optional-handling
helpers, the prefix-routed kwargs system that the reference uses as its
de-facto config mechanism, and pytree parameter counting.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, TypeVar, Union

import jax

T = TypeVar("T")


def exists(val: Optional[T]) -> bool:
    return val is not None


def iff(condition: bool, value: T) -> Optional[T]:
    return value if condition else None


def is_sequence(obj: Any) -> bool:
    return isinstance(obj, (list, tuple))


def default(val: Optional[T], d: Union[Callable[[], T], T]) -> T:
    if exists(val):
        return val
    return d() if callable(d) else d


def to_list(val: Union[T, Sequence[T]]) -> List[T]:
    if isinstance(val, tuple):
        return list(val)
    if isinstance(val, list):
        return val
    return [val]


def prod(vals: Sequence[int]) -> int:
    out = 1
    for v in vals:
        out *= v
    return out


def closest_power_2(x: float) -> int:
    """Nearest power of two to ``x`` (reference `utils.py:58-62`)."""
    exponent = math.log2(x)
    candidates = (math.floor(exponent), math.ceil(exponent))
    exponent_closest = min(candidates, key=lambda z: abs(x - 2 ** z))
    return 2 ** int(exponent_closest)


def group_dict_by_prefix(prefix: str, d: Dict) -> Tuple[Dict, Dict]:
    with_prefix: Dict = {}
    without_prefix: Dict = {}
    for key, value in d.items():
        (with_prefix if key.startswith(prefix) else without_prefix)[key] = value
    return with_prefix, without_prefix


def groupby(prefix: str, d: Dict, keep_prefix: bool = False) -> Tuple[Dict, Dict]:
    """Split kwargs by prefix — the reference's config-routing mechanism
    (`utils.py:78-83`), e.g. ``groupby("attention_", kwargs)``."""
    kwargs_with_prefix, kwargs = group_dict_by_prefix(prefix, d)
    if keep_prefix:
        return kwargs_with_prefix, kwargs
    return {k[len(prefix):]: v for k, v in kwargs_with_prefix.items()}, kwargs


def prefix_dict(prefix: str, d: Dict) -> Dict:
    return {prefix + str(k): v for k, v in d.items()}


def count_parameters(params, verbose: bool = True) -> int:
    """Total number of scalars in a parameter pytree
    (analog of reference `utils.py:18-26`)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(x.size) for x in leaves)
    if verbose:
        print("-" * 100)
        print(f"Total parameters: {total} trainable parameters: {total}")
        print("-" * 100)
    return total
