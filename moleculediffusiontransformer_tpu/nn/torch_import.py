"""Import PyTorch reference checkpoints into our parameter pytrees.

The reference publishes ``state_dict`` checkpoints (README.md:44-50) and our
golden parity tests (SURVEY §7.4.1) need bit-identical weights on both sides.
Our module tree mirrors the reference's attribute names with torch Sequential
indices merged as ``name_i`` (e.g. torch ``to_in.0.weight`` lives at flax path
``('to_in_0', 'scale')``), so the mapping is mechanical:

  torch key segments  -> flax path: numeric segments merge into the previous
                         segment with '_'
  leaf conversion     -> decided by the *target* leaf name in our pytree:
      kernel   (rank 3)  conv   W (out, in, k) -> (k, in, out)
      kernel   (rank 2)  linear W (out, in)    -> (in, out)
      tkernel            convT  W (in, out, k) -> (k, in, out)
      scale              norm weight, as-is
      embedding          embedding weight, as-is
      weights / bias     as-is

No torch import at module load — only inside the conversion functions.
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np


def torch_key_to_path(key: str) -> Tuple[str, ...]:
    """'downsamples.0.blocks.1.block1.project.weight' ->
    ('downsamples_0', 'blocks_1', 'block1', 'project', 'weight')."""
    parts: List[str] = []
    for seg in key.split("."):
        if seg.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{seg}"
        else:
            parts.append(seg)
    return tuple(parts)


_LEAF_NAMES = ("kernel", "tkernel", "scale", "bias", "embedding", "weights")


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out: Dict[Tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (str(k),)))
        else:
            out[prefix + (str(k),)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = v
    return tree


def _convert_leaf(target_name: str, value: np.ndarray) -> np.ndarray:
    if target_name == "kernel":
        if value.ndim == 3:                     # conv (out, in, k) -> (k, in, out)
            return np.transpose(value, (2, 1, 0))
        return np.transpose(value, (1, 0))      # linear (out, in) -> (in, out)
    if target_name == "tkernel":                # convT (in, out, k) -> (k, in, out)
        return np.transpose(value, (2, 0, 1))
    if target_name == "in_proj_weight":         # torch MHA (3d, d) -> (d, 3d)
        return np.transpose(value, (1, 0))
    return value                                # scale/bias/embedding/etc.


def state_dict_to_params(state_dict: Mapping[str, Any], params: Dict,
                         strict: bool = True) -> Dict:
    """Map a torch ``state_dict`` onto a flax params pytree with our naming
    convention.  ``params`` provides the target structure (from
    ``module.init``); returns a new pytree with imported values.

    Matching: for each torch key, compute the path prefix; the target leaf
    under that prefix whose name is compatible with the torch leaf name
    ('weight' -> kernel/tkernel/scale/embedding, 'bias' -> bias,
    'weights' -> weights) receives the converted tensor.
    """
    flat_target = _flatten(params)
    by_prefix: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for path in flat_target:
        by_prefix.setdefault(path[:-1], {})[path[-1]] = path

    compat = {
        "weight": ("kernel", "tkernel", "scale", "embedding"),
        "bias": ("bias",),
        "weights": ("weights",),
    }
    # params copied verbatim under their own torch name (null_kv, gamma,
    # start_token, pos_bias, in_proj_weight/bias, ...): any exact-name match
    _BUFFER_NAMES = ("inv_freq", "beta", "window", "pos_indices")

    # the reference registers the UNet twice (self.unet AND
    # XDiffusion(net=...), itself nesting an inner Diffusion), so
    # state_dicts carry duplicate 'diffusion.net.*' /
    # 'diffusion.diffusion.net.*' aliases of 'unet.*' (model.py:30-32,
    # generative.py:779) — drop the aliases
    import re
    keys = set(state_dict.keys())
    alias = re.compile(r"^(?:diffusion\.)+net\.")
    state_dict = {k: v for k, v in state_dict.items()
                  if not (alias.match(k)
                          and ("unet." + alias.sub("", k)) in keys)}

    out = dict(flat_target)
    used = set()
    missing = []
    for tkey, tval in state_dict.items():
        val = np.asarray(tval.detach().cpu().numpy()
                         if hasattr(tval, "detach") else tval)
        path = torch_key_to_path(tkey)
        prefix, leaf = path[:-1], path[-1]
        if leaf in _BUFFER_NAMES:       # torch buffers, never parameters
            continue
        candidates = by_prefix.get(prefix)
        if candidates is None:
            if strict:
                missing.append(tkey)
            continue
        names = compat.get(leaf, ()) + ((leaf,) if leaf not in compat else ())
        target_name = next((n for n in names if n in candidates), None)
        if target_name is None:
            if strict:
                missing.append(tkey)
            continue
        converted = _convert_leaf(target_name, val)
        tgt_path = candidates[target_name]
        expected = getattr(out[tgt_path], "shape", None)  # works for
        # ndarray / jax.Array / ShapeDtypeStruct targets (eval_shape trees)
        assert converted.shape == tuple(expected), (
            f"{tkey}: converted shape {converted.shape} != target "
            f"{tuple(expected)} at {'/'.join(tgt_path)}")
        out[tgt_path] = converted.astype(np.float32)
        used.add(tgt_path)

    if strict and missing:
        raise KeyError(f"torch keys with no flax target: {missing[:10]}"
                       f" (+{max(0, len(missing) - 10)} more)")
    return _unflatten(out)


def import_coverage(state_dict: Mapping[str, Any], params: Dict) -> Tuple[int, int]:
    """(number of flax leaves, number filled from the state_dict) — sanity
    metric for tests."""
    flat_target = _flatten(params)
    filled = 0
    prefixes = {p[:-1] for p in flat_target}
    for tkey in state_dict:
        if torch_key_to_path(tkey)[:-1] in prefixes:
            filled += 1
    return len(flat_target), filled
