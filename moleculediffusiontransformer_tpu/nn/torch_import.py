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

# torch buffers, never parameters (shared by import and export)
_BUFFER_NAMES = ("inv_freq", "beta", "window", "pos_indices")


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


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Inverse of :func:`torch_key_to_path`:
    ``('downsamples_0', 'blocks_1', 'block1', 'project', 'weight')`` ->
    ``'downsamples.0.blocks.1.block1.project.weight'``.

    Trailing pure-digit '_'-tokens of each segment are the torch
    Sequential/ModuleList indices the import merged; they split back into
    their own '.'-segments (``layers_0_2_1`` -> ``layers.0.2.1``).  Digits
    embedded in an attribute name without '_' (``block1``) stay put.
    """
    segs: List[str] = []
    for seg in path:
        tokens = seg.split("_")
        i = len(tokens)
        while i > 1 and tokens[i - 1].isdigit():
            i -= 1
        segs.append("_".join(tokens[:i]))
        segs.extend(tokens[i:])
    return ".".join(segs)


def _unconvert_leaf(target_name: str, value: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_convert_leaf` — flax layout back to torch layout."""
    if target_name == "kernel":
        if value.ndim == 3:                     # conv (k, in, out) -> (out, in, k)
            return np.transpose(value, (2, 1, 0))
        return np.transpose(value, (1, 0))      # linear (in, out) -> (out, in)
    if target_name == "tkernel":                # convT (k, in, out) -> (in, out, k)
        return np.transpose(value, (1, 2, 0))
    if target_name == "in_proj_weight":         # torch MHA (d, 3d) -> (3d, d)
        return np.transpose(value, (1, 0))
    return value


# flax leaf name -> the torch leaf name it was imported from
_EXPORT_LEAF_NAMES = {"kernel": "weight", "tkernel": "weight",
                      "scale": "weight", "embedding": "weight"}


def params_to_state_dict(params: Dict, like: Any = None,
                         strict: bool = True) -> Dict[str, np.ndarray]:
    """Export a flax params pytree back to a torch ``state_dict`` mapping —
    the exact inverse of :func:`state_dict_to_params`, so models fine-tuned
    in this framework can be loaded by the reference's torch tooling
    (reference checkpoints: /root/reference/README.md:44-60).

    Values are float32 numpy arrays in torch layouts; load them with::

        model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                              strict=False)   # buffers keep torch's own values

    ``like``: optional iterable of torch state_dict keys (e.g. from a
    reference ``model.state_dict().keys()``).  When given, the result is
    keyed EXACTLY by the ``like`` keys: duplicate registrations the import
    drops (``diffusion.net.*`` / ``diffusion.diffusion.net.*`` aliases of
    ``unet.*`` — reference model.py:30-32, generative.py:779) are filled
    from the shared tensor, and deterministic torch buffers
    (``inv_freq``/``beta``/``window``/``pos_indices``, never parameters)
    are skipped — a fresh torch module already holds their values.  With
    ``strict=True`` any other unmatchable key raises.
    """
    import re
    flat = _flatten(params)
    base: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        leaf = path[-1]
        torch_leaf = _EXPORT_LEAF_NAMES.get(leaf, leaf)
        key = flax_path_to_torch_key(path[:-1] + (torch_leaf,))
        # the merge is many-to-one only for torch keys that were never
        # parameters; a collision between two real params would silently
        # drop one — refuse instead
        assert key not in base, f"flax paths collide at torch key {key!r}"
        base[key] = np.asarray(
            _unconvert_leaf(leaf, np.asarray(value))).astype(np.float32)
    if like is None:
        return base

    alias = re.compile(r"^(?:diffusion\.)+net\.")
    out: Dict[str, np.ndarray] = {}
    missing = []
    for key in like:
        if key in base:
            out[key] = base[key]
            continue
        stripped = alias.sub("", key)
        if alias.match(key) and ("unet." + stripped) in base:
            out[key] = base["unet." + stripped]
        elif key.rsplit(".", 1)[-1] in _BUFFER_NAMES:
            continue                            # deterministic torch buffer
        elif strict:
            missing.append(key)
    if strict and missing:
        raise KeyError(f"torch keys with no flax source: {missing[:10]}"
                       f" (+{max(0, len(missing) - 10)} more)")
    return out


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
