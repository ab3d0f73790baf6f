"""Graph-analog diffusion models (reference `graphmodel.py:225-598`):
conditional diffusion over packed per-node tensors — row 0 node numbers
(unused), rows 1:4 xyz coordinates, rows 4: neighbor features (sparse:
``max_neighbors`` rows; full: a ``max_length`` adjacency block).

Channels-last packing here: input (b, L, 4 + neighbor_rows).

Recorded deviation: the reference's ``AnalogDiffusionSparse.forward`` reads
a free global ``max_neighbors`` UNCONDITIONALLY (`graphmodel.py:320`) — the
slice runs before the ``predict_neighbors`` guard, so every reference
Sparse forward raises NameError unless the caller injects that global into
the module namespace; here it is an explicit field.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .qm_diffusion import QMDiffusionBase


def _pad_length(x: jax.Array, max_length: int) -> jax.Array:
    """Zero-pad/truncate the length axis (reference `graphmodel.py:220-223`
    channels-last analog)."""
    b, length, c = x.shape
    if length >= max_length:
        return x[:, :max_length]
    return jnp.pad(x, ((0, 0), (0, max_length - length), (0, 0)))


class AnalogDiffusionSparse(QMDiffusionBase):
    """Sparse-neighbor variant (reference `graphmodel.py:225-389`):
    patch_size=8, num_blocks (2,2), attentions (1,1); diffusion target =
    padded xyz [+ ``max_neighbors`` neighbor rows when predict_neighbors].

    ``pred_dim`` must equal 3 (+ max_neighbors when predicting neighbors).
    """
    patch_size: int = 8
    num_blocks: Tuple[int, ...] = (2, 2)
    attentions: Tuple[int, ...] = (1, 1)
    pre_transformer: int = 0
    predict_neighbors: bool = False
    max_neighbors: int = 12

    def pack_target(self, output: jax.Array) -> jax.Array:
        """(b, L, 4 + neighbors) packed input -> diffusion target."""
        xyz = _pad_length(output[..., 1:4], self.max_length)
        if not self.predict_neighbors:
            return xyz
        neigh = _pad_length(output[..., 4:4 + self.max_neighbors],
                            self.max_length)
        return jnp.concatenate([xyz, neigh], axis=-1)

    def __call__(self, sequences: jax.Array, output: jax.Array,
                 key: jax.Array) -> jax.Array:
        return super().__call__(sequences, self.pack_target(output), key)


class AnalogDiffusionFull(AnalogDiffusionSparse):
    """Full-neighbor-matrix variant (reference `graphmodel.py:391-598`):
    the cfg branch uses patch_size=4 with num_blocks (3, 3)
    (`graphmodel.py:436-440`; the unused 'base' branch differs); the
    neighbor block spans ``max_length`` rows (dense adjacency).

    Unlike Sparse, the reference Full.forward does NOT length-pad — it
    concatenates the xyz and adjacency slices at the input's own length
    (`graphmodel.py:497-513`), so the caller supplies ``max_length``-ready
    (or UNet-divisible) inputs.  Matched here."""
    patch_size: int = 4
    num_blocks: Tuple[int, ...] = (3, 3)
    predict_neighbors: bool = True

    def pack_target(self, output: jax.Array) -> jax.Array:
        xyz = output[..., 1:4]
        if not self.predict_neighbors:
            return xyz
        neigh = output[..., 4:4 + self.max_length]
        return jnp.concatenate([xyz, neigh], axis=-1)
