"""Graph-analog diffusion models (reference `graphmodel.py:225-598`):
conditional diffusion over packed per-node tensors — row 0 node numbers
(unused), rows 1:4 xyz coordinates, rows 4: neighbor features (sparse:
``max_neighbors`` rows; full: a ``max_length`` adjacency block).

Channels-last packing here: input (b, L, 4 + neighbor_rows).

Recorded deviation: the reference's ``AnalogDiffusionSparse.forward`` reads
a free global ``max_neighbors`` (`graphmodel.py:320`, a latent NameError);
here it is an explicit field.
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
    patch_size=4; neighbor block spans ``max_length`` rows (dense
    adjacency)."""
    patch_size: int = 4
    predict_neighbors: bool = True

    def pack_target(self, output: jax.Array) -> jax.Array:
        xyz = _pad_length(output[..., 1:4], self.max_length)
        if not self.predict_neighbors:
            return xyz
        neigh = _pad_length(output[..., 4:4 + self.max_length],
                            self.max_length)
        return jnp.concatenate([xyz, neigh], axis=-1)
