"""Position / time / number embeddings.

Covers the reference's embedding zoo: the random-Fourier continuous-time
embedding used for sigma conditioning (`modules.py:545-566`), the CFG null
embedding table (`modules.py:1186-1199`), sinusoidal integer embeddings
(`modules.py:532-542`), NumberEmbedder (`modules.py:1362-1381`), and the
non-learned Fourier positional-encoding suite (1D/2D/3D) that the task layer
uses as property-conditioning features (`transformer.py:340-529`,
`generative.py:60,752`).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .primitives import Dense, Dtype, gelu


def sinusoidal_embedding(x: jax.Array, dim: int) -> jax.Array:
    """Log-spaced sin/cos embedding for integers (reference
    `SinusoidalEmbedding`, `modules.py:532-542`)."""
    half_dim = dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = x[:, None].astype(jnp.float32) * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class LearnedPositionalEmbedding(nn.Module):
    """Random-Fourier embedding for continuous time/sigma
    (reference `modules.py:545-559`): ``[x, sin(2π w x), cos(2π w x)]``.
    Param 'weights' is (dim/2,), N(0,1) init — torch ``randn``."""
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.dim % 2 == 0
        weights = self.param("weights", nn.initializers.normal(stddev=1.0),
                             (self.dim // 2,))
        x = x[:, None].astype(jnp.float32)
        freqs = x * weights[None, :] * 2 * math.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def time_positional_embedding(x: jax.Array, dim: int, out_features: int,
                              name: str, dtype: Dtype = jnp.float32) -> jax.Array:
    """Reference ``TimePositionalEmbedding`` (`modules.py:562-566`) —
    a Sequential(LearnedPositionalEmbedding, Linear).  Inlined into the
    caller's scope with torch-Sequential child names ``{name}_0``/``{name}_1``
    so state-dict import is mechanical."""
    x = LearnedPositionalEmbedding(dim, name=f"{name}_0")(x)
    return Dense(out_features, dtype=dtype, name=f"{name}_1")(x)


class TimePositionalEmbedding(nn.Module):
    """Module form of :func:`time_positional_embedding` for standalone use."""
    dim: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return time_positional_embedding(x, self.dim, self.out_features,
                                         name="emb", dtype=self.dtype)


class FixedEmbedding(nn.Module):
    """Learned positional table — the CFG "null" conditioning
    (reference `modules.py:1186-1199`).  Output depends only on the input's
    (batch, length), never its values."""
    max_length: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .primitives import Embed
        batch, length = x.shape[0], x.shape[1]
        assert length <= self.max_length, "sequence length > max_length"
        emb = Embed(self.max_length, self.features, dtype=self.dtype,
                    name="embedding")(jnp.arange(length))
        return jnp.broadcast_to(emb[None], (batch, length, self.features))


class NumberEmbedder(nn.Module):
    """Scalar(s) -> Fourier embedding (reference `modules.py:1362-1381`).
    Accepts any shape; returns shape + (features,)."""
    features: int
    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x, dtype=jnp.float32)
        shape = x.shape
        flat = x.reshape(-1)
        emb = time_positional_embedding(flat, self.dim, self.features,
                                        name="embedding", dtype=self.dtype)
        return emb.reshape(*shape, self.features)


def _fourier_inv_freq(channels: int) -> np.ndarray:
    return 1.0 / (10000 ** (np.arange(0, channels, 2, dtype=np.float32)
                            / channels))


def positional_encoding_1d(length: int, channels: int,
                           dtype=jnp.float32) -> jax.Array:
    """Non-learned sinusoidal 1-D positional encoding, (length, channels)
    (reference `PositionalEncoding1D`, `transformer.py:340-366`).
    Layout: [sin(w0 x) … sin(wn x), cos(w0 x) … cos(wn x)], zero-padded and
    truncated to ``channels``.  Static — computed host-side with numpy."""
    ch = int(np.ceil(channels / 2) * 2)
    inv_freq = _fourier_inv_freq(ch)
    pos = np.arange(length, dtype=np.float32)
    sin_inp = np.einsum("i,j->ij", pos, inv_freq)
    emb = np.concatenate([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
    out = np.zeros((length, ch), dtype=np.float32)
    out[:, :emb.shape[1]] = emb
    return jnp.asarray(out[:, :channels], dtype=dtype)


def positional_encoding_2d(nx: int, ny: int, channels: int,
                           dtype=jnp.float32) -> jax.Array:
    """(nx, ny, channels) sinusoidal 2-D encoding
    (reference `transformer.py:387-421`)."""
    ch = int(np.ceil(channels / 4) * 2)
    inv_freq = _fourier_inv_freq(ch)
    pos_x = np.arange(nx, dtype=np.float32)
    pos_y = np.arange(ny, dtype=np.float32)
    sx = np.einsum("i,j->ij", pos_x, inv_freq)
    sy = np.einsum("i,j->ij", pos_y, inv_freq)
    emb_x = np.concatenate([np.sin(sx), np.cos(sx)], -1)[:, None, :]
    emb_y = np.concatenate([np.sin(sy), np.cos(sy)], -1)[None, :, :]
    out = np.zeros((nx, ny, ch * 2), dtype=np.float32)
    out[:, :, :ch] = emb_x
    out[:, :, ch:2 * ch] = emb_y
    return jnp.asarray(out[:, :, :channels], dtype=dtype)


def positional_encoding_3d(nx: int, ny: int, nz: int, channels: int,
                           dtype=jnp.float32) -> jax.Array:
    """(nx, ny, nz, channels) sinusoidal 3-D encoding
    (reference `transformer.py:442-497`)."""
    ch = int(np.ceil(channels / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = _fourier_inv_freq(ch)
    def enc(n):
        s = np.einsum("i,j->ij", np.arange(n, dtype=np.float32), inv_freq)
        return np.concatenate([np.sin(s), np.cos(s)], -1)
    emb_x = enc(nx)[:, None, None, :]
    emb_y = enc(ny)[None, :, None, :]
    emb_z = enc(nz)[None, None, :, :]
    out = np.zeros((nx, ny, nz, ch * 3), dtype=np.float32)
    out[..., :ch] = emb_x
    out[..., ch:2 * ch] = emb_y
    out[..., 2 * ch:] = emb_z
    return jnp.asarray(out[..., :channels], dtype=dtype)
