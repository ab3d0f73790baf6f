"""STFT / iSTFT codec (reference `modules.py:1389-1472`), jnp-native.

Matches torch.stft semantics: center=True with reflect padding, hann window
(zero-padded to n_fft when shorter), normalized=True (scale by
win_length**-0.5), onesided rfft.  iSTFT is the least-squares inverse:
overlap-add of windowed frames divided by the window-square envelope.

Layout: waves are channels-last (b, L, C); spectrogram tensors follow the
reference's (b, c, f, t) so the 1-d flattened codec (encode1d/decode1d)
matches bit-for-bit.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.utils import closest_power_2


def _hann(window_length: int, n_fft: int) -> np.ndarray:
    w = np.hanning(window_length + 1)[:-1].astype(np.float32)
    if window_length < n_fft:
        pad = (n_fft - window_length) // 2
        w = np.pad(w, (pad, n_fft - window_length - pad))
    return w


class STFT:
    """Stateless STFT helper (no learnable params)."""

    def __init__(self, num_fft: int = 1023, hop_length: Optional[int] = 256,
                 window_length: Optional[int] = None,
                 length: Optional[int] = None, use_complex: bool = False):
        self.num_fft = num_fft
        self.hop_length = hop_length if hop_length is not None \
            else num_fft // 4
        self.window_length = window_length if window_length is not None \
            else num_fft
        self.length = length
        self.use_complex = use_complex
        self.window = jnp.asarray(_hann(self.window_length, num_fft))

    @property
    def freq_bins(self) -> int:
        return self.num_fft // 2 + 1

    def _frame(self, wave: jax.Array) -> jax.Array:
        """(n, L) -> (n, frames, n_fft) with center/reflect padding."""
        n_fft, hop = self.num_fft, self.hop_length
        pad = n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
        num_frames = 1 + (wave.shape[1] - n_fft) // hop
        idx = (np.arange(num_frames)[:, None] * hop
               + np.arange(n_fft)[None, :])
        return wave[:, idx]

    def encode(self, wave: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """wave (b, L, C) -> (stft_a, stft_b) each (b, C, F, T):
        magnitude/phase, or real/imag when use_complex."""
        b, length, c = wave.shape
        flat = jnp.transpose(wave, (0, 2, 1)).reshape(b * c, length)
        frames = self._frame(flat) * self.window[None, None, :]
        spec = jnp.fft.rfft(frames, n=self.num_fft, axis=-1)
        spec = spec * (self.num_fft ** -0.5)          # torch normalized=True
        spec = jnp.swapaxes(spec, 1, 2)               # (n, F, T)
        if self.use_complex:
            a, bb = jnp.real(spec), jnp.imag(spec)
        else:
            a, bb = jnp.abs(spec), jnp.angle(spec)
        shape = (b, c, self.freq_bins, spec.shape[-1])
        return a.reshape(shape), bb.reshape(shape)

    def decode(self, stft_a: jax.Array, stft_b: jax.Array) -> jax.Array:
        """(b, C, F, T) pair -> wave (b, L, C)."""
        b, c, f, t = stft_a.shape
        length = self.length if self.length is not None else \
            closest_power_2(t * self.hop_length)
        if self.use_complex:
            spec = stft_a + 1j * stft_b
        else:
            spec = stft_a * jnp.exp(1j * stft_b)
        spec = spec.reshape(b * c, f, t) * (self.num_fft ** 0.5)
        frames = jnp.fft.irfft(jnp.swapaxes(spec, 1, 2), n=self.num_fft,
                               axis=-1)                 # (n, T, n_fft)
        frames = frames * self.window[None, None, :]

        n_fft, hop = self.num_fft, self.hop_length
        total = n_fft + hop * (t - 1)
        idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :])
        wave = jnp.zeros((b * c, total), frames.dtype)
        wave = wave.at[:, idx.reshape(-1)].add(
            frames.reshape(b * c, -1))
        env = jnp.zeros((total,), frames.dtype)
        env = env.at[idx.reshape(-1)].add(
            jnp.tile(jnp.square(self.window), (t,)))
        wave = wave / jnp.maximum(env, 1e-11)

        pad = n_fft // 2
        wave = wave[:, pad:pad + length]
        return jnp.transpose(wave.reshape(b, c, -1), (0, 2, 1))

    def encode1d(self, wave: jax.Array,
                 stacked: bool = True):
        """(b, L, C) -> (b, T, 2*C*F) channels-last flattened codec
        (reference `modules.py:1459-1465` with our layout)."""
        a, bb = self.encode(wave)
        b_, c, f, t = a.shape
        a = a.reshape(b_, c * f, t)
        bb = bb.reshape(b_, c * f, t)
        out_a = jnp.transpose(a, (0, 2, 1))
        out_b = jnp.transpose(bb, (0, 2, 1))
        if stacked:
            return jnp.concatenate([out_a, out_b], axis=-1)
        return out_a, out_b

    def decode1d(self, stft_pair: jax.Array) -> jax.Array:
        """(b, T, 2*C*F) -> wave (b, L, C)."""
        f = self.freq_bins
        b, t, two_cf = stft_pair.shape
        cf = two_cf // 2
        c = cf // f
        a = jnp.transpose(stft_pair[..., :cf], (0, 2, 1)).reshape(b, c, f, t)
        bb = jnp.transpose(stft_pair[..., cf:], (0, 2, 1)).reshape(b, c, f, t)
        return self.decode(a, bb)
