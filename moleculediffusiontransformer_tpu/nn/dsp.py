"""Windowed-sinc resampling (reference `utils.py:95-130`, adapted-from-
torchaudio lineage), channels-last.

The sinc kernel bank is computed host-side with numpy (static for given
factors) and applied as one im2col matmul per call — MXU-friendly and exact
fp32 (same lowering decision as `nn/primitives.conv1d_im2col`).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import conv1d_im2col


@lru_cache(maxsize=None)
def _sinc_kernels(factor_in: int, factor_out: int, rolloff: float = 0.99,
                  lowpass_filter_width: int = 6):
    """Kernel bank (kw, 1, factor_out) + left pad width, matching the
    reference's construction exactly."""
    base_factor = min(factor_in, factor_out) * rolloff
    width = math.ceil(lowpass_filter_width * factor_in / base_factor)
    idx = np.arange(-width, width + factor_in, dtype=np.float64)[None, None] \
        / factor_in
    t = (np.arange(0, -factor_out, step=-1,
                   dtype=np.float64)[:, None, None] / factor_out + idx)
    t = np.clip(t * base_factor, -lowpass_filter_width,
                lowpass_filter_width) * math.pi
    window = np.cos(t / lowpass_filter_width / 2) ** 2
    scale = base_factor / factor_in
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = (kernels * window * scale).astype(np.float32)
    # torch conv weight (factor_out, 1, kw) -> WIO (kw, 1, factor_out)
    return np.transpose(kernels, (2, 1, 0)), width


def resample(x: jax.Array, factor_in: int, factor_out: int,
             rolloff: float = 0.99,
             lowpass_filter_width: int = 6) -> jax.Array:
    """Sinc-interpolation resampling of (b, L, C) along the length axis."""
    b, length, c = x.shape
    length_target = int(factor_out * length / factor_in)
    kernels, width = _sinc_kernels(factor_in, factor_out, rolloff,
                                   lowpass_filter_width)
    # each channel resampled independently: fold channels into batch
    mono = jnp.transpose(x, (0, 2, 1)).reshape(b * c, length, 1)
    out = conv1d_im2col(mono, jnp.asarray(kernels), stride=factor_in,
                        pad_lo=width, pad_hi=width + factor_in,
                        dtype=x.dtype)                   # (b*c, l, factor_out)
    out = out.reshape(b * c, -1)[:, :length_target]      # interleave phases
    return jnp.transpose(out.reshape(b, c, length_target), (0, 2, 1))


def downsample(x: jax.Array, factor: int, **kwargs) -> jax.Array:
    return resample(x, factor_in=factor, factor_out=1, **kwargs)


def upsample(x: jax.Array, factor: int, **kwargs) -> jax.Array:
    return resample(x, factor_in=1, factor_out=factor, **kwargs)
