"""Convolutional blocks of the 1-D UNet (reference `modules.py:32-257`).

Channels-last throughout.  Submodule names mirror the reference's torch
attribute names (with Sequential indices merged as ``name_i``) so that a
reference ``state_dict`` imports mechanically.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .primitives import (Conv1d, ConvTranspose1d, Dense, Dtype, GroupNorm,
                         gelu, patchify, silu, unpatchify)


def downsample1d(x: jax.Array, out_channels: int, factor: int,
                 kernel_multiplier: int = 2, *, dtype: Dtype = jnp.float32,
                 name: str = "downsample") -> jax.Array:
    """Strided-conv downsampling (reference `Downsample1d`,
    `modules.py:40-51`): kernel = factor*mult+1, stride = factor."""
    assert kernel_multiplier % 2 == 0, "Kernel multiplier must be even"
    return Conv1d(out_channels,
                  kernel_size=factor * kernel_multiplier + 1,
                  stride=factor,
                  padding=factor * (kernel_multiplier // 2),
                  dtype=dtype, name=name)(x)


def upsample1d(x: jax.Array, out_channels: int, factor: int,
               use_nearest: bool = False, *, dtype: Dtype = jnp.float32,
               name: str = "upsample") -> jax.Array:
    """Upsampling (reference `Upsample1d`, `modules.py:54-81`): transposed
    conv (kernel 2f, stride f) by default, or nearest-repeat + conv."""
    if factor == 1:
        return Conv1d(out_channels, kernel_size=3, padding=1,
                      dtype=dtype, name=name)(x)
    if use_nearest:
        x = jnp.repeat(x, factor, axis=1)
        return Conv1d(out_channels, kernel_size=3, padding=1,
                      dtype=dtype, name=f"{name}_1")(x)
    return ConvTranspose1d(out_channels,
                           kernel_size=factor * 2,
                           stride=factor,
                           padding=factor // 2 + factor % 2,
                           output_padding=factor % 2,
                           dtype=dtype, name=name)(x)


class ConvBlock1d(nn.Module):
    """GroupNorm -> (FiLM scale-shift) -> SiLU -> Conv1d
    (reference `modules.py:84-122`)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 scale_shift: Optional[Tuple[jax.Array, jax.Array]] = None
                 ) -> jax.Array:
        if self.use_norm:
            x = GroupNorm(self.num_groups, dtype=self.dtype,
                          name="groupnorm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = silu(x)
        return Conv1d(self.out_channels, kernel_size=self.kernel_size,
                      stride=self.stride, padding=self.padding,
                      dilation=self.dilation, dtype=self.dtype,
                      name="project")(x)


class MappingToScaleShift(nn.Module):
    """FiLM head: mapping -> (scale, shift), each (b, 1, channels)
    (reference `modules.py:125-142`; channels-last broadcast)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mapping: jax.Array) -> Tuple[jax.Array, jax.Array]:
        ss = Dense(self.channels * 2, dtype=self.dtype,
                   name="to_scale_shift_1")(silu(mapping))
        ss = ss[:, None, :]                       # (b, 1, 2c)
        scale, shift = jnp.split(ss, 2, axis=-1)
        return scale, shift


class ResnetBlock1d(nn.Module):
    """Two ConvBlocks with FiLM conditioning from ``mapping`` plus a 1x1
    skip projection (reference `modules.py:145-205`)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_norm: bool = True
    num_groups: int = 8
    use_mapping: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mapping: Optional[jax.Array] = None) -> jax.Array:
        assert not (self.use_mapping ^ (mapping is not None)), \
            "context mapping required iff use_mapping"
        h = ConvBlock1d(self.out_channels, kernel_size=self.kernel_size,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation, use_norm=self.use_norm,
                        num_groups=self.num_groups, dtype=self.dtype,
                        name="block1")(x)
        scale_shift = None
        if self.use_mapping:
            scale_shift = MappingToScaleShift(
                self.out_channels, dtype=self.dtype,
                name="to_scale_shift")(mapping)
        h = ConvBlock1d(self.out_channels, use_norm=self.use_norm,
                        num_groups=self.num_groups, dtype=self.dtype,
                        name="block2")(h, scale_shift=scale_shift)
        if x.shape[-1] != self.out_channels:
            x = Conv1d(self.out_channels, kernel_size=1, padding=0,
                       dtype=self.dtype, name="to_out")(x)
        return h + x


class Patcher(nn.Module):
    """ResnetBlock then length->channel patchify (reference
    `modules.py:208-231`): (b, L*p, c_in) -> (b, L, out_channels)."""
    out_channels: int
    patch_size: int
    use_mapping: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mapping: Optional[jax.Array] = None) -> jax.Array:
        assert self.out_channels % self.patch_size == 0, \
            f"out_channels must be divisible by patch_size ({self.patch_size})"
        x = ResnetBlock1d(self.out_channels // self.patch_size, num_groups=1,
                          use_mapping=self.use_mapping, dtype=self.dtype,
                          name="block")(x, mapping)
        return patchify(x, self.patch_size)


class Unpatcher(nn.Module):
    """Channel->length unpatchify then ResnetBlock (reference
    `modules.py:234-257`): (b, L, c_in) -> (b, L*p, out_channels)."""
    out_channels: int
    patch_size: int
    use_mapping: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mapping: Optional[jax.Array] = None) -> jax.Array:
        assert x.shape[-1] % self.patch_size == 0, \
            f"in_channels must be divisible by patch_size ({self.patch_size})"
        x = unpatchify(x, self.patch_size)
        return ResnetBlock1d(self.out_channels, num_groups=1,
                             use_mapping=self.use_mapping, dtype=self.dtype,
                             name="block")(x, mapping)


class ConditionedSequential(nn.Module):
    """Sequential with a shared ``(x, mapping)`` signature
    (reference `modules.py:16-24`)."""
    modules_list: Tuple[Any, ...] = ()

    def __call__(self, x: jax.Array,
                 mapping: Optional[jax.Array] = None) -> jax.Array:
        for module in self.modules_list:
            x = module(x, mapping)
        return x
