"""Standalone conv encoder / decoder / autoencoder
(reference `modules.py:1482-1684`) — latent-diffusion support."""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Patcher, Unpatcher
from .primitives import Conv1d, Dtype
from .unet import DownsampleBlock1d, UpsampleBlock1d


class TanhBottleneck(nn.Module):
    """Simple concrete bottleneck (the reference ships only the abstract
    base, `modules.py:1482-1486`; users pass their own)."""

    @nn.compact
    def __call__(self, x, with_info: bool = False):
        out = jnp.tanh(x)
        return (out, {}) if with_info else out


class Encoder1d(nn.Module):
    """Patcher -> L x DownsampleBlock -> 1x1 out conv
    (reference `modules.py:1489-1559`)."""
    in_channels: int
    channels: int
    multipliers: Tuple[int, ...]
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    bottlenecks: Tuple[Any, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def num_layers(self) -> int:
        return len(self.multipliers) - 1

    @property
    def downsample_factor(self) -> int:
        f = self.patch_size
        for x in self.factors:
            f *= x
        return f

    @property
    def encoded_channels(self) -> int:
        return (self.out_channels if self.out_channels is not None
                else self.channels * self.multipliers[-1])

    @nn.compact
    def __call__(self, x: jax.Array, with_info: bool = False):
        assert (len(self.factors) == self.num_layers
                and len(self.num_blocks) == self.num_layers)
        xs = [x]
        x = Patcher(self.channels * self.multipliers[0], self.patch_size,
                    dtype=self.dtype, name="to_in")(x)
        xs.append(x)
        for i in range(self.num_layers):
            x = DownsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i], num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i], dtype=self.dtype,
                name=f"downsamples_{i}")(x)
            xs.append(x)
        if self.out_channels is not None:
            x = Conv1d(self.out_channels, kernel_size=1, padding=0,
                       dtype=self.dtype, name="to_out")(x)
        xs.append(x)
        info = dict(xs=xs)
        for bottleneck in self.bottlenecks:
            x, info_b = bottleneck(x, with_info=True)
            info.update({f"bottleneck_{k}": v for k, v in info_b.items()})
        return (x, info) if with_info else x


class Decoder1d(nn.Module):
    """1x1 in conv -> L x UpsampleBlock -> Unpatcher
    (reference `modules.py:1562-1623`)."""
    out_channels: int
    channels: int
    multipliers: Tuple[int, ...]
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    in_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, with_info: bool = False):
        num_layers = len(self.multipliers) - 1
        assert (len(self.factors) == num_layers
                and len(self.num_blocks) == num_layers)
        xs = [x]
        if self.in_channels is not None:
            x = Conv1d(self.channels * self.multipliers[0], kernel_size=1,
                       padding=0, dtype=self.dtype, name="to_in")(x)
        xs.append(x)
        for i in range(num_layers):
            x = UpsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i], num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i], dtype=self.dtype,
                name=f"upsamples_{i}")(x)
            xs.append(x)
        x = Unpatcher(self.out_channels, self.patch_size, dtype=self.dtype,
                      name="to_out")(x)
        xs.append(x)
        return (x, dict(xs=xs)) if with_info else x


class AutoEncoder1d(nn.Module):
    """Encoder + mirrored decoder (reference `modules.py:1626-1684`)."""
    in_channels: int
    channels: int
    multipliers: Tuple[int, ...]
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    bottleneck_channels: Optional[int] = None
    bottlenecks: Tuple[Any, ...] = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder1d(
            in_channels=self.in_channels,
            out_channels=self.bottleneck_channels,
            channels=self.channels, multipliers=self.multipliers,
            factors=self.factors, num_blocks=self.num_blocks,
            patch_size=self.patch_size, resnet_groups=self.resnet_groups,
            bottlenecks=self.bottlenecks, dtype=self.dtype)
        self.decoder = Decoder1d(
            in_channels=self.bottleneck_channels,
            out_channels=(self.out_channels if self.out_channels is not None
                          else self.in_channels),
            channels=self.channels, multipliers=self.multipliers[::-1],
            factors=self.factors[::-1], num_blocks=self.num_blocks[::-1],
            patch_size=self.patch_size, resnet_groups=self.resnet_groups,
            dtype=self.dtype)

    def __call__(self, x: jax.Array, with_info: bool = False):
        z, info_e = self.encoder(x, with_info=True)
        y, info_d = self.decoder(z, with_info=True)
        info = {"latent": z,
                **{f"encoder_{k}": v for k, v in info_e.items()},
                **{f"decoder_{k}": v for k, v in info_d.items()}}
        return (y, info) if with_info else y

    def encode(self, x: jax.Array, with_info: bool = False):
        return self.encoder(x, with_info=with_info)

    def decode(self, z: jax.Array, with_info: bool = False):
        return self.decoder(z, with_info=with_info)
