"""Training-time noise-level (sigma) distributions.

Functional re-design of reference `diffusion.py:24-64`: each distribution is
a pure function of an explicit PRNG key (the reference mutates torch's global
RNG).  QM9 models use ``LogNormal(mean=-1.2, std=1.2)``
(`generative.py:86-91`).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


class SigmaDistribution:
    def __call__(self, key: jax.Array, num_samples: int) -> jax.Array:
        raise NotImplementedError


@dataclass(frozen=True)
class LogNormalDistribution(SigmaDistribution):
    mean: float = -1.2
    std: float = 1.2

    def __call__(self, key: jax.Array, num_samples: int) -> jax.Array:
        normal = self.mean + self.std * jax.random.normal(key, (num_samples,))
        return jnp.exp(normal)


@dataclass(frozen=True)
class UniformDistribution(SigmaDistribution):
    def __call__(self, key: jax.Array, num_samples: int) -> jax.Array:
        return jax.random.uniform(key, (num_samples,))


@dataclass(frozen=True)
class VKDistribution(SigmaDistribution):
    """Reference `diffusion.py:46-64`.  Note: the reference draws the CDF
    variable with ``randn`` (normal), not ``rand`` — we mirror that behavior
    exactly for parity (recorded deviation candidate, SURVEY §7.4.7)."""
    min_value: float = 0.0
    max_value: float = float("inf")
    sigma_data: float = 1.0

    def __call__(self, key: jax.Array, num_samples: int) -> jax.Array:
        min_cdf = math.atan(self.min_value / self.sigma_data) * 2 / math.pi
        max_cdf = math.atan(self.max_value / self.sigma_data) * 2 / math.pi
        u = (max_cdf - min_cdf) * jax.random.normal(key, (num_samples,)) + min_cdf
        return jnp.tan(u * math.pi / 2) * self.sigma_data


def make_distribution(name: str, *, mean: float = -1.2, std: float = 1.2,
                      sigma_data: float = 1.0) -> SigmaDistribution:
    if name == "lognormal":
        return LogNormalDistribution(mean, std)
    if name == "uniform":
        return UniformDistribution()
    if name == "vk":
        return VKDistribution(sigma_data=sigma_data)
    raise ValueError(f"Unknown sigma distribution: {name}")
