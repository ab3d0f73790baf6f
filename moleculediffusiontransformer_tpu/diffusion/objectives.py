"""Diffusion objectives: v / k (Karras elucidated) / vk.

Functional re-design of reference `diffusion.py:105-301,770-844`.  Each
objective is a stateless dataclass; the network enters as a closure
``net(x, t, **cond) -> x_pred`` so the same math serves Flax modules, Pallas
kernels and test stubs.  ``KDiffusion`` here covers both the reference's
``KDiffusion`` and its byte-identical ``KDiffusion_mod`` clone (the variant
actually dispatched for all QM models — SURVEY §2.2).

Tensor convention: channels-last ``(batch, length, channels)``; sigmas are
``(batch,)`` and broadcast as ``(batch, 1, 1)``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NetFn = Callable[..., jax.Array]   # net(x, t, **cond) -> prediction


def pad_dims(x: jax.Array, ndim: int) -> jax.Array:
    return x.reshape(x.shape + (1,) * ndim)


def clip(x: jax.Array, dynamic_threshold: float = 0.0) -> jax.Array:
    """Clamp to [-1, 1], or Imagen-style dynamic quantile thresholding
    (reference `diffusion.py:75-88`)."""
    if dynamic_threshold == 0.0:
        return jnp.clip(x, -1.0, 1.0)
    x_flat = x.reshape(x.shape[0], -1)
    scale = jnp.quantile(jnp.abs(x_flat), dynamic_threshold, axis=-1)
    scale = jnp.maximum(scale, 1.0)
    scale = pad_dims(scale, x.ndim - scale.ndim)
    return jnp.clip(x, -scale, scale) / scale


def to_batch(batch_size: int, sigma: Optional[float] = None,
             sigmas: Optional[jax.Array] = None) -> jax.Array:
    assert (sigma is None) ^ (sigmas is None), "Either sigma or sigmas"
    if sigma is not None:
        return jnp.full((batch_size,), sigma, dtype=jnp.float32)
    return sigmas


@dataclass(frozen=True)
class Objective:
    alias: str = ""

    def denoise(self, net: NetFn, x_noisy: jax.Array, sigmas: jax.Array,
                **cond) -> jax.Array:
        raise NotImplementedError

    def loss(self, net: NetFn, x: jax.Array, sigmas: jax.Array,
             noise: jax.Array, **cond) -> jax.Array:
        raise NotImplementedError

    def loss_from_key(self, net: NetFn, x: jax.Array, key: jax.Array,
                      sigma_distribution, **cond) -> jax.Array:
        ks, kn = jax.random.split(key)
        sigmas = sigma_distribution(ks, x.shape[0])
        noise = jax.random.normal(kn, x.shape, x.dtype)
        return self.loss(net, x, sigmas, noise, **cond)


@dataclass(frozen=True)
class VDiffusion(Objective):
    """v-objective over the half-circle parametrization
    (reference `diffusion.py:124-167`)."""
    alias: str = "v"

    @staticmethod
    def get_alpha_beta(sigmas: jax.Array) -> Tuple[jax.Array, jax.Array]:
        angle = sigmas * math.pi / 2
        return jnp.cos(angle), jnp.sin(angle)

    def denoise(self, net: NetFn, x_noisy: jax.Array, sigmas: jax.Array,
                **cond) -> jax.Array:
        return net(x_noisy, sigmas, **cond)

    def loss(self, net, x, sigmas, noise, **cond):
        sigmas_padded = sigmas.reshape(-1, 1, 1)
        alpha, beta = self.get_alpha_beta(sigmas_padded)
        x_noisy = x * alpha + noise * beta
        x_target = noise * alpha - x * beta
        x_denoised = self.denoise(net, x_noisy, sigmas, **cond)
        return jnp.mean((x_denoised - x_target) ** 2)


@dataclass(frozen=True)
class KDiffusion(Objective):
    """Karras elucidated diffusion (arXiv:2206.00364) — the production
    objective for all QM9 models (reference `diffusion.py:170-239`).

    The denoised estimate is always clipped to [-1, 1] (with optional dynamic
    thresholding) exactly as in the reference — including during training."""
    alias: str = "k"
    sigma_data: float = 0.1
    dynamic_threshold: float = 0.0

    def get_scale_weights(self, sigmas: jax.Array):
        sd = self.sigma_data
        c_noise = jnp.log(sigmas) * 0.25
        s = sigmas.reshape(-1, 1, 1)
        c_skip = (sd ** 2) / (s ** 2 + sd ** 2)
        c_out = s * sd * (sd ** 2 + s ** 2) ** -0.5
        c_in = (s ** 2 + sd ** 2) ** -0.5
        return c_skip, c_out, c_in, c_noise

    def denoise(self, net: NetFn, x_noisy: jax.Array, sigmas: jax.Array,
                **cond) -> jax.Array:
        c_skip, c_out, c_in, c_noise = self.get_scale_weights(sigmas)
        x_pred = net(c_in * x_noisy, c_noise, **cond)
        x_denoised = c_skip * x_noisy + c_out * x_pred
        return clip(x_denoised, self.dynamic_threshold)

    def loss_weight(self, sigmas: jax.Array) -> jax.Array:
        sd = self.sigma_data
        return (sigmas ** 2 + sd ** 2) * (sigmas * sd) ** -2

    def loss(self, net, x, sigmas, noise, **cond):
        sigmas_padded = sigmas.reshape(-1, 1, 1)
        x_noisy = x + sigmas_padded * noise
        x_denoised = self.denoise(net, x_noisy, sigmas, **cond)
        losses = jnp.mean((x_denoised - x) ** 2,
                          axis=tuple(range(1, x.ndim)))
        return jnp.mean(losses * self.loss_weight(sigmas))


@dataclass(frozen=True)
class VKDiffusion(Objective):
    """v-objective in Karras parametrization (reference `diffusion.py:242-301`)."""
    alias: str = "vk"

    @staticmethod
    def get_scale_weights(sigmas: jax.Array):
        sigma_data = 1.0
        s = sigmas.reshape(-1, 1, 1)
        c_skip = (sigma_data ** 2) / (s ** 2 + sigma_data ** 2)
        c_out = -s * sigma_data * (sigma_data ** 2 + s ** 2) ** -0.5
        c_in = (s ** 2 + sigma_data ** 2) ** -0.5
        return c_skip, c_out, c_in

    @staticmethod
    def sigma_to_t(sigmas: jax.Array) -> jax.Array:
        return jnp.arctan(sigmas) / math.pi * 2

    @staticmethod
    def t_to_sigma(t: jax.Array) -> jax.Array:
        return jnp.tan(t * math.pi / 2)

    def denoise(self, net: NetFn, x_noisy: jax.Array, sigmas: jax.Array,
                **cond) -> jax.Array:
        c_skip, c_out, c_in = self.get_scale_weights(sigmas)
        x_pred = net(c_in * x_noisy, self.sigma_to_t(sigmas), **cond)
        return c_skip * x_noisy + c_out * x_pred

    def loss(self, net, x, sigmas, noise, **cond):
        sigmas_padded = sigmas.reshape(-1, 1, 1)
        x_noisy = x + sigmas_padded * noise
        c_skip, c_out, c_in = self.get_scale_weights(sigmas)
        x_pred = net(c_in * x_noisy, self.sigma_to_t(sigmas), **cond)
        v_target = (x - c_skip * x_noisy) / (c_out + 1e-7)
        return jnp.mean((x_pred - v_target) ** 2)


def make_objective(alias: str, *, sigma_data: float = 0.1,
                   dynamic_threshold: float = 0.0) -> Objective:
    """Factory mirroring ``XDiffusion``/``XDiffusion_x`` alias dispatch
    (reference `diffusion.py:667-719`)."""
    if alias == "v":
        return VDiffusion()
    if alias == "k":
        return KDiffusion(sigma_data=sigma_data,
                          dynamic_threshold=dynamic_threshold)
    if alias == "vk":
        return VKDiffusion()
    raise ValueError(f"type='{alias}' must be one of ('v', 'k', 'vk')")
