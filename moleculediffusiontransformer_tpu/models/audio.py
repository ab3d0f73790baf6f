"""Generic 1-d diffusion model assemblies and audio-lineage presets
(reference `model.py:27-431`).  Exported API-surface parity: the QM9 flow
never touches these, but the reference documents them as the "flexible
any-sequence-data" story (README.md:69-71).

All tensors channels-last (b, L, C).  Sampling runs as jitted lax.scan via
``diffusion.samplers``; randomness by explicit key.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..diffusion.distributions import (LogNormalDistribution,
                                       SigmaDistribution,
                                       UniformDistribution)
from ..diffusion.objectives import make_objective
from ..diffusion.samplers import sample as run_sampler
from ..diffusion.schedules import make_schedule
from ..nn.autoencoder import Encoder1d
from ..nn.dsp import downsample, upsample
from ..nn.embeddings import sinusoidal_embedding
from ..nn.primitives import Dtype
from ..nn.stft import STFT
from ..nn.unet import XUNet1d


class Model1d(nn.Module):
    """XUNet1d + diffusion objective glue (reference `model.py:27-38`).
    ``__call__`` returns the training loss; use :func:`sample_model1d`."""
    in_channels: int
    channels: int
    multipliers: Tuple[int, ...]
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    attentions: Tuple[int, ...]
    unet_type: str = "base"
    patch_size: int = 1
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    context_features: Optional[int] = None
    context_channels: Tuple[int, ...] = ()
    context_embedding_features: Optional[int] = None
    context_embedding_max_length: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    pre_transformer: int = 0
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    # diffusion_* config (reference routes these by kwarg prefix)
    diffusion_type: str = "v"
    diffusion_sigma_distribution: SigmaDistribution = UniformDistribution()
    diffusion_sigma_data: float = 0.1
    diffusion_dynamic_threshold: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def objective(self):
        return make_objective(self.diffusion_type,
                              sigma_data=self.diffusion_sigma_data,
                              dynamic_threshold=self.diffusion_dynamic_threshold)

    def setup(self):
        kwargs = dict(
            in_channels=self.in_channels, channels=self.channels,
            multipliers=self.multipliers, factors=self.factors,
            num_blocks=self.num_blocks, attentions=self.attentions,
            patch_size=self.patch_size, resnet_groups=self.resnet_groups,
            out_channels=self.out_channels,
            context_features=self.context_features,
            context_channels=self.context_channels,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            pre_transformer=self.pre_transformer,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            dtype=self.dtype)
        if self.unet_type in ("cfg", "all"):
            kwargs.update(
                context_embedding_features=self.context_embedding_features,
                context_embedding_max_length=self.context_embedding_max_length)
        elif self.context_embedding_features is not None:
            kwargs.update(
                context_embedding_features=self.context_embedding_features)
        self.unet = XUNet1d(type=self.unet_type, **kwargs)

    def __call__(self, x: jax.Array, key: jax.Array, **net_kwargs):
        net = lambda xn, t: self.unet(xn, t, **net_kwargs)
        return self.objective.loss_from_key(
            net, x, key, self.diffusion_sigma_distribution)

    def denoise(self, x: jax.Array, sigmas: jax.Array, **net_kwargs):
        net = lambda xn, t: self.unet(xn, t, **net_kwargs)
        return self.objective.denoise(net, x, sigmas)


def sample_model1d(model: Model1d, variables, noise: jax.Array,
                   key: jax.Array, *, num_steps: int = 50,
                   sampler: str = "v", schedule: str = "linear",
                   sigma_min: float = 1e-3, sigma_max: float = 9.0,
                   schedule_rho: float = 3.0, clamp: bool = True,
                   method=None, **net_kwargs) -> jax.Array:
    """DiffusionSampler equivalent for the Model1d family; defaults mirror
    ``get_default_sampling_kwargs`` (LinearSchedule + VSampler + clamp,
    reference `model.py:317-320`)."""
    sigmas = jnp.asarray(make_schedule(schedule, num_steps,
                                       sigma_min=sigma_min,
                                       sigma_max=sigma_max,
                                       rho=schedule_rho))

    def denoise(x, s):
        return model.apply(variables, x, s,
                           method=method or type(model).denoise,
                           **net_kwargs)

    return run_sampler(denoise, noise, sigmas, key, num_steps,
                       sampler=sampler, clamp=clamp,
                       objective_alias=model.diffusion_type)


class DiffusionUpsampler1d(Model1d):
    """Super-resolution diffusion (reference `model.py:41-101`): condition
    on a randomly down/re-up-sampled copy, optionally embed the factor."""
    factor: Tuple[int, ...] = (2,)
    factor_features: Optional[int] = None

    def random_reupsample(self, x: jax.Array,
                          key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Vectorized analog of the reference's per-factor loop: compute
        every factor's re-upsampled version, select per batch element."""
        b = x.shape[0]
        idx = jax.random.randint(key, (b,), 0, len(self.factor))
        versions = jnp.stack(
            [upsample(downsample(x, f), f) for f in self.factor])  # (F,b,L,C)
        return versions[idx, jnp.arange(b)], idx

    def __call__(self, x: jax.Array, key: jax.Array, **net_kwargs):
        k_aug, k_loss = jax.random.split(key)
        channels, idx = self.random_reupsample(x, k_aug)
        features = None
        if self.factor_features is not None:
            factors = jnp.asarray(self.factor)[idx].astype(jnp.float32)
            features = sinusoidal_embedding(factors, self.factor_features)
        net = lambda xn, t: self.unet(xn, t, channels_list=[channels],
                                      features=features, **net_kwargs)
        return self.objective.loss_from_key(
            net, x, k_loss, self.diffusion_sigma_distribution)

    def denoise_upsample(self, x, sigmas, channels, features):
        net = lambda xn, t: self.unet(xn, t, channels_list=[channels],
                                      features=features)
        return self.objective.denoise(net, x, sigmas)


def sample_upsampler(model: DiffusionUpsampler1d, variables,
                     undersampled: jax.Array, key: jax.Array, *,
                     factor: Optional[int] = None, **kwargs) -> jax.Array:
    """(reference `model.py:84-101`)"""
    factor = factor if factor is not None else model.factor[0]
    channels = upsample(undersampled, factor)
    features = None
    if model.factor_features is not None:
        factors = jnp.full((undersampled.shape[0],), factor, jnp.float32)
        features = sinusoidal_embedding(factors, model.factor_features)
    k_noise, k_samp = jax.random.split(key)
    noise = jax.random.normal(k_noise, channels.shape, channels.dtype)
    return sample_model1d(model, variables, noise, k_samp,
                          method=DiffusionUpsampler1d.denoise_upsample,
                          channels=channels, features=features, **kwargs)


class DiffusionAE1d(Model1d):
    """Diffusion autoencoder (reference `model.py:104-136`): an Encoder1d
    latent is injected as context channels at ``encoder_inject_depth``."""
    encoder_channels: int = 16
    encoder_patch_size: int = 1
    encoder_multipliers: Tuple[int, ...] = (1, 2, 4)
    encoder_factors: Tuple[int, ...] = (2, 2)
    encoder_num_blocks: Tuple[int, ...] = (2, 2)
    encoder_out_channels: Optional[int] = None
    encoder_inject_depth: int = 0

    def setup(self):
        super().setup()
        self.encoder = Encoder1d(
            in_channels=self.in_channels, channels=self.encoder_channels,
            multipliers=self.encoder_multipliers,
            factors=self.encoder_factors,
            num_blocks=self.encoder_num_blocks,
            patch_size=self.encoder_patch_size,
            out_channels=self.encoder_out_channels, dtype=self.dtype)

    def __call__(self, x: jax.Array, key: jax.Array, **net_kwargs):
        latent = self.encoder(x)
        net = lambda xn, t: self.unet(xn, t, channels_list=[latent],
                                      **net_kwargs)
        return self.objective.loss_from_key(
            net, x, key, self.diffusion_sigma_distribution)

    def encode(self, x: jax.Array, with_info: bool = False):
        return self.encoder(x, with_info=with_info)

    def denoise_latent(self, x, sigmas, latent):
        net = lambda xn, t: self.unet(xn, t, channels_list=[latent])
        return self.objective.denoise(net, x, sigmas)


def decode_ae(model: DiffusionAE1d, variables, latent: jax.Array,
              key: jax.Array, *, downsample_factor: int, **kwargs):
    """Decode by sampling conditioned on latent channels
    (reference `model.py:128-136`)."""
    from ..core.utils import closest_power_2
    b = latent.shape[0]
    length = closest_power_2(latent.shape[1] * downsample_factor)
    k_noise, k_samp = jax.random.split(key)
    noise = jax.random.normal(k_noise, (b, length, model.in_channels))
    return sample_model1d(model, variables, noise, k_samp,
                          method=DiffusionAE1d.denoise_latent,
                          latent=latent, **kwargs)


class DiffusionVocoder1d(Model1d):
    """Phase diffusion conditioned on magnitude STFT
    (reference `model.py:139-176`).  Spectrogram tensors (b, C, F, T)."""
    stft_num_fft: int = 1023
    stft_hop_length: int = 256

    @property
    def stft(self) -> STFT:
        return STFT(num_fft=self.stft_num_fft,
                    hop_length=self.stft_hop_length)

    def __call__(self, magnitude: jax.Array, phase: jax.Array,
                 key: jax.Array, **net_kwargs):
        b, c, f, t = magnitude.shape
        mag = jnp.transpose(magnitude.reshape(b, c * f, t), (0, 2, 1))
        ph = jnp.transpose(phase.reshape(b, c * f, t), (0, 2, 1))
        net = lambda xn, tt: self.unet(xn, tt, channels_list=[mag],
                                       **net_kwargs)
        return self.objective.loss_from_key(
            net, ph / math.pi, key, self.diffusion_sigma_distribution)

    def loss_from_wave(self, x: jax.Array, key: jax.Array, **net_kwargs):
        magnitude, phase = self.stft.encode(x)
        return self(magnitude, phase, key, **net_kwargs)

    def denoise_vocoder(self, x, sigmas, magnitude_flat):
        net = lambda xn, t: self.unet(xn, t, channels_list=[magnitude_flat])
        return self.objective.denoise(net, x, sigmas)


def sample_vocoder(model: DiffusionVocoder1d, variables,
                   magnitude: jax.Array, key: jax.Array,
                   **kwargs) -> jax.Array:
    """magnitude (b, C, F, T) -> wave (b, L, C)
    (reference `model.py:168-176`)."""
    b, c, f, t = magnitude.shape
    mag_flat = jnp.transpose(magnitude.reshape(b, c * f, t), (0, 2, 1))
    k_noise, k_samp = jax.random.split(key)
    noise = jax.random.normal(k_noise, mag_flat.shape)
    phase_flat = sample_model1d(model, variables, noise, k_samp,
                                method=DiffusionVocoder1d.denoise_vocoder,
                                magnitude_flat=mag_flat, **kwargs)
    phase = jnp.transpose(phase_flat, (0, 2, 1)).reshape(b, c, f, t)
    return model.stft.decode(magnitude, phase * math.pi)


class DiffusionUpphaser1d(DiffusionUpsampler1d):
    """Upsampler + random-rephase augmentation (reference `model.py:179-195`)."""
    stft_num_fft: int = 1023
    stft_hop_length: int = 256

    @property
    def stft(self) -> STFT:
        return STFT(num_fft=self.stft_num_fft,
                    hop_length=self.stft_hop_length)

    def random_rephase(self, x: jax.Array, key: jax.Array) -> jax.Array:
        stft = STFT(num_fft=self.stft_num_fft,
                    hop_length=self.stft_hop_length,
                    length=x.shape[1])
        magnitude, phase = stft.encode(x)
        phase_random = (jax.random.uniform(key, phase.shape) - 0.5) \
            * 2 * math.pi
        return stft.decode(magnitude, phase_random)

    def __call__(self, x: jax.Array, key: jax.Array, **net_kwargs):
        k_phase, k_aug, k_loss = jax.random.split(key, 3)
        rephased = self.random_rephase(x, k_phase)
        resampled, idx = self.random_reupsample(rephased, k_aug)
        features = None
        if self.factor_features is not None:
            factors = jnp.asarray(self.factor)[idx].astype(jnp.float32)
            features = sinusoidal_embedding(factors, self.factor_features)
        net = lambda xn, t: self.unet(xn, t, channels_list=[resampled],
                                      features=features, **net_kwargs)
        return self.objective.loss_from_key(
            net, x, k_loss, self.diffusion_sigma_distribution)


class DiffusionAR1d(Model1d):
    """Chunked autoregressive diffusion (reference `model.py:198-294`):
    train on random (prev, curr) chunk pairs with dropout-to-zero start;
    sample chunk-by-chunk."""
    chunk_length: int = 16
    upsample_factor: int = 0
    dropout: float = 0.05

    def __call__(self, x: jax.Array, key: jax.Array, **net_kwargs):
        b, t, c = x.shape
        cl = self.chunk_length
        num_chunks = t // cl
        assert num_chunks >= 2, "Input length must be >= chunk_length * 2"
        k_idx, k_drop, k_loss = jax.random.split(key, 3)
        chunk_index = jax.random.randint(k_idx, (), 0, num_chunks - 1)
        start = cl * chunk_index
        chunk_prev = jax.lax.dynamic_slice_in_dim(x, start, cl, axis=1)
        chunk_curr = jax.lax.dynamic_slice_in_dim(x, start + cl, cl, axis=1)
        if self.dropout > 0:
            mask = jax.random.bernoulli(k_drop, self.dropout, (b, 1, 1))
            chunk_prev = jnp.where(mask, 0.0, chunk_prev)
        if self.upsample_factor > 0:
            reup = upsample(downsample(chunk_curr, self.upsample_factor),
                            self.upsample_factor)
            channels = jnp.concatenate([chunk_prev, reup], axis=-1)
        else:
            channels = chunk_prev
        net = lambda xn, tt: self.unet(xn, tt, channels_list=[channels],
                                       **net_kwargs)
        return self.objective.loss_from_key(
            net, chunk_curr, k_loss, self.diffusion_sigma_distribution)

    def denoise_chunk(self, x, sigmas, channels):
        net = lambda xn, t: self.unet(xn, t, channels_list=[channels])
        return self.objective.denoise(net, x, sigmas)


def sample_ar(model: DiffusionAR1d, variables, x: jax.Array,
              key: jax.Array, *, start: Optional[jax.Array] = None,
              **kwargs) -> jax.Array:
    """Sequential chunked sampling (reference `model.py:252-294`).  ``x`` is
    noise (b, T, C), or undersampled audio when upsample_factor > 0."""
    noise = x
    upsampled = None
    if model.upsample_factor > 0:
        upsampled = upsample(x, model.upsample_factor)
        key, k = jax.random.split(key)
        noise = jax.random.normal(k, upsampled.shape, upsampled.dtype)
    b, t, c = noise.shape
    cl = model.chunk_length
    num_chunks = t // cl
    assert t % cl == 0, "noise length must be divisible by chunk_length"

    chunk_prev = (start[:, -cl:] if start is not None
                  else jnp.zeros((b, cl, c), noise.dtype))
    chunks: List[jax.Array] = []
    for i in range(num_chunks):
        noise_curr = noise[:, cl * i: cl * (i + 1)]
        if model.upsample_factor > 0:
            channels = jnp.concatenate(
                [chunk_prev, upsampled[:, cl * i: cl * (i + 1)]], axis=-1)
        else:
            channels = chunk_prev
        key, k = jax.random.split(key)
        chunk_curr = sample_model1d(model, variables, noise_curr, k,
                                    method=DiffusionAR1d.denoise_chunk,
                                    channels=channels, **kwargs)
        chunks.append(chunk_curr)
        chunk_prev = chunk_curr
    return jnp.concatenate(chunks, axis=1)


# -------------------------------------------------- audio presets ----------

def get_default_model_kwargs():
    """reference `model.py:302-315`."""
    return dict(
        channels=128, patch_size=16,
        multipliers=(1, 2, 4, 4, 4, 4, 4), factors=(4, 4, 4, 2, 2, 2),
        num_blocks=(2, 2, 2, 2, 2, 2), attentions=(0, 0, 0, 1, 1, 1, 1),
        attention_heads=8, attention_features=64, attention_multiplier=2,
        diffusion_type="v",
        diffusion_sigma_distribution=UniformDistribution(),
    )


def get_default_sampling_kwargs():
    """reference `model.py:317-320`."""
    return dict(schedule="linear", sampler="v", clamp=True)


def AudioDiffusionModel(**kwargs) -> Model1d:
    return Model1d(**{**get_default_model_kwargs(), **kwargs})


def AudioDiffusionUpsampler(in_channels: int, **kwargs) -> DiffusionUpsampler1d:
    defaults = dict(get_default_model_kwargs(), in_channels=in_channels,
                    context_channels=(in_channels,))
    return DiffusionUpsampler1d(**{**defaults, **kwargs})


def AudioDiffusionAE(in_channels: int, **kwargs) -> DiffusionAE1d:
    defaults = dict(
        get_default_model_kwargs(), in_channels=in_channels,
        encoder_channels=16, encoder_patch_size=16,
        encoder_multipliers=(2, 2, 4, 4, 4, 4, 4),
        encoder_factors=(4, 4, 4, 2, 2, 2),
        encoder_num_blocks=(2, 2, 2, 2, 2, 2), encoder_out_channels=64,
        encoder_inject_depth=6,
        context_channels=tuple([0] * 6 + [64]))
    return DiffusionAE1d(**{**defaults, **kwargs})


def AudioDiffusionConditional(embedding_features: int,
                              embedding_max_length: int,
                              **kwargs) -> Model1d:
    """reference `model.py:365-392` — CFG preset (embedding_mask_proba 0.1
    at train, embedding_scale 5.0 at sampling are the documented defaults)."""
    defaults = dict(get_default_model_kwargs(), unet_type="cfg",
                    context_embedding_features=embedding_features,
                    context_embedding_max_length=embedding_max_length)
    return Model1d(**{**defaults, **kwargs})


def AudioDiffusionVocoder(in_channels: int, **kwargs) -> DiffusionVocoder1d:
    freq = 1023 // 2 + 1
    defaults = dict(
        in_channels=in_channels * freq,
        context_channels=(in_channels * freq,),
        stft_num_fft=1023, stft_hop_length=256, channels=512,
        multipliers=(3, 2, 1, 1, 1, 1, 1, 1), factors=(1, 2, 2, 2, 2, 2, 2),
        num_blocks=(1, 1, 1, 1, 1, 1, 1), attentions=(0, 0, 0, 0, 1, 1, 1),
        attention_heads=8, attention_features=64, attention_multiplier=2,
        diffusion_type="v",
        diffusion_sigma_distribution=UniformDistribution())
    return DiffusionVocoder1d(**{**defaults, **kwargs})


def AudioDiffusionUpphaser(in_channels: int, **kwargs) -> DiffusionUpphaser1d:
    defaults = dict(get_default_model_kwargs(), in_channels=in_channels,
                    context_channels=(in_channels,), factor=(1,))
    return DiffusionUpphaser1d(**{**defaults, **kwargs})
