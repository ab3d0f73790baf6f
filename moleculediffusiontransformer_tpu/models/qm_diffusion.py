"""QM9 task-layer diffusion models (reference `generative.py:31-225,718-914`).

``QMDiffusion`` — inverse design: property vector (b, 12) conditions a
diffusion over one-hot SMILES tracks (b, L, vocab).
``QMDiffusionForward`` — forward prediction: tokenized SMILES (b, 64)
conditions a diffusion over a property track (b, L, 1).

Both share the same structure: a conditioning head (Linear(1, d) + GELU +
Fourier position concat), a CFG UNet, and the K-diffusion objective with
LogNormal(-1.2, 1.2) sigmas and sigma_data 0.1.

TPU-native design: sampling is one jitted ``lax.scan`` over the Karras
schedule with batched CFG (the reference runs a Python loop with 4 UNet
passes per ADPM2 step — 2 midpoint evals x 2 CFG passes; here each step is
2 doubled-batch evals inside one XLA program, SURVEY §3.2).

Parameter names ('fc1', 'unet…') mirror the reference so published torch
checkpoints import via ``nn.torch_import.state_dict_to_params``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import QMDiffusionConfig
from ..diffusion.distributions import make_distribution
from ..diffusion.objectives import make_objective
from ..diffusion.samplers import inpaint_adpm2, sample as run_sampler
from ..diffusion.schedules import karras_schedule
from ..nn.embeddings import positional_encoding_1d
from ..nn.primitives import Dense, Dtype, gelu
from ..nn.unet import XUNet1d


class QMDiffusionBase(nn.Module):
    """Shared assembly for forward/inverse QM diffusion models."""
    max_length: int = 1024
    channels: int = 128
    pred_dim: int = 1
    unet_type: str = "cfg"
    pos_emb_fourier: bool = True
    pos_emb_fourier_add: bool = False
    text_embed_dim: int = 1024
    embed_dim_position: int = 64
    context_embedding_max_length: int = 32
    # UNet structure (defaults overridden by the concrete classes)
    patch_size: int = 4
    multipliers: Tuple[int, ...] = (1, 2, 4)
    factors: Tuple[int, ...] = (4, 4)
    num_blocks: Tuple[int, ...] = (3, 3)
    attentions: Tuple[int, ...] = (2, 2)
    attention_heads: int = 8
    attention_features: int = 64
    attention_multiplier: int = 2
    pre_transformer: int = 0
    # diffusion math
    sigma_data: float = 0.1
    sigma_mean: float = -1.2
    sigma_std: float = 1.2
    dynamic_threshold: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def conditioning_features(self) -> int:
        if self.pos_emb_fourier and not self.pos_emb_fourier_add:
            return self.text_embed_dim + self.embed_dim_position
        return self.text_embed_dim

    @property
    def objective(self):
        return make_objective("k", sigma_data=self.sigma_data,
                              dynamic_threshold=self.dynamic_threshold)

    @property
    def sigma_distribution(self):
        return make_distribution("lognormal", mean=self.sigma_mean,
                                 std=self.sigma_std)

    def setup(self):
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)
        kwargs = dict(
            in_channels=self.pred_dim,
            channels=self.channels,
            patch_size=self.patch_size,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            pre_transformer=self.pre_transformer,
            dtype=self.dtype,
        )
        if self.unet_type == "cfg":
            kwargs.update(
                context_embedding_features=self.conditioning_features,
                context_embedding_max_length=self.context_embedding_max_length)
        self.unet = XUNet1d(type=self.unet_type, **kwargs)

    def embed_conditioning(self, sequences: jax.Array) -> jax.Array:
        """Conditioning head (reference `generative.py:812-826`): per-scalar
        Linear(1, d) + GELU, concat (or add) a Fourier position code."""
        x = sequences.astype(jnp.float32)[..., None]       # (b, n, 1)
        x = gelu(self.fc1(x))
        if self.pos_emb_fourier:
            pe = positional_encoding_1d(x.shape[1], self.embed_dim_position,
                                        dtype=x.dtype)
            pe = jnp.broadcast_to(pe[None], (x.shape[0],) + pe.shape)
            x = x + pe if self.pos_emb_fourier_add else jnp.concatenate(
                [x, pe], axis=-1)
        return x

    def __call__(self, sequences: jax.Array, output: jax.Array,
                 key: jax.Array) -> jax.Array:
        """Training loss.  ``sequences`` (b, n) conditioning scalars,
        ``output`` (b, L, pred_dim) channels-last diffusion target.

        Mirrors the reference quirk that QM models train with
        embedding_mask_proba = 0 — no CFG dropout (SURVEY §3.1)."""
        emb = self.embed_conditioning(sequences)

        if self.unet_type == "cfg":
            net = lambda xn, t: self.unet(xn, t, embedding=emb)
        else:
            net = lambda xn, t: self.unet(xn, t)
        return self.objective.loss_from_key(net, output, key,
                                            self.sigma_distribution)

    def denoise(self, x: jax.Array, sigmas: jax.Array,
                embedding: Optional[jax.Array],
                cond_scale: float = 1.0) -> jax.Array:
        """One preconditioned denoise evaluation — the sampler's closure."""
        if self.unet_type == "cfg":
            net = lambda xn, t: self.unet(xn, t, embedding=embedding,
                                          embedding_scale=cond_scale)
        else:
            net = lambda xn, t: self.unet(xn, t)
        return self.objective.denoise(net, x, sigmas)


class QMDiffusion(QMDiffusionBase):
    """Inverse generative model: 12 properties -> one-hot SMILES
    (reference `generative.py:718-914`; notebook preset pred_dim=22,
    channels=128, max_length=32, pre_transformer=2, patch_size=1,
    attentions (4,4) => 90,965,554 params)."""
    patch_size: int = 1
    pre_transformer: int = 2
    attentions: Tuple[int, ...] = (4, 4)


class QMDiffusionForward(QMDiffusionBase):
    """Forward model: tokenized SMILES -> property track
    (reference `generative.py:31-225`; notebook preset pred_dim=1,
    channels=64, max_length=64, patch_size=4, attentions (2,2)
    => 18,322,684 params)."""
    patch_size: int = 4
    pre_transformer: int = 0
    attentions: Tuple[int, ...] = (2, 2)


def from_config(cls, config: QMDiffusionConfig, dtype=jnp.float32):
    """Build a QM model from a :class:`QMDiffusionConfig` preset."""
    return cls(
        max_length=config.max_length, channels=config.channels,
        pred_dim=config.pred_dim, unet_type=config.unet_type,
        pos_emb_fourier=config.pos_emb_fourier,
        pos_emb_fourier_add=config.pos_emb_fourier_add,
        text_embed_dim=config.text_embed_dim,
        embed_dim_position=config.embed_dim_position,
        context_embedding_max_length=config.context_embedding_max_length,
        patch_size=config.patch_size, num_blocks=config.num_blocks,
        attentions=config.attentions, pre_transformer=config.pre_transformer,
        sigma_data=config.diffusion.sigma_data,
        sigma_mean=config.diffusion.sigma_mean,
        sigma_std=config.diffusion.sigma_std,
        dynamic_threshold=config.diffusion.dynamic_threshold,
        dtype=dtype,
    )


@partial(jax.jit, static_argnames=("model", "num_steps", "cond_scale",
                                   "clamp", "sigma_min", "sigma_max", "rho"))
def sample(model: QMDiffusionBase, variables, sequences: jax.Array,
           key: jax.Array, *, num_steps: int = 100, cond_scale: float = 1.0,
           clamp: bool = False, sigma_min: float = 1e-3,
           sigma_max: float = 9.0, rho: float = 3.0) -> jax.Array:
    """ADPM2(rho=1) sampling over a Karras(1e-3, 9.0, rho=3) schedule — the
    production path (reference `generative.py:834-870`).  One jitted scan;
    returns (b, max_length, pred_dim) channels-last."""
    k_noise, k_samp = jax.random.split(key)
    emb = model.apply(variables, sequences,
                      method=QMDiffusionBase.embed_conditioning)
    noise = jax.random.normal(
        k_noise, (sequences.shape[0], model.max_length, model.pred_dim))
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho))

    def denoise(x, s):
        return model.apply(variables, x, s, emb, cond_scale,
                           method=QMDiffusionBase.denoise)

    return run_sampler(denoise, noise, sigmas, k_samp, num_steps,
                       sampler="adpm2", clamp=clamp, objective_alias="k",
                       rho=1.0)


@partial(jax.jit, static_argnames=("model", "num_steps", "num_resamples",
                                   "cond_scale", "sigma_min", "sigma_max",
                                   "rho"))
def inpaint(model: QMDiffusionBase, variables, sequences: jax.Array,
            source: jax.Array, mask: jax.Array, key: jax.Array, *,
            num_steps: int = 100, num_resamples: int = 1,
            cond_scale: float = 7.5, sigma_min: float = 1e-3,
            sigma_max: float = 9.0, rho: float = 3.0) -> jax.Array:
    """RePaint-style masked inpainting (reference `generative.py:871-914`).
    ``source``/``mask`` are (b, L, pred_dim) channels-last; mask True =
    keep from source."""
    emb = model.apply(variables, sequences,
                      method=QMDiffusionBase.embed_conditioning)
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho))

    def denoise(x, s):
        return model.apply(variables, x, s, emb, cond_scale,
                           method=QMDiffusionBase.denoise)

    return inpaint_adpm2(denoise, source, mask, sigmas, key, num_steps,
                         num_resamples, rho=1.0)
