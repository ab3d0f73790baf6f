"""Diffusion samplers as jit-compiled ``lax.scan`` loops.

TPU-native re-design of reference `diffusion.py:348-549`: where the reference
runs Python loops with tqdm over individual denoise calls (host round-trip
per step), every sampler here is a single ``lax.scan`` over a precomputed
sigma schedule — one XLA program, zero host synchronization until the final
result.  Randomness is explicit: one key per call, folded per step.

``denoise`` is a closure ``denoise(x, sigmas_batch) -> x0_hat`` with sigmas
shaped ``(batch,)`` (conditioning and CFG live inside the closure, see
models/).  ADPM2 with ``rho=1`` is the production sampler for all QM models
(reference `generative.py:857-860`).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def _sqrt_sq_diff(a: jax.Array, b: jax.Array) -> jax.Array:
    """sqrt(a**2 - b**2) for a >= b >= 0, robust to FMA contraction.

    XLA may lower ``a*a - b*b`` as ``fma(a, a, -(b*b))``, whose result for
    a == b is the (sign-indeterminate) rounding residual of b*b rather than
    exactly 0 — ``sqrt`` then returns NaN or ~sqrt(ulp) garbage.  Hosts
    differ (this bit only after a machine change).  The factored form is
    exact at a == b for any contraction, and the clamp guards the remaining
    rounding range.  Equal to the naive formula to 1 ulp everywhere else.
    """
    return jnp.sqrt(jnp.maximum((a - b) * (a + b), 0.0))


def _batched(denoise: DenoiseFn, x: jax.Array, sigma: jax.Array) -> jax.Array:
    """Broadcast a scalar step sigma to a (batch,) vector (the reference's
    ``to_batch``, `diffusion.py:91-102`)."""
    return denoise(x, jnp.full((x.shape[0],), sigma, dtype=x.dtype))


def _step_pairs(sigmas: jax.Array, num_steps: int):
    """(sigma_i, sigma_{i+1}) pairs for i in [0, num_steps-2] — the loop
    bounds of every reference sampler (`diffusion.py:522` etc.)."""
    sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
    return sigmas[: num_steps - 1], sigmas[1:num_steps]


# ---------------------------------------------------------------- ADPM2 ----

def adpm2_sigmas(sigma: jax.Array, sigma_next: jax.Array, rho: float = 1.0):
    """Ancestral DPM-2 sigma decomposition (reference `diffusion.py:495-500`)."""
    sigma_up = jnp.sqrt(sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                        / sigma ** 2)
    sigma_down = _sqrt_sq_diff(sigma_next, sigma_up)
    sigma_mid = ((sigma ** (1 / rho) + sigma_down ** (1 / rho)) / 2) ** rho
    return sigma_up, sigma_down, sigma_mid


def adpm2_step(denoise: DenoiseFn, x: jax.Array, sigma: jax.Array,
               sigma_next: jax.Array, key: jax.Array,
               rho: float = 1.0) -> jax.Array:
    """One ancestral DPM-2 midpoint step — two denoise evaluations
    (reference `diffusion.py:502-515`)."""
    sigma_up, sigma_down, sigma_mid = adpm2_sigmas(sigma, sigma_next, rho)
    d = (x - _batched(denoise, x, sigma)) / sigma
    x_mid = x + d * (sigma_mid - sigma)
    d_mid = (x_mid - _batched(denoise, x_mid, sigma_mid)) / sigma_mid
    x = x + d_mid * (sigma_down - sigma)
    return x + jax.random.normal(key, x.shape, x.dtype) * sigma_up


def sample_adpm2(denoise: DenoiseFn, noise: jax.Array, sigmas: jax.Array,
                 key: jax.Array, num_steps: int, rho: float = 1.0) -> jax.Array:
    sig, sig_next = _step_pairs(sigmas, num_steps)
    keys = jax.random.split(key, num_steps - 1)
    x0 = jnp.asarray(sigmas)[0] * noise

    def body(x, inputs):
        s, sn, k = inputs
        return adpm2_step(denoise, x, s, sn, k, rho), None

    x, _ = jax.lax.scan(body, x0, (sig, sig_next, keys))
    return x


def inpaint_adpm2(denoise: DenoiseFn, source: jax.Array, mask: jax.Array,
                  sigmas: jax.Array, key: jax.Array, num_steps: int,
                  num_resamples: int, rho: float = 1.0) -> jax.Array:
    """RePaint-style masked inpainting (reference `diffusion.py:526-549`).
    ``mask`` is boolean, True = keep from ``source``."""
    mask = mask.astype(bool)
    sig, sig_next = _step_pairs(sigmas, num_steps)
    key, k0 = jax.random.split(key)
    x0 = jnp.asarray(sigmas)[0] * jax.random.normal(k0, source.shape,
                                                    source.dtype)
    keys = jax.random.split(key, num_steps - 1)

    def body(x, inputs):
        s, sn, k = inputs
        k_src, k_steps = jax.random.split(k)
        source_noisy = source + s * jax.random.normal(k_src, source.shape,
                                                      source.dtype)

        def resample(r, x):
            kr = jax.random.fold_in(k_steps, r)
            k_step, k_renoise = jax.random.split(kr)
            x = jnp.where(mask, source_noisy, x)
            x = adpm2_step(denoise, x, s, sn, k_step, rho)
            renoise_sigma = _sqrt_sq_diff(s, sn)
            renoised = x + renoise_sigma * jax.random.normal(
                k_renoise, x.shape, x.dtype)
            return jnp.where(r < num_resamples - 1, renoised, x)

        x = jax.lax.fori_loop(0, num_resamples, resample, x)
        return x, None

    x, _ = jax.lax.scan(body, x0, (sig, sig_next, keys))
    return jnp.where(mask, source, x)


# --------------------------------------------------------------- AEuler ----

def aeuler_sigmas(sigma, sigma_next):
    sigma_up = jnp.sqrt(sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                        / sigma ** 2)
    sigma_down = _sqrt_sq_diff(sigma_next, sigma_up)
    return sigma_up, sigma_down


def sample_aeuler(denoise: DenoiseFn, noise: jax.Array, sigmas: jax.Array,
                  key: jax.Array, num_steps: int) -> jax.Array:
    """Ancestral Euler sampler (reference `diffusion.py:456-483`)."""
    sig, sig_next = _step_pairs(sigmas, num_steps)
    keys = jax.random.split(key, num_steps - 1)
    x0 = jnp.asarray(sigmas)[0] * noise

    def body(x, inputs):
        s, sn, k = inputs
        sigma_up, sigma_down = aeuler_sigmas(s, sn)
        d = (x - _batched(denoise, x, s)) / s
        x = x + d * (sigma_down - s)
        x = x + jax.random.normal(k, x.shape, x.dtype) * sigma_up
        return x, None

    x, _ = jax.lax.scan(body, x0, (sig, sig_next, keys))
    return x


# --------------------------------------------------------------- Karras ----

def sample_karras(denoise: DenoiseFn, noise: jax.Array, sigmas: jax.Array,
                  key: jax.Array, num_steps: int, *, s_tmin: float = 0.0,
                  s_tmax: float = float("inf"), s_churn: float = 0.0,
                  s_noise: float = 1.0) -> jax.Array:
    """Karras et al. algorithm 2 with churn (reference `diffusion.py:399-453`).

    Intentional deviation (recorded): the reference's second-order correction
    uses ``0.5 * (sigma - sigma_hat)`` (`diffusion.py:434`), which makes the
    zero-churn sampler a no-op; we implement the paper's
    ``0.5 * (sigma_next - sigma_hat)``.  This sampler is not used by any QM
    model (ADPM2 is production).
    """
    full = jnp.asarray(sigmas, dtype=jnp.float32)
    gammas = jnp.where((full >= s_tmin) & (full <= s_tmax),
                       min(s_churn / num_steps, math.sqrt(2) - 1), 0.0)
    sig, sig_next = _step_pairs(full, num_steps)
    keys = jax.random.split(key, num_steps - 1)
    x0 = full[0] * noise

    def body(x, inputs):
        s, sn, gamma, k = inputs
        sigma_hat = s + gamma * s
        epsilon = s_noise * jax.random.normal(k, x.shape, x.dtype)
        x_hat = x + _sqrt_sq_diff(sigma_hat, s) * epsilon
        d = (x_hat - _batched(denoise, x_hat, sigma_hat)) / sigma_hat
        x_euler = x_hat + (sn - sigma_hat) * d
        # second-order correction, skipped when sigma_next == 0
        sn_safe = jnp.where(sn == 0, 1.0, sn)
        d_prime = (x_euler - _batched(denoise, x_euler, sn_safe)) / sn_safe
        x_2nd = x_hat + 0.5 * (sn - sigma_hat) * (d + d_prime)
        return jnp.where(sn == 0, x_euler, x_2nd), None

    x, _ = jax.lax.scan(body, x0, (sig, sig_next, gammas[:num_steps - 1],
                                   keys))
    return x


# -------------------------------------------------------------------- V ----

def sample_v(denoise: DenoiseFn, noise: jax.Array, sigmas: jax.Array,
             key: jax.Array, num_steps: int) -> jax.Array:
    """DDIM-like v-sampler (reference `diffusion.py:369-396`).  Faithfully
    returns the last ``x_pred`` (the reference's ``is_last`` branch never
    fires because the loop runs to num_steps-2)."""
    del key  # deterministic
    sig, sig_next = _step_pairs(sigmas, num_steps)
    x0 = jnp.asarray(sigmas)[0] * noise

    def alpha_beta(sigma):
        angle = sigma * math.pi / 2
        return jnp.cos(angle), jnp.sin(angle)

    def body(x, inputs):
        s, sn = inputs
        alpha, beta = alpha_beta(s)
        x_denoised = _batched(denoise, x, s)
        x_pred = x * alpha - x_denoised * beta
        x_eps = x * beta + x_denoised * alpha
        alpha_n, beta_n = alpha_beta(sn)
        x = x_pred * alpha_n + x_eps * beta_n
        return x, x_pred

    _, preds = jax.lax.scan(body, x0, (sig, sig_next))
    return preds[-1]


_SAMPLERS = {
    "adpm2": sample_adpm2,
    "aeuler": sample_aeuler,
    "karras": sample_karras,
    "v": sample_v,
}

# Sampler/objective compatibility (reference `diffusion.py:350,371,402,458,489`)
SAMPLER_COMPAT = {
    "adpm2": ("k", "vk"),
    "aeuler": ("k", "vk"),
    "karras": ("k", "vk"),
    "v": ("v",),
}


def sample(denoise: DenoiseFn, noise: jax.Array, sigmas: jax.Array,
           key: jax.Array, num_steps: int, *, sampler: str = "adpm2",
           clamp: bool = True, objective_alias: Optional[str] = None,
           **sampler_kwargs) -> jax.Array:
    """DiffusionSampler equivalent (reference `diffusion.py:554-591`):
    run the chosen sampler over the schedule, optionally clamp to [-1, 1]."""
    if objective_alias is not None:
        assert objective_alias in SAMPLER_COMPAT[sampler], (
            f"{sampler} incompatible with objective '{objective_alias}'")
    fn = _SAMPLERS[sampler]
    x = fn(denoise, noise, sigmas, key, num_steps, **sampler_kwargs)
    return jnp.clip(x, -1.0, 1.0) if clamp else x


def sequential_mask(like: jax.Array, start: int) -> jax.Array:
    """True before ``start`` along the length axis (channels-last analog of
    reference `diffusion.py:628-632`)."""
    mask = jnp.ones_like(like, dtype=bool)
    return mask.at[:, start:].set(False)


def span_by_span_compose(inpaint_fn, start: jax.Array, num_spans: int,
                         keep_start: bool = False) -> jax.Array:
    """Autoregressive span outpainting via repeated inpaint
    (reference `SpanBySpanComposer`, `diffusion.py:635-664`).
    ``start`` is channels-last (b, L, C); ``inpaint_fn(source, mask)``
    performs one masked inpaint."""
    half = start.shape[1] // 2
    spans = list(jnp.split(start, 2, axis=1)) if keep_start else []
    inpaint = jnp.zeros_like(start)
    inpaint = inpaint.at[:, :half].set(start[:, half:])
    mask = sequential_mask(start, half)
    for _ in range(num_spans):
        span = inpaint_fn(inpaint, mask)
        second_half = span[:, half:]
        inpaint = inpaint.at[:, :half].set(second_half)
        spans.append(second_half)
    return jnp.concatenate(spans, axis=1)
