"""Property fuzz of the diffusion math (hypothesis): schedules and the
four samplers must stay FINITE and well-ordered across the whole
(sigma_min, sigma_max, rho, num_steps) envelope — not just the notebook
constants.  The round-3 FMA incident (sqrt(a^2-b^2) at a==b lowering to
sqrt of rounding residue — NaN on some hosts) is exactly the class of
bug this sweeps for; these run the REAL sampler code paths with a linear
denoiser in eager mode (no per-example recompiles).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.diffusion.schedules import (
    karras_schedule, linear_schedule, make_schedule)
from moleculediffusiontransformer_tpu.diffusion.samplers import sample

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

# sane-but-wide envelope: sigma_min below fp32 ulp-of-1 territory and
# sigma_max into the hundreds, rho from sharp to flat
_sigma_min = st.floats(min_value=1e-6, max_value=0.5, allow_nan=False)
_sigma_ratio = st.floats(min_value=1.5, max_value=1e4, allow_nan=False)
_rho = st.floats(min_value=0.5, max_value=9.0, allow_nan=False)
_steps = st.integers(min_value=2, max_value=12)


@settings(max_examples=60, deadline=None)
@given(_sigma_min, _sigma_ratio, _rho, _steps)
def test_karras_schedule_finite_monotone(sigma_min, ratio, rho, n):
    s = karras_schedule(n, sigma_min, sigma_min * ratio, rho)
    assert s.shape == (n + 1,)
    assert np.all(np.isfinite(s))
    assert np.all(np.diff(s) <= 0), "sigmas must be non-increasing"
    assert s[0] == pytest.approx(sigma_min * ratio, rel=2e-4)
    assert s[-1] == 0.0


@settings(max_examples=20, deadline=None)
@given(_steps)
def test_linear_schedule_properties(n):
    s = linear_schedule(n)
    assert s.shape == (n,) and s[0] == 1.0
    assert np.all(np.diff(s) < 0) and np.all(s > 0)


# a contractive linear "denoiser": x_hat = x / (1 + sigma) — well-behaved
# for any sigma>=0, so any non-finite sampler output is the sampler's own
# arithmetic (ancestral splits, sigma ratios, log-space steps) blowing up.
def _denoise(x, sigmas):
    return x / (1.0 + jnp.reshape(sigmas, (-1,) + (1,) * (x.ndim - 1)))


@settings(max_examples=40, deadline=None)
@given(st.sampled_from(["adpm2", "aeuler", "karras", "v"]),
       st.sampled_from(["linear", "karras"]),
       _sigma_min, _sigma_ratio, _rho, _steps, st.booleans())
def test_samplers_finite_over_envelope(sampler, schedule, sigma_min, ratio,
                                       rho, n, clamp):
    sigmas = jnp.asarray(make_schedule(schedule, n, sigma_min=sigma_min,
                                       sigma_max=sigma_min * ratio, rho=rho))
    noise = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 3)).astype(np.float32))
    with jax.disable_jit():
        out = sample(_denoise, noise, sigmas, jax.random.PRNGKey(1), n,
                     sampler=sampler, clamp=clamp)
    assert out.shape == noise.shape
    assert bool(jnp.all(jnp.isfinite(out))), (
        f"{sampler}/{schedule} non-finite at sigma_min={sigma_min} "
        f"ratio={ratio} rho={rho} n={n}")
    if clamp:
        assert float(jnp.max(jnp.abs(out))) <= 1.0


@settings(max_examples=40, deadline=None)
@given(st.sampled_from(["v", "k", "vk"]),
       st.lists(st.floats(min_value=1e-4, max_value=1e3, allow_nan=False),
                min_size=2, max_size=2),
       st.floats(min_value=0.01, max_value=10.0, allow_nan=False))
def test_objective_loss_and_denoise_finite(alias, sigma_vals, sigma_data):
    """V/K/VK losses and denoise must stay finite across extreme sigmas
    (K's loss weight ~ 1/sigma^2 and VK's trig reparameterization are the
    risk spots)."""
    from moleculediffusiontransformer_tpu.diffusion.objectives import (
        make_objective)
    obj = make_objective(alias, sigma_data=sigma_data)
    net = lambda xn, t: xn * 0.9
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 8, 3)).astype(np.float32))
    sigmas = jnp.asarray(sigma_vals, jnp.float32)
    noise = jnp.asarray(
        np.random.default_rng(2).normal(size=x.shape).astype(np.float32))
    with jax.disable_jit():
        loss = obj.loss(net, x, sigmas, noise)
        den = obj.denoise(net, x, sigmas)
    assert np.isfinite(float(loss)), (alias, sigma_vals, sigma_data)
    assert bool(jnp.all(jnp.isfinite(den)))


@settings(max_examples=20, deadline=None)
@given(st.sampled_from(["lognormal", "uniform", "vk"]),
       st.integers(min_value=1, max_value=16))
def test_sigma_distributions_finite_positive_shape(name, n):
    from moleculediffusiontransformer_tpu.diffusion.distributions import (
        make_distribution)
    dist = make_distribution(name)
    s = dist(jax.random.PRNGKey(3), n)
    assert s.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(s)))
    if name != "vk":   # vk mirrors the reference's randn-CDF quirk (signed)
        assert bool(jnp.all(s >= 0))


@settings(max_examples=20, deadline=None)
@given(_sigma_min, _sigma_ratio, _steps)
def test_adpm2_deterministic_given_key(sigma_min, ratio, n):
    """Same key + schedule => identical trajectory (all sampler randomness
    is keyed, never host-global)."""
    sigmas = jnp.asarray(karras_schedule(n, sigma_min, sigma_min * ratio))
    noise = jnp.ones((1, 8, 2), jnp.float32)
    with jax.disable_jit():
        a = sample(_denoise, noise, sigmas, jax.random.PRNGKey(7), n)
        b = sample(_denoise, noise, sigmas, jax.random.PRNGKey(7), n)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
