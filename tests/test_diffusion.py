"""Golden-value parity of the diffusion math against the reference PyTorch
implementation (loaded as an oracle via the ``reference`` fixture).

Strategy: drive both implementations with an analytic denoiser (no network)
and identical noise, and require per-step agreement to ~1e-5 (BASELINE north
star)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.diffusion import (
    KDiffusion, VDiffusion, VKDiffusion, adpm2_step, clip, inpaint_adpm2,
    karras_schedule, linear_schedule, sample, sample_adpm2, sample_aeuler,
    sample_karras, sample_v, sequential_mask)

import torch


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def j2n(x):
    return np.asarray(x)


# ------------------------------------------------------------- schedules ---

def test_karras_schedule_matches_reference(reference):
    ref = reference.diffusion.KarrasSchedule(1e-3, 9.0, 3.0)
    for n in (8, 25, 64, 100):
        theirs = ref(n, torch.device("cpu")).numpy()
        ours = karras_schedule(n, 1e-3, 9.0, 3.0)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_linear_schedule_matches_reference(reference):
    ref = reference.diffusion.LinearSchedule()
    for n in (5, 50):
        np.testing.assert_allclose(linear_schedule(n),
                                   ref(n, "cpu").numpy(), rtol=1e-6)


# ------------------------------------------------------------ objectives ---

def _ref_kdiffusion(reference, sigma_data=0.1, net=None):
    d = reference.diffusion
    return d.KDiffusion(
        net=net if net is not None else torch.nn.Identity(),
        sigma_distribution=d.LogNormalDistribution(-1.2, 1.2),
        sigma_data=sigma_data)


def test_k_scale_weights_match(reference):
    kd_ref = _ref_kdiffusion(reference)
    kd = KDiffusion(sigma_data=0.1)
    sigmas = np.array([1e-3, 0.1, 0.5, 1.0, 9.0], dtype=np.float32)
    ref_w = kd_ref.get_scale_weights(torch.tensor(sigmas))
    ours_w = kd.get_scale_weights(jnp.asarray(sigmas))
    for a, b in zip(ours_w, ref_w):
        np.testing.assert_allclose(j2n(a).squeeze(), b.numpy().squeeze(),
                                   rtol=1e-4, atol=1e-5)


class _TorchAffineNet(torch.nn.Module):
    """Analytic stand-in denoiser: x * f(t) + g(t), shared with the jnp side."""
    def forward(self, x, t, **kw):
        t = t.reshape(-1, 1, 1)
        return x * torch.tanh(t) + 0.1 * torch.sin(3.0 * t)


def _jax_affine_net(x, t, **kw):
    t = t.reshape(-1, 1, 1)
    return x * jnp.tanh(t) + 0.1 * jnp.sin(3.0 * t)


def test_k_denoise_matches(reference):
    rng = np.random.RandomState(0)
    x = rng.randn(4, 22, 32).astype(np.float32)  # torch layout (b, c, l)
    sigmas = np.array([0.05, 0.3, 1.0, 4.0], dtype=np.float32)

    kd_ref = _ref_kdiffusion(reference, net=_TorchAffineNet())
    theirs = kd_ref.denoise_fn(torch.tensor(x), sigmas=torch.tensor(sigmas))

    kd = KDiffusion(sigma_data=0.1)
    ours = kd.denoise(_jax_affine_net, jnp.asarray(x), jnp.asarray(sigmas))
    np.testing.assert_allclose(j2n(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_k_loss_matches(reference):
    rng = np.random.RandomState(1)
    x = rng.randn(8, 22, 32).astype(np.float32)
    noise = rng.randn(8, 22, 32).astype(np.float32)
    sigmas = np.abs(rng.randn(8)).astype(np.float32) + 0.05

    kd_ref = _ref_kdiffusion(reference, net=_TorchAffineNet())
    # drive the reference's forward with fixed sigmas by monkeypatching the
    # distribution
    kd_ref.sigma_distribution = lambda num_samples, device: torch.tensor(sigmas)
    theirs = kd_ref(torch.tensor(x), noise=torch.tensor(noise)).item()

    kd = KDiffusion(sigma_data=0.1)
    ours = float(kd.loss(_jax_affine_net, jnp.asarray(x), jnp.asarray(sigmas),
                         jnp.asarray(noise)))
    # loss_weight ~ sigma^-2 amplifies fp32 noise; compare relatively
    assert abs(ours - theirs) < 1e-4 * max(1.0, abs(theirs))


def test_v_loss_matches(reference):
    rng = np.random.RandomState(2)
    x = rng.randn(4, 3, 16).astype(np.float32)
    noise = rng.randn(4, 3, 16).astype(np.float32)
    sigmas = rng.rand(4).astype(np.float32)

    vd_ref = reference.diffusion.VDiffusion(
        net=_TorchAffineNet(),
        sigma_distribution=lambda num_samples, device: torch.tensor(sigmas))
    theirs = vd_ref(torch.tensor(x), noise=torch.tensor(noise)).item()

    ours = float(VDiffusion().loss(_jax_affine_net, jnp.asarray(x),
                                   jnp.asarray(sigmas), jnp.asarray(noise)))
    assert abs(ours - theirs) < 1e-4 * max(1.0, abs(theirs))


def test_vk_denoise_matches(reference):
    rng = np.random.RandomState(3)
    x = rng.randn(4, 3, 16).astype(np.float32)
    sigmas = np.abs(rng.randn(4)).astype(np.float32) + 0.1

    vk_ref = reference.diffusion.VKDiffusion(
        net=_TorchAffineNet(), sigma_distribution=None)
    theirs = vk_ref.denoise_fn(torch.tensor(x), sigmas=torch.tensor(sigmas))
    ours = VKDiffusion().denoise(_jax_affine_net, jnp.asarray(x),
                                 jnp.asarray(sigmas))
    np.testing.assert_allclose(j2n(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_dynamic_threshold(reference):
    rng = np.random.RandomState(4)
    x = rng.randn(4, 5, 7).astype(np.float32) * 3
    theirs = reference.diffusion.clip(torch.tensor(x), 0.9).numpy()
    ours = j2n(clip(jnp.asarray(x), 0.9))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- samplers ---

def _run_ref_sampler(reference, sampler, x_np, sigmas_np, num_steps,
                     noises_per_step):
    """Run a reference sampler while feeding deterministic 'randn' draws."""
    import refmd.diffusion as d  # noqa

    calls = {"i": 0}
    orig = torch.randn_like

    def fake_randn_like(t):
        out = torch.tensor(noises_per_step[calls["i"]])
        calls["i"] += 1
        return out

    torch.randn_like = fake_randn_like
    try:
        kd = _ref_kdiffusion(reference, net=_TorchAffineNet())
        fn = kd.denoise_fn
        out = sampler(torch.tensor(x_np), fn=fn,
                      sigmas=torch.tensor(sigmas_np), num_steps=num_steps)
    finally:
        torch.randn_like = orig
    return out.numpy(), calls["i"]


def test_adpm2_step_matches_reference(reference):
    """One ADPM2 step with identical injected noise must match to 1e-5."""
    rng = np.random.RandomState(5)
    x = rng.randn(2, 22, 32).astype(np.float32)
    noise = rng.randn(2, 22, 32).astype(np.float32)
    sigma, sigma_next = 2.0, 1.2

    ref_sampler = reference.diffusion.ADPM2Sampler(rho=1.0)
    kd_ref = _ref_kdiffusion(reference, net=_TorchAffineNet())
    orig = torch.randn_like
    torch.randn_like = lambda t: torch.tensor(noise)
    try:
        theirs = ref_sampler.step(torch.tensor(x), fn=kd_ref.denoise_fn,
                                  sigma=sigma, sigma_next=sigma_next).numpy()
    finally:
        torch.randn_like = orig

    kd = KDiffusion(sigma_data=0.1)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)

    # reproduce with injected noise: replicate step formula manually
    from moleculediffusiontransformer_tpu.diffusion.samplers import adpm2_sigmas
    s, sn = jnp.float32(sigma), jnp.float32(sigma_next)
    s_up, s_down, s_mid = adpm2_sigmas(s, sn, 1.0)
    xj = jnp.asarray(x)
    d1 = (xj - denoise(xj, jnp.full((2,), s))) / s
    x_mid = xj + d1 * (s_mid - s)
    d_mid = (x_mid - denoise(x_mid, jnp.full((2,), s_mid))) / s_mid
    ours = xj + d_mid * (s_down - s) + jnp.asarray(noise) * s_up
    np.testing.assert_allclose(j2n(ours), theirs, rtol=1e-4, atol=1e-5)


def test_adpm2_full_loop_matches_reference(reference):
    """Whole 8-step ADPM2 trajectory with injected per-step noise."""
    num_steps = 8
    rng = np.random.RandomState(6)
    start_noise = rng.randn(2, 4, 16).astype(np.float32)
    sigmas_np = karras_schedule(num_steps, 1e-3, 9.0, 3.0)
    step_noises = [rng.randn(2, 4, 16).astype(np.float32)
                   for _ in range(num_steps - 1)]

    theirs, n_calls = _run_ref_sampler(
        reference, reference.diffusion.ADPM2Sampler(rho=1.0), start_noise,
        sigmas_np, num_steps, step_noises)
    assert n_calls == num_steps - 1

    # our scan, with the same injected noises via a stub random source:
    kd = KDiffusion(sigma_data=0.1)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
    x = jnp.asarray(sigmas_np[0] * start_noise)
    from moleculediffusiontransformer_tpu.diffusion.samplers import adpm2_sigmas
    for i in range(num_steps - 1):
        s = jnp.float32(sigmas_np[i]); sn = jnp.float32(sigmas_np[i + 1])
        s_up, s_down, s_mid = adpm2_sigmas(s, sn, 1.0)
        d1 = (x - denoise(x, jnp.full((2,), s))) / s
        x_mid = x + d1 * (s_mid - s)
        d_mid = (x_mid - denoise(x_mid, jnp.full((2,), s_mid))) / s_mid
        x = x + d_mid * (s_down - s) + jnp.asarray(step_noises[i]) * s_up
    np.testing.assert_allclose(j2n(x), theirs, rtol=1e-4, atol=1e-5)


def test_sample_adpm2_scan_equals_python_loop():
    """The lax.scan path must equal an eager python-loop re-computation with
    the same keys (validates the scan/keys wiring)."""
    num_steps = 10
    kd = KDiffusion(sigma_data=0.1)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
    sigmas = jnp.asarray(karras_schedule(num_steps))
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6))

    got = sample_adpm2(denoise, noise, sigmas, key, num_steps)

    keys = jax.random.split(key, num_steps - 1)
    x = sigmas[0] * noise
    for i in range(num_steps - 1):
        x = adpm2_step(denoise, x, sigmas[i], sigmas[i + 1], keys[i], 1.0)
    np.testing.assert_allclose(j2n(got), j2n(x), rtol=1e-4, atol=1e-5)


def test_samplers_jit_and_shapes():
    num_steps = 6
    kd = KDiffusion(sigma_data=0.5)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
    sigmas = jnp.asarray(karras_schedule(num_steps))
    lin = jnp.asarray(linear_schedule(num_steps))
    noise = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 4))
    key = jax.random.PRNGKey(3)

    for name, sig in (("adpm2", sigmas), ("aeuler", sigmas),
                      ("karras", sigmas), ("v", lin)):
        out = jax.jit(lambda n, k, s=sig, nm=name: sample(
            denoise, n, s, k, num_steps, sampler=nm, clamp=True))(noise, key)
        assert out.shape == noise.shape
        assert np.isfinite(j2n(out)).all()
        assert j2n(out).max() <= 1.0 and j2n(out).min() >= -1.0


def test_karras_sampler_actually_denoises():
    """Regression guard for the recorded deviation: with churn=0 our Karras
    sampler must move the sample toward the denoiser's fixed point (the
    reference's version is a no-op)."""
    num_steps = 20
    kd = KDiffusion(sigma_data=0.5)
    # denoiser that always predicts zeros => final sample ~ 0
    net = lambda x, t, **kw: jnp.zeros_like(x)
    denoise = lambda xx, ss: kd.denoise(net, xx, ss)
    sigmas = jnp.asarray(karras_schedule(num_steps, 1e-3, 9.0, 3.0))
    noise = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 4))
    out = sample_karras(denoise, noise, sigmas, jax.random.PRNGKey(5),
                        num_steps)
    # The analytic ODE solution contracts x from sigma_max*noise to
    # ~sqrt(sigma_min^2+sd^2)*noise; the broken reference formula would
    # return sigma_max*noise unchanged.
    start_mag = float(jnp.abs(sigmas[0] * noise).mean())
    out_mag = float(jnp.abs(out).mean())
    assert out_mag < 0.1 * start_mag
    expected = 0.5 * float(jnp.abs(noise).mean())   # sd * |noise|
    assert abs(out_mag - expected) / expected < 0.3


def test_inpaint_keeps_masked_region():
    num_steps = 8
    kd = KDiffusion(sigma_data=0.5)
    net = lambda x, t, **kw: jnp.zeros_like(x)
    denoise = lambda xx, ss: kd.denoise(net, xx, ss)
    sigmas = jnp.asarray(karras_schedule(num_steps))
    source = jnp.ones((2, 8, 4)) * 0.5
    mask = sequential_mask(source, 4)      # keep first half
    out = inpaint_adpm2(denoise, source, mask, sigmas, jax.random.PRNGKey(6),
                        num_steps, num_resamples=2)
    np.testing.assert_allclose(j2n(out[:, :4]), j2n(source[:, :4]))
    assert not np.allclose(j2n(out[:, 4:]), j2n(source[:, 4:]))


def test_v_full_loop_matches_reference(reference):
    """Whole V-sampler trajectories (deterministic — no noise injection
    needed) vs the torch VSampler across several step counts.  Pins the
    alpha/beta rotation flow incl. the reference's quirk of returning the
    last x_pred (its dead ``is_last`` branch, `diffusion.py:385`)."""
    for num_steps in (3, 8, 17):
        rng = np.random.RandomState(20 + num_steps)
        start_noise = rng.randn(2, 4, 16).astype(np.float32)
        sigmas_np = np.asarray(linear_schedule(num_steps), np.float32)

        vd_ref = reference.diffusion.VDiffusion(
            net=_TorchAffineNet(), sigma_distribution=None)
        theirs = reference.diffusion.VSampler()(
            torch.tensor(start_noise), fn=vd_ref.denoise_fn,
            sigmas=torch.tensor(sigmas_np), num_steps=num_steps).numpy()

        from moleculediffusiontransformer_tpu.diffusion import VDiffusion
        vd = VDiffusion()
        denoise = lambda xx, ss: vd.denoise(_jax_affine_net, xx, ss)
        ours = sample_v(denoise, jnp.asarray(start_noise),
                        jnp.asarray(sigmas_np), jax.random.PRNGKey(0),
                        num_steps)
        np.testing.assert_allclose(j2n(ours), theirs, rtol=1e-4, atol=1e-5,
                                   err_msg=f"num_steps={num_steps}")


def _scan_step_noises(key, num_steps, shape):
    """The exact per-step draws our scan samplers make: they split the call
    key into num_steps-1 step keys and draw one normal(shape) from each
    (samplers.py body) — precompute those so the torch oracle can be fed
    bit-identical noise."""
    keys = jax.random.split(key, num_steps - 1)
    return [np.asarray(jax.random.normal(k, shape, jnp.float32))
            for k in keys]


def test_aeuler_full_loop_schedule_sweep_matches_reference(reference):
    """Whole AEuler trajectories from the REAL ``sample_aeuler`` scan vs the
    torch AEulerSampler, across random (num_steps, sigma range) schedules,
    with the torch side fed the scan's own per-step noise draws."""
    rng_cfg = np.random.RandomState(17)
    for case in range(4):
        num_steps = int(rng_cfg.choice([4, 9, 16]))
        s_min = float(rng_cfg.choice([1e-3, 1e-2]))
        s_max = float(rng_cfg.choice([3.0, 9.0]))
        rng = np.random.RandomState(200 + case)
        start_noise = rng.randn(2, 4, 16).astype(np.float32)
        sigmas_np = karras_schedule(num_steps, s_min, s_max, 3.0)
        key = jax.random.PRNGKey(300 + case)
        step_noises = _scan_step_noises(key, num_steps, start_noise.shape)

        theirs, n_calls = _run_ref_sampler(
            reference, reference.diffusion.AEulerSampler(), start_noise,
            sigmas_np, num_steps, step_noises)
        assert n_calls == num_steps - 1

        kd = KDiffusion(sigma_data=0.1)
        denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
        ours = sample_aeuler(denoise, jnp.asarray(start_noise),
                             jnp.asarray(sigmas_np), key, num_steps)
        np.testing.assert_allclose(
            j2n(ours), theirs, rtol=1e-4, atol=1e-5,
            err_msg=f"case {case}: steps={num_steps} "
                    f"range=({s_min},{s_max})")


def test_karras_full_loop_matches_paper_corrected_reference(reference):
    """Whole churned-Karras trajectories from the REAL ``sample_karras``
    scan vs the torch KarrasSampler ORACLED WITH THE PAPER'S second-order
    term: the reference's ``0.5 * (sigma - sigma_hat)`` (`diffusion.py:434`)
    makes its zero-churn sampler a no-op — a recorded intentional deviation
    (see samplers.py docstring; `test_karras_sampler_actually_denoises`
    guards the behavioral side).  Patching that ONE factor to the paper's
    ``sigma_next - sigma_hat`` lets everything else — gamma/churn schedule,
    s_tmin/s_tmax gating, noise scaling, Euler + correction flow — be
    golden-pinned against torch with the scan's own noise draws injected."""

    class _PaperKarras(reference.diffusion.KarrasSampler):
        def step(self, x, fn, sigma, sigma_next, gamma):
            import math as m
            sigma_hat = sigma + gamma * sigma
            epsilon = self.s_noise * torch.randn_like(x)
            x_hat = x + m.sqrt(sigma_hat ** 2 - sigma ** 2) * epsilon
            d = (x_hat - fn(x_hat, sigma=sigma_hat)) / sigma_hat
            x_next = x_hat + (sigma_next - sigma_hat) * d
            if sigma_next != 0:
                d_prime = (x_next - fn(x_next, sigma=sigma_next)) / sigma_next
                x_next = x_hat + 0.5 * (sigma_next - sigma_hat) * (d + d_prime)
            return x_next

    rng_cfg = np.random.RandomState(23)
    for case in range(4):
        num_steps = int(rng_cfg.choice([4, 9, 16]))
        s_churn = float(rng_cfg.choice([0.5, 2.0, 10.0]))
        s_noise = float(rng_cfg.choice([0.9, 1.0]))
        s_tmin = float(rng_cfg.choice([0.0, 0.05]))
        s_tmax = float(rng_cfg.choice([2.0, float("inf")]))
        rng = np.random.RandomState(400 + case)
        start_noise = rng.randn(2, 4, 16).astype(np.float32)
        sigmas_np = karras_schedule(num_steps, 1e-3, 9.0, 3.0)
        key = jax.random.PRNGKey(500 + case)
        step_noises = _scan_step_noises(key, num_steps, start_noise.shape)

        theirs, n_calls = _run_ref_sampler(
            reference,
            _PaperKarras(s_tmin=s_tmin, s_tmax=s_tmax, s_churn=s_churn,
                         s_noise=s_noise),
            start_noise, sigmas_np, num_steps, step_noises)
        assert n_calls == num_steps - 1

        kd = KDiffusion(sigma_data=0.1)
        denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
        ours = sample_karras(denoise, jnp.asarray(start_noise),
                             jnp.asarray(sigmas_np), key, num_steps,
                             s_tmin=s_tmin, s_tmax=s_tmax, s_churn=s_churn,
                             s_noise=s_noise)
        np.testing.assert_allclose(
            j2n(ours), theirs, rtol=1e-4, atol=1e-5,
            err_msg=f"case {case}: steps={num_steps} churn={s_churn} "
                    f"noise={s_noise} tmin={s_tmin} tmax={s_tmax}")


def test_adpm2_full_loop_schedule_sweep_matches_reference(reference):
    """Schedule-sweep golden: whole ADPM2 trajectories across random
    (num_steps, rho, sigma range) combinations with injected per-step
    noise — the sigma split (adpm2_sigmas) and the two-stage update must
    match the torch loop at every schedule, not just the fixed 8-step
    rho=1 case above."""
    rng_cfg = np.random.RandomState(13)
    for case in range(4):
        num_steps = int(rng_cfg.choice([4, 12, 20]))
        rho = float(rng_cfg.choice([0.5, 1.0, 2.0]))
        s_min = float(rng_cfg.choice([1e-3, 1e-2]))
        s_max = float(rng_cfg.choice([3.0, 9.0]))
        rng = np.random.RandomState(100 + case)
        start_noise = rng.randn(2, 4, 16).astype(np.float32)
        sigmas_np = karras_schedule(num_steps, s_min, s_max, 3.0)
        step_noises = [rng.randn(2, 4, 16).astype(np.float32)
                       for _ in range(num_steps - 1)]

        theirs, n_calls = _run_ref_sampler(
            reference, reference.diffusion.ADPM2Sampler(rho=rho),
            start_noise, sigmas_np, num_steps, step_noises)
        assert n_calls == num_steps - 1

        from moleculediffusiontransformer_tpu.diffusion.samplers import \
            adpm2_sigmas
        kd = KDiffusion(sigma_data=0.1)
        denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
        x = jnp.asarray(sigmas_np[0] * start_noise)
        for i in range(num_steps - 1):
            s = jnp.float32(sigmas_np[i])
            sn = jnp.float32(sigmas_np[i + 1])
            s_up, s_down, s_mid = adpm2_sigmas(s, sn, rho)
            d1 = (x - denoise(x, jnp.full((2,), s))) / s
            x_mid = x + d1 * (s_mid - s)
            d_mid = (x_mid - denoise(x_mid, jnp.full((2,), s_mid))) / s_mid
            x = x + d_mid * (s_down - s) + jnp.asarray(step_noises[i]) * s_up
        np.testing.assert_allclose(
            j2n(x), theirs, rtol=1e-4, atol=1e-5,
            err_msg=f"case {case}: steps={num_steps} rho={rho} "
                    f"range=({s_min},{s_max})")
