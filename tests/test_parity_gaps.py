"""Golden parity for the components the round-1 review flagged as untested:
the four audio-lineage assemblies (reference `model.py:41-195`), UNetNCCA1d
(`modules.py:1258-1305`), RelPosBias2d (`transformer.py:77-100`), the full
ADPM2 inpaint trajectory (`diffusion.py:526-549`), and SpanBySpanComposer
(`diffusion.py:635-664`).

Method as elsewhere in the suite: import the torch reference's weights via
``state_dict_to_params`` and compare deterministic forward paths (denoise
with fixed conditioning); randomness is made deterministic either by
zero-scale augmentation or by injecting identical noise into both sides.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from moleculediffusiontransformer_tpu.diffusion import inpaint_adpm2
from moleculediffusiontransformer_tpu.diffusion.distributions import (
    UniformDistribution)
from moleculediffusiontransformer_tpu.diffusion.samplers import (
    adpm2_step, sequential_mask, span_by_span_compose)
from moleculediffusiontransformer_tpu.diffusion.schedules import (
    karras_schedule)
from moleculediffusiontransformer_tpu.models import (
    DiffusionAE1d, DiffusionUpphaser1d, DiffusionUpsampler1d,
    DiffusionVocoder1d)
from moleculediffusiontransformer_tpu.nn import state_dict_to_params
from moleculediffusiontransformer_tpu.nn.embeddings import (
    sinusoidal_embedding)

@pytest.fixture(autouse=True)
def _cpu_only():
    """Pure-numerics golden tests: pin to CPU so they are independent of
    the (tunneled, occasionally busy) TPU backend."""
    with jax.default_device(jax.devices("cpu")[0]):
        yield


TINY = dict(channels=16, multipliers=(1, 2), factors=(2,), num_blocks=(1,),
            attentions=(0,), patch_size=2, resnet_groups=8,
            diffusion_type="v")
TINY_T = dict(channels=16, multipliers=[1, 2], factors=[2], num_blocks=[1],
              attentions=[0], patch_size=2, resnet_groups=8,
              diffusion_type="v")


def _import(ours, init_args, ref, init_kwargs=None):
    shapes = jax.eval_shape(ours.init, jax.random.PRNGKey(0), *init_args,
                            **(init_kwargs or {}))
    return {"params": state_dict_to_params(ref.state_dict(),
                                           shapes["params"])}


def _t(x):  # torch (b, c, t) -> jax (b, t, c)
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 1))


def _n(o):  # jax (b, t, c) -> numpy (b, c, t)
    return np.transpose(np.asarray(o), (0, 2, 1))


# ---------------------------------------------------------- upsampler ------

def test_upsampler_denoise_matches_torch(reference):
    torch.manual_seed(0)
    ref = reference.model.DiffusionUpsampler1d(
        in_channels=4, factor=2, factor_features=8,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        **TINY_T)
    ref.eval()
    ours = DiffusionUpsampler1d(
        in_channels=4, factor=(2,), factor_features=8,
        context_channels=(4,), context_features=8,
        diffusion_sigma_distribution=UniformDistribution(), **TINY)

    x = torch.randn(2, 4, 16)
    sigmas = torch.tensor([0.3, 0.7])
    # conditioning channels exactly as ref.sample builds them
    channels = reference.utils.upsample(
        reference.utils.downsample(x, factor=2), factor=2)
    factors = torch.tensor([2, 2])
    with torch.no_grad():
        feats_ref = ref.to_features(factors)
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[channels],
            features=feats_ref).numpy()

    feats = sinusoidal_embedding(jnp.asarray([2.0, 2.0]), 8)
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    xl = _t(x)
    variables = _import(ours, (xl, jax.random.PRNGKey(0)), ref)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), _t(channels),
                   feats, method=DiffusionUpsampler1d.denoise_upsample)
    np.testing.assert_allclose(_n(o), r, atol=3e-5)


# ----------------------------------------------------- diffusion AE --------

def test_diffusion_ae_encode_and_denoise_match_torch(reference):
    torch.manual_seed(1)
    # reference bug: modules.Encoder1d uses `to_list`/`prod` without
    # importing them (`modules.py:1503,1505` vs the import list at
    # `modules.py:1-14`) — patch the oracle's namespace to construct it.
    for name in ("to_list", "prod"):
        if not hasattr(reference.modules, name):
            setattr(reference.modules, name, getattr(reference.utils, name))
    enc = reference.modules.Encoder1d(
        in_channels=4, channels=8, multipliers=[1, 2], factors=[2],
        num_blocks=[1], patch_size=2, resnet_groups=8, out_channels=8)
    ref = reference.model.DiffusionAE1d(
        in_channels=4, encoder=enc, encoder_inject_depth=1,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        **TINY_T)
    ref.eval()
    ours = DiffusionAE1d(
        in_channels=4, encoder_channels=8, encoder_multipliers=(1, 2),
        encoder_factors=(2,), encoder_num_blocks=(1,), encoder_patch_size=2,
        encoder_out_channels=8, encoder_inject_depth=1,
        context_channels=(0, 8),
        diffusion_sigma_distribution=UniformDistribution(), **TINY)

    x = torch.randn(2, 4, 32)
    sigmas = torch.tensor([0.2, 0.9])
    with torch.no_grad():
        latent_ref = ref.encode(x)
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[latent_ref]).numpy()

    xl = _t(x)
    variables = _import(ours, (xl, jax.random.PRNGKey(0)), ref)
    latent = ours.apply(variables, xl, method=DiffusionAE1d.encode)
    np.testing.assert_allclose(_n(latent), latent_ref.numpy(), atol=3e-5)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), latent,
                   method=DiffusionAE1d.denoise_latent)
    np.testing.assert_allclose(_n(o), r, atol=3e-5)


# ------------------------------------------------------------ vocoder ------

def test_vocoder_denoise_matches_torch(reference):
    torch.manual_seed(2)
    ref = reference.model.DiffusionVocoder1d(
        in_channels=1, stft_num_fft=31, stft_hop_length=8,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        channels=16, multipliers=[1, 2], factors=[2], num_blocks=[1],
        attentions=[0], patch_size=1, resnet_groups=8, diffusion_type="v")
    ref.eval()
    ours = DiffusionVocoder1d(
        in_channels=16, stft_num_fft=31, stft_hop_length=8,
        context_channels=(16,),
        diffusion_sigma_distribution=UniformDistribution(),
        channels=16, multipliers=(1, 2), factors=(2,), num_blocks=(1,),
        attentions=(0,), patch_size=1, resnet_groups=8, diffusion_type="v")

    wave = torch.randn(2, 1, 124)              # -> 16 stft frames
    with torch.no_grad():
        mag, _phase = ref.stft.encode(wave)    # (b, 1, 16, 16)
    b, c, f, t = mag.shape
    mag_flat = mag.reshape(b, c * f, t)
    x = torch.randn(b, c * f, t)               # noisy phase track
    sigmas = torch.tensor([0.5, 1.5])
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[mag_flat]).numpy()

    xl = _t(x)
    variables = _import(
        ours, (jnp.asarray(mag.numpy()),
               jnp.asarray(_phase.numpy()), jax.random.PRNGKey(0)), ref)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), _t(mag_flat),
                   method=DiffusionVocoder1d.denoise_vocoder)
    np.testing.assert_allclose(_n(o), r, atol=3e-5)


# ----------------------------------------------------------- upphaser ------

def test_upphaser_denoise_matches_torch(reference):
    torch.manual_seed(3)
    ref = reference.model.DiffusionUpphaser1d(
        in_channels=4, factor=1, stft_num_fft=15, stft_hop_length=4,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        **TINY_T)
    ref.eval()
    ours = DiffusionUpphaser1d(
        in_channels=4, factor=(1,), stft_num_fft=15, stft_hop_length=4,
        context_channels=(4,),
        diffusion_sigma_distribution=UniformDistribution(), **TINY)

    x = torch.randn(2, 4, 16)
    channels = torch.randn(2, 4, 16)           # rephased+resampled stand-in
    sigmas = torch.tensor([0.4, 1.1])
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[channels]).numpy()

    xl = _t(x)
    variables = _import(ours, (xl, jax.random.PRNGKey(0)), ref)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), _t(channels),
                   None, method=DiffusionUpphaser1d.denoise_upsample)
    np.testing.assert_allclose(_n(o), r, atol=3e-5)


def test_upphaser_random_rephase_preserves_magnitude():
    ours = DiffusionUpphaser1d(
        in_channels=2, factor=(1,), stft_num_fft=15, stft_hop_length=4,
        context_channels=(2,),
        diffusion_sigma_distribution=UniformDistribution(), **TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 2),
                    jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    rephased = ours.apply(variables, x, jax.random.PRNGKey(2),
                          method=DiffusionUpphaser1d.random_rephase)
    assert rephased.shape == x.shape
    from moleculediffusiontransformer_tpu.nn import STFT
    stft = STFT(num_fft=15, hop_length=4, length=64)
    mag_a, _ = stft.encode(x)
    mag_b, _ = stft.encode(rephased)
    # Random per-frame phases break overlap-add coherence, so magnitudes
    # are only preserved in aggregate (the reference has the identical
    # property); check energy scale, not per-bin equality.
    ea, eb = float(jnp.mean(mag_a ** 2)), float(jnp.mean(mag_b ** 2))
    assert 0.2 < eb / ea < 5.0, (ea, eb)
    assert float(jnp.mean(jnp.abs(rephased - x))) > 0.1  # actually rephased
    # deterministic per key
    again = ours.apply(variables, x, jax.random.PRNGKey(2),
                       method=DiffusionUpphaser1d.random_rephase)
    np.testing.assert_allclose(np.asarray(again), np.asarray(rephased))


# ---------------------------------------------------------- UNetNCCA1d -----

def test_unet_ncca_matches_torch(reference):
    torch.manual_seed(4)
    from moleculediffusiontransformer_tpu.nn.unet import UNetNCCA1d
    ref = reference.modules.UNetNCCA1d(
        context_features=8, in_channels=4, channels=16, multipliers=[1, 2],
        factors=[2], num_blocks=[1], attentions=[0], patch_size=2,
        resnet_groups=8, context_channels=[4])
    ref.eval()
    ours = UNetNCCA1d(
        in_channels=4, channels=16, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(0,), patch_size=2, resnet_groups=8,
        context_features=8, context_channels=(4,))

    x = torch.randn(2, 4, 16)
    chan = torch.randn(2, 4, 16)
    time = torch.tensor([0.3, 0.8])
    # channels_scale != 0 with augmentation False: deterministic (the noise
    # mix is gated by augmentation) but the scale embedding is ACTIVE —
    # covers the reference's raw-scale embedding quirk (modules.py:1296).
    with torch.no_grad():
        r = ref(x, time, channels_list=[chan], channels_augmentation=False,
                channels_scale=0.4).numpy()

    xl, chl = _t(x), _t(chan)
    tj = jnp.asarray(time.numpy())
    rngs = {"params": jax.random.PRNGKey(0), "ncca": jax.random.PRNGKey(1)}
    shapes = jax.eval_shape(
        lambda: ours.init(rngs, xl, tj, channels_list=[chl],
                          channels_scale=0.4))
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}
    o = ours.apply(variables, xl, tj, channels_list=[chl],
                   channels_augmentation=False, channels_scale=0.4,
                   rngs={"ncca": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(_n(o), r, atol=3e-5)


# --------------------------------------------------------- RelPosBias2d ----

def test_relpos_bias_2d_matches_torch(reference_transformer):
    torch.manual_seed(5)
    from moleculediffusiontransformer_tpu.nn.transformer_blocks import (
        RelPosBias2d)
    ref = reference_transformer.RelPosBias2d(size=4, heads=3)
    ours = RelPosBias2d(size=4, heads=3)
    i, j = 16, 17                      # size^2 queries, +1 null key
    qk = torch.zeros(1, 3, i, j)
    with torch.no_grad():
        r = ref(qk).numpy()
    variables = {"params": {"pos_bias": jnp.asarray(
        ref.pos_bias.weight.detach().numpy())}}
    o = ours.apply(variables, i, j)
    assert o.shape == (3, i, j)
    np.testing.assert_allclose(np.asarray(o), r, atol=1e-6)
    # null-key column zero-padded on the left
    assert np.abs(np.asarray(o)[:, :, 0]).max() == 0.0


# ------------------------------------------------- inpaint trajectory ------

class _TorchAffineNet(torch.nn.Module):
    def forward(self, x, t, **kw):
        t = t.reshape(-1, 1, 1)
        return x * torch.tanh(t) + 0.1 * torch.sin(3.0 * t)


def _jax_affine_net(x, t, **kw):
    t = t.reshape(-1, 1, 1)
    return x * jnp.tanh(t) + 0.1 * jnp.sin(3.0 * t)


def test_inpaint_trajectory_matches_torch(reference):
    """Full masked RePaint trajectory (num_resamples=2) with injected
    noise identical on both sides (reference ADPM2Sampler.inpaint,
    `diffusion.py:526-549`)."""
    num_steps, num_resamples = 6, 2
    rng = np.random.RandomState(7)
    shape = (2, 4, 16)
    source = rng.randn(*shape).astype(np.float32)
    mask = np.zeros(shape, bool)
    mask[:, :, :8] = True
    sigmas_np = karras_schedule(num_steps, 1e-3, 9.0, 3.0)

    noises = []

    def fresh():
        noises.append(rng.randn(*shape).astype(np.float32))
        return noises[-1]

    d = reference.diffusion
    kd_ref = d.KDiffusion(net=_TorchAffineNet(),
                          sigma_distribution=d.LogNormalDistribution(-1.2,
                                                                     1.2),
                          sigma_data=0.1)
    sampler = d.ADPM2Sampler(rho=1.0)
    orig = torch.randn_like
    torch.randn_like = lambda t: torch.tensor(fresh())
    try:
        theirs = sampler.inpaint(
            source=torch.tensor(source), mask=torch.tensor(mask),
            fn=kd_ref.denoise_fn, sigmas=torch.tensor(sigmas_np),
            num_steps=num_steps, num_resamples=num_resamples).numpy()
    finally:
        torch.randn_like = orig

    # replay our formulation with the recorded noise sequence
    from moleculediffusiontransformer_tpu.diffusion import KDiffusion
    from moleculediffusiontransformer_tpu.diffusion.samplers import (
        adpm2_sigmas)
    kd = KDiffusion(sigma_data=0.1)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
    it = iter([jnp.asarray(n) for n in noises])
    mj, srcj = jnp.asarray(mask), jnp.asarray(source)
    x = sigmas_np[0] * next(it)
    for i in range(num_steps - 1):
        s = jnp.float32(sigmas_np[i]); sn = jnp.float32(sigmas_np[i + 1])
        source_noisy = srcj + s * next(it)
        for r in range(num_resamples):
            x = jnp.where(mj, source_noisy, x)
            s_up, s_down, s_mid = adpm2_sigmas(s, sn, 1.0)
            d1 = (x - denoise(x, jnp.full((2,), s))) / s
            x_mid = x + d1 * (s_mid - s)
            d_mid = (x_mid - denoise(x_mid, jnp.full((2,), s_mid))) / s_mid
            x = x + d_mid * (s_down - s) + next(it) * s_up
            if r < num_resamples - 1:
                x = x + jnp.sqrt(s ** 2 - sn ** 2) * next(it)
    ours = jnp.where(mj, srcj, x)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-5)


def test_inpaint_adpm2_scan_equals_python_loop():
    """The production `inpaint_adpm2` (lax.scan + fori_loop) must equal an
    eager replay with the same key discipline — pins the scan wiring the
    trajectory test can't see."""
    from moleculediffusiontransformer_tpu.diffusion import KDiffusion
    num_steps, num_resamples = 5, 3
    kd = KDiffusion(sigma_data=0.1)
    denoise = lambda xx, ss: kd.denoise(_jax_affine_net, xx, ss)
    sigmas = jnp.asarray(karras_schedule(num_steps, 1e-3, 9.0, 3.0))
    source = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    mask = sequential_mask(source, 4)
    key = jax.random.PRNGKey(42)

    got = inpaint_adpm2(denoise, source, mask, sigmas, key, num_steps,
                        num_resamples)

    k, k0 = jax.random.split(key)
    x = sigmas[0] * jax.random.normal(k0, source.shape)
    keys = jax.random.split(k, num_steps - 1)
    for i in range(num_steps - 1):
        s, sn = sigmas[i], sigmas[i + 1]
        k_src, k_steps = jax.random.split(keys[i])
        source_noisy = source + s * jax.random.normal(k_src, source.shape)
        for r in range(num_resamples):
            kr = jax.random.fold_in(k_steps, r)
            k_step, k_renoise = jax.random.split(kr)
            x = jnp.where(mask, source_noisy, x)
            x = adpm2_step(denoise, x, s, sn, k_step, 1.0)
            if r < num_resamples - 1:
                x = x + jnp.sqrt(s ** 2 - sn ** 2) * jax.random.normal(
                    k_renoise, x.shape)
    want = jnp.where(mask, source, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------ span-by-span compose -----

def test_span_by_span_compose_matches_torch(reference):
    """Same fake inpainter on both sides: next span = previous span + 1.
    Validates the chaining/masking structure against SpanBySpanComposer."""
    half = 4
    start = np.arange(2 * 3 * 2 * half, dtype=np.float32).reshape(
        2, 3, 2 * half)

    class TorchFakeInpainter(torch.nn.Module):
        def forward(self, inpaint, inpaint_mask):
            first = inpaint[:, :, :half]
            out = torch.cat([first, first + 1.0], dim=-1)
            return torch.where(inpaint_mask, inpaint, out)

    composer = reference.diffusion.SpanBySpanComposer(
        TorchFakeInpainter(), num_spans=3)
    with torch.no_grad():
        theirs = composer(torch.tensor(start), keep_start=True).numpy()

    def fake_inpaint(source, mask):   # channels-last
        first = source[:, :half]
        out = jnp.concatenate([first, first + 1.0], axis=1)
        return jnp.where(mask, source, out)

    ours = span_by_span_compose(fake_inpaint,
                                jnp.asarray(start.transpose(0, 2, 1)),
                                num_spans=3, keep_start=True)
    np.testing.assert_allclose(_n(ours), theirs, atol=0)


# ------------------------------------------------------------ T5Embedder ---

def test_t5_embedder_wrapper_flow():
    """The lazy HF wrapper (reference `modules.py:1329-1359`): verify the
    tokenize -> encode -> jnp conversion flow with a stubbed tokenizer and
    encoder (the real t5-base weights need network access this environment
    doesn't have — the wrapper logic is what's ours to test)."""
    from moleculediffusiontransformer_tpu.nn.text import T5Embedder

    emb = T5Embedder(model="t5-base", max_length=6)

    class FakeTokenizer:
        def __call__(self, texts, truncation, max_length, padding,
                     return_tensors):
            assert truncation and padding == "max_length"
            assert return_tensors == "pt"
            ids = torch.zeros((len(texts), max_length), dtype=torch.long)
            mask = torch.ones_like(ids)
            for i, t in enumerate(texts):
                ids[i, :min(len(t), max_length)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    class FakeEncoder:
        def eval(self):
            return self

        def __call__(self, input_ids, attention_mask):
            b, L = input_ids.shape
            hidden = (input_ids.float()[..., None]
                      + torch.arange(4).float()[None, None, :])
            return {"last_hidden_state": hidden}

    emb._tokenizer = FakeTokenizer()
    emb._transformer = FakeEncoder()
    out = emb(["CCO", "N"])
    assert isinstance(out, jnp.ndarray)
    assert out.shape == (2, 6, 4)
    np.testing.assert_allclose(np.asarray(out)[0, 0], [1, 2, 3, 4])
