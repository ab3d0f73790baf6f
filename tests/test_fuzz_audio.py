"""Config-fuzz goldens for the audio-lineage assemblies (reference
`model.py:41-195`): random knob combinations vs same-config torch oracles,
weights imported mechanically — extends the knob-sweep coverage the UNet /
transformer families already have (`test_fuzz_unet.py`) to the assembly
wiring that fixed-config goldens cannot catch (factor -> context channels,
stft geometry -> vocoder channel math, encoder widths -> AE latent inject).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from moleculediffusiontransformer_tpu.diffusion.distributions import (
    UniformDistribution)
from moleculediffusiontransformer_tpu.models import (
    DiffusionAE1d, DiffusionUpsampler1d, DiffusionVocoder1d)
from moleculediffusiontransformer_tpu.nn import state_dict_to_params
from moleculediffusiontransformer_tpu.nn.embeddings import (
    sinusoidal_embedding)


@pytest.fixture(autouse=True)
def _cpu_only():
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def _import(ours, init_args, ref):
    shapes = jax.eval_shape(ours.init, jax.random.PRNGKey(0), *init_args)
    return {"params": state_dict_to_params(ref.state_dict(),
                                           shapes["params"])}


def _t(x):  # torch (b, c, t) -> jax (b, t, c)
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 1))


def _n(o):  # jax (b, t, c) -> numpy (b, c, t)
    return np.transpose(np.asarray(o), (0, 2, 1))


def _unet_kwargs(rng):
    """One random tiny-UNet knob set, as (torch kwargs, jax kwargs)."""
    m2 = int(rng.choice([1, 2]))
    nb = int(rng.choice([1, 2]))
    att = int(rng.choice([0, 1]))
    # the reference's in-UNet Transformer1d group-norms with 32 groups
    # (`modules.py:477`), so attention levels need >= 32 channels
    channels = 32 if att else int(rng.choice([8, 16]))
    kw = dict(channels=channels, resnet_groups=8, diffusion_type="v",
              attention_heads=2, attention_features=8,
              attention_multiplier=2)
    t_kw = dict(kw, multipliers=[1, m2], factors=[2], num_blocks=[nb],
                attentions=[att], attention_use_rel_pos=False)
    j_kw = dict(kw, multipliers=(1, m2), factors=(2,), num_blocks=(nb,),
                attentions=(att,))
    return t_kw, j_kw


@pytest.mark.parametrize("case", range(3))
def test_upsampler_random_config_matches_torch(reference, case):
    rng = np.random.RandomState(70 + case)
    torch.manual_seed(70 + case)
    in_channels = int(rng.choice([2, 4]))
    factor = int(rng.choice([2, 4]))
    factor_features = int(rng.choice([8, 16]))
    patch_size = int(rng.choice([1, 2]))
    t_kw, j_kw = _unet_kwargs(rng)

    ref = reference.model.DiffusionUpsampler1d(
        in_channels=in_channels, factor=factor,
        factor_features=factor_features,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        patch_size=patch_size, **t_kw)
    ref.eval()
    ours = DiffusionUpsampler1d(
        in_channels=in_channels, factor=(factor,),
        factor_features=factor_features, context_channels=(in_channels,),
        context_features=factor_features,
        diffusion_sigma_distribution=UniformDistribution(),
        patch_size=patch_size, **j_kw)

    x = torch.randn(2, in_channels, 16)
    sigmas = torch.tensor(rng.uniform(0.1, 1.5, 2).astype(np.float32))
    channels = reference.utils.upsample(
        reference.utils.downsample(x, factor=factor), factor=factor)
    factors = torch.tensor([factor, factor])
    with torch.no_grad():
        feats_ref = ref.to_features(factors)
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[channels],
            features=feats_ref).numpy()

    feats = sinusoidal_embedding(
        jnp.asarray([float(factor)] * 2), factor_features)
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    xl = _t(x)
    variables = _import(ours, (xl, jax.random.PRNGKey(0)), ref)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), _t(channels),
                   feats, method=DiffusionUpsampler1d.denoise_upsample)
    np.testing.assert_allclose(
        _n(o), r, atol=5e-5,
        err_msg=f"case {case}: in={in_channels} factor={factor} "
                f"ff={factor_features} patch={patch_size} {j_kw}")


@pytest.mark.parametrize("case", range(3))
def test_vocoder_random_config_matches_torch(reference, case):
    rng = np.random.RandomState(80 + case)
    torch.manual_seed(80 + case)
    num_fft = int(rng.choice([15, 31]))
    hop = int(rng.choice([4, 8]))
    t_kw, j_kw = _unet_kwargs(rng)
    spec_channels = (num_fft + 1) // 2

    ref = reference.model.DiffusionVocoder1d(
        in_channels=1, stft_num_fft=num_fft, stft_hop_length=hop,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        patch_size=1, **t_kw)
    ref.eval()
    ours = DiffusionVocoder1d(
        in_channels=spec_channels, stft_num_fft=num_fft, stft_hop_length=hop,
        context_channels=(spec_channels,),
        diffusion_sigma_distribution=UniformDistribution(),
        patch_size=1, **j_kw)

    wave = torch.randn(2, 1, hop * 15 + hop // 2)
    with torch.no_grad():
        mag, _phase = ref.stft.encode(wave)
    b, c, f, t = mag.shape
    assert t % 2 == 0, (num_fft, hop, t)
    mag_flat = mag.reshape(b, c * f, t)
    x = torch.randn(b, c * f, t)
    sigmas = torch.tensor(rng.uniform(0.1, 1.5, 2).astype(np.float32))
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[mag_flat]).numpy()

    xl = _t(x)
    variables = _import(
        ours, (jnp.asarray(mag.numpy()), jnp.asarray(_phase.numpy()),
               jax.random.PRNGKey(0)), ref)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), _t(mag_flat),
                   method=DiffusionVocoder1d.denoise_vocoder)
    np.testing.assert_allclose(
        _n(o), r, atol=5e-5,
        err_msg=f"case {case}: num_fft={num_fft} hop={hop} {j_kw}")


@pytest.mark.parametrize("case", range(2))
def test_diffusion_ae_random_config_matches_torch(reference, case):
    rng = np.random.RandomState(90 + case)
    torch.manual_seed(90 + case)
    # reference bug: modules.Encoder1d uses `to_list`/`prod` without
    # importing them (`modules.py:1503,1505`) — patch the oracle namespace.
    for name in ("to_list", "prod"):
        if not hasattr(reference.modules, name):
            setattr(reference.modules, name, getattr(reference.utils, name))
    in_channels = int(rng.choice([2, 4]))
    enc_channels = int(rng.choice([8, 16]))
    enc_out = int(rng.choice([8, 16]))
    enc_m2 = int(rng.choice([1, 2]))
    t_kw, j_kw = _unet_kwargs(rng)

    enc = reference.modules.Encoder1d(
        in_channels=in_channels, channels=enc_channels,
        multipliers=[1, enc_m2], factors=[2], num_blocks=[1], patch_size=2,
        resnet_groups=8, out_channels=enc_out)
    ref = reference.model.DiffusionAE1d(
        in_channels=in_channels, encoder=enc, encoder_inject_depth=1,
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution(),
        patch_size=2, **t_kw)
    ref.eval()
    ours = DiffusionAE1d(
        in_channels=in_channels, encoder_channels=enc_channels,
        encoder_multipliers=(1, enc_m2), encoder_factors=(2,),
        encoder_num_blocks=(1,), encoder_patch_size=2,
        encoder_out_channels=enc_out, encoder_inject_depth=1,
        context_channels=(0, enc_out),
        diffusion_sigma_distribution=UniformDistribution(),
        patch_size=2, **j_kw)

    x = torch.randn(2, in_channels, 32)
    sigmas = torch.tensor(rng.uniform(0.1, 1.5, 2).astype(np.float32))
    with torch.no_grad():
        latent_ref = ref.encode(x)
        r = ref.diffusion.diffusion.denoise_fn(
            x, sigmas=sigmas, channels_list=[latent_ref]).numpy()

    xl = _t(x)
    variables = _import(ours, (xl, jax.random.PRNGKey(0)), ref)
    latent = ours.apply(variables, xl, method=DiffusionAE1d.encode)
    np.testing.assert_allclose(_n(latent), latent_ref.numpy(), atol=5e-5)
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()), latent,
                   method=DiffusionAE1d.denoise_latent)
    np.testing.assert_allclose(
        _n(o), r, atol=5e-5,
        err_msg=f"case {case}: in={in_channels} enc=({enc_channels},"
                f"{enc_m2},{enc_out}) {j_kw}")
