"""Stage-9 tests: DSP resampling parity vs torch reference, STFT roundtrip,
autoencoder shapes, Model1d family smoke (loss + sampling), graph analogs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.nn import (STFT, AutoEncoder1d,
                                                 Decoder1d, Encoder1d,
                                                 downsample, resample,
                                                 upsample)
from moleculediffusiontransformer_tpu.models import (
    AnalogDiffusionFull, AnalogDiffusionSparse, DiffusionAR1d, Model1d,
    sample_ar, sample_model1d)
from moleculediffusiontransformer_tpu.diffusion.distributions import (
    UniformDistribution)

TINY_UNET = dict(channels=16, multipliers=(1, 2), factors=(2,),
                 num_blocks=(1,), attentions=(0,), patch_size=2,
                 attention_heads=2, attention_features=8,
                 attention_multiplier=2)


def test_resample_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    x = torch.randn(2, 3, 32)
    xl = jnp.asarray(x.numpy().transpose(0, 2, 1))
    for fi, fo in ((2, 1), (1, 3), (4, 1), (1, 2)):
        ref = reference.utils.resample(x, fi, fo).numpy()
        ours = resample(xl, fi, fo)
        assert np.allclose(np.transpose(ours, (0, 2, 1)), ref, atol=2e-5), \
            (fi, fo)


def test_stft_encode_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    st_t = reference.modules.STFT(num_fft=31, hop_length=8)
    st_o = STFT(num_fft=31, hop_length=8)
    w = torch.randn(2, 1, 64)
    a_t, b_t = st_t.encode(w)
    a_o, b_o = jax.jit(st_o.encode, backend="cpu")(
        jnp.asarray(w.numpy().transpose(0, 2, 1)))
    assert np.allclose(a_t.numpy(), np.asarray(a_o), atol=2e-5)
    # phase only compared where magnitude is non-negligible
    mag = a_t.numpy()
    mask = mag > 1e-4
    dphase = np.abs(b_t.numpy() - np.asarray(b_o))
    dphase = np.minimum(dphase, 2 * np.pi - dphase)
    assert dphase[mask].max() < 1e-3


def test_stft_roundtrip():
    """The reference's own istft crashes on modern torch (stacks real
    tensors where complex is required, `modules.py:1445-1455`) — verify
    ours by exact roundtrip instead (recorded deviation)."""
    st = STFT(num_fft=31, hop_length=8, length=64)
    x = np.random.RandomState(0).randn(2, 64, 2).astype(np.float32)
    a, b = jax.jit(st.encode, backend="cpu")(jnp.asarray(x))
    rec = jax.jit(st.decode, backend="cpu")(a, b)
    assert np.allclose(np.asarray(rec), x, atol=1e-5)
    pair = jax.jit(st.encode1d, backend="cpu")(jnp.asarray(x))
    rec2 = jax.jit(st.decode1d, backend="cpu")(pair)
    assert np.allclose(np.asarray(rec2), x, atol=1e-5)


def test_autoencoder_shapes():
    ae = AutoEncoder1d(in_channels=4, channels=8, multipliers=(1, 2),
                       factors=(2,), num_blocks=(1,), patch_size=2,
                       resnet_groups=4, bottleneck_channels=6)
    x = jnp.ones((2, 16, 4))
    variables = ae.init(jax.random.PRNGKey(0), x)
    y, info = ae.apply(variables, x, with_info=True)
    assert y.shape == x.shape
    assert info["latent"].shape == (2, 4, 6)      # /patch2 /factor2
    z = ae.apply(variables, x, method=AutoEncoder1d.encode)
    assert z.shape == (2, 4, 6)


def test_model1d_loss_and_sample():
    model = Model1d(in_channels=4, diffusion_type="v",
                    diffusion_sigma_distribution=UniformDistribution(),
                    **TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    key = jax.random.PRNGKey(0)
    variables = model.init(key, x, key)
    loss = model.apply(variables, x, key)
    assert np.isfinite(float(loss))
    noise = jax.random.normal(key, (2, 16, 4))
    out = sample_model1d(model, variables, noise, key, num_steps=4,
                         sampler="v", schedule="linear", clamp=True)
    assert out.shape == (2, 16, 4)
    assert np.all(np.abs(np.asarray(out)) <= 1 + 1e-6)


def test_diffusion_ar1d():
    model = DiffusionAR1d(in_channels=2, chunk_length=8, dropout=0.1,
                          context_channels=(2,), diffusion_type="v",
                          diffusion_sigma_distribution=UniformDistribution(),
                          **TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 2))
    key = jax.random.PRNGKey(0)
    variables = model.init(key, x, key)
    loss = model.apply(variables, x, key)
    assert np.isfinite(float(loss))
    noise = jax.random.normal(key, (2, 16, 2))
    out = sample_ar(model, variables, noise, key, num_steps=3, sampler="v",
                    schedule="linear")
    assert out.shape == (2, 16, 2)


def test_analog_diffusion_sparse_and_full():
    key = jax.random.PRNGKey(0)
    for cls, pred_dim in ((AnalogDiffusionSparse, 3),
                          (AnalogDiffusionFull, 3 + 16)):
        model = cls(max_length=16, channels=16, pred_dim=pred_dim,
                    text_embed_dim=16, embed_dim_position=8,
                    context_embedding_max_length=12, multipliers=(1, 2),
                    factors=(2,), num_blocks=(1,), attentions=(1,),
                    attention_heads=2, attention_features=8, patch_size=1,
                    predict_neighbors=(cls is AnalogDiffusionFull),
                    max_neighbors=4)
        seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
        packed = jax.random.normal(key, (2, 10, 4 + 16))
        variables = model.init(key, seq, packed, key)
        loss = model.apply(variables, seq, packed, key)
        assert np.isfinite(float(loss)), cls.__name__


def test_model1d_denoise_matches_torch(reference):
    """Model1d with the v-objective: our denoise matches the reference's
    diffusion.denoise_fn with imported weights (audio-lineage assembly)."""
    import torch
    torch.manual_seed(0)
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params
    ref = reference.model.Model1d(
        in_channels=4, channels=16, multipliers=[1, 2], factors=[2],
        num_blocks=[1], attentions=[0], patch_size=2, resnet_groups=8,
        diffusion_type="v",
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution())
    ref.eval()
    from moleculediffusiontransformer_tpu.diffusion.distributions import (
        UniformDistribution)
    ours = Model1d(in_channels=4, channels=16, multipliers=(1, 2),
                   factors=(2,), num_blocks=(1,), attentions=(0,),
                   patch_size=2, resnet_groups=8, diffusion_type="v",
                   diffusion_sigma_distribution=UniformDistribution())
    x = torch.randn(2, 4, 16)
    sigmas = torch.tensor([0.3, 0.7])
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(x, sigmas=sigmas).numpy()
    xl = jnp.asarray(x.numpy().transpose(0, 2, 1))
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(ours.init, key, xl, key)
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()),
                   method=Model1d.denoise)
    assert np.allclose(np.transpose(np.asarray(o), (0, 2, 1)), r, atol=3e-5)
