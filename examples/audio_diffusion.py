"""Audio-lineage tour: the archinetai-derived assemblies the reference
exports through `model.py` — Model1d v-diffusion, diffusion upsampler,
diffusion autoencoder, vocoder, upphaser, and chunked AR diffusion
(reference `model.py:1-294`, presets `model.py:296-392`).

Each demo: build on toy shapes, compute the diffusion loss, check it
differentiates, then run the matching sampler and print shapes.  Tiny
configs run on CPU in ~2 min; `--full` uses the reference presets
(2**15-sample waveforms) and wants a TPU — there the L>=2048 attention
levels stream through the flash kernels (`ops/flash_attention.py`), and
the waveform axis can be sharded over a mesh (`parallel/sp.py`,
docs/SCALING.md).

Usage:  python examples/audio_diffusion.py [--full] [--only upsampler]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moleculediffusiontransformer_tpu.diffusion import UniformDistribution

TINY = dict(channels=16, patch_size=2, multipliers=(1, 2), factors=(2,),
            num_blocks=(1,), attentions=(0, 1), attention_heads=2,
            attention_features=8, attention_multiplier=2,
            diffusion_type="v",
            diffusion_sigma_distribution=UniformDistribution(),
            resnet_groups=4)


def banner(name: str) -> None:
    print(f"\n=== {name} " + "=" * max(0, 60 - len(name)))


def check_loss_and_grad(loss_fn, params) -> None:
    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert np.isfinite(float(loss)), "loss is not finite"
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves), "NaN grad"
    print(f"loss = {float(loss):.4f}  (grads finite over "
          f"{len(leaves)} arrays)")


def demo_model(key, full: bool):
    """Unconditional waveform diffusion (reference `model.py:296-314`)."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionModel, Model1d, sample_model1d)
    banner("AudioDiffusionModel (Model1d, v-diffusion)")
    if full:
        model, length = AudioDiffusionModel(in_channels=2), 2 ** 15
    else:
        model, length = Model1d(in_channels=2, **TINY), 256
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, length, 2))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    noise = jax.random.normal(k2, x.shape)
    out = sample_model1d(model, variables, noise, k2, num_steps=4)
    print("sampled:", out.shape)


def demo_upsampler(key, full: bool):
    """2x super-resolution (reference `model.py:41-101, 322-333`)."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionUpsampler, DiffusionUpsampler1d, sample_upsampler)
    banner("AudioDiffusionUpsampler (2x super-resolution)")
    if full:
        model, length = AudioDiffusionUpsampler(in_channels=1,
                                                factor=2), 2 ** 15
    else:
        model, length = DiffusionUpsampler1d(
            in_channels=1, factor=(2,), context_channels=(1,), **TINY), 256
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, length, 1))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    out = sample_upsampler(model, variables, x[:, ::2], k2, num_steps=4)
    print("upsampled:", tuple(x[:, ::2].shape), "->", out.shape)


def demo_autoencoder(key, full: bool):
    """Latent diffusion AE (reference `model.py:104-136, 336-350`)."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionAE, DiffusionAE1d, decode_ae)
    banner("AudioDiffusionAE (diffusion autoencoder)")
    if full:
        model, length, factor = AudioDiffusionAE(in_channels=1), 2 ** 15, 512
    else:
        model, length, factor = DiffusionAE1d(
            in_channels=1, encoder_channels=8, encoder_patch_size=2,
            encoder_multipliers=(1, 2), encoder_factors=(2,),
            encoder_num_blocks=(1,), encoder_out_channels=8,
            encoder_inject_depth=1, context_channels=(0, 8), **TINY), 256, 4
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, length, 1))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    latent = model.apply(variables, x, method=DiffusionAE1d.encode)
    out = decode_ae(model, variables, latent, k2,
                    downsample_factor=factor, num_steps=4)
    print("latent:", latent.shape, "-> decoded:", out.shape)


def demo_vocoder(key, full: bool):
    """Phase reconstruction from STFT magnitude
    (reference `model.py:139-176, 353-362`)."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionVocoder, DiffusionVocoder1d, sample_vocoder)
    from moleculediffusiontransformer_tpu.nn.stft import STFT
    banner("AudioDiffusionVocoder (mag -> phase -> wave)")
    if full:
        model, length = AudioDiffusionVocoder(in_channels=1), 2 ** 15
        num_fft, hop = 1023, 256
    else:
        num_fft, hop = 31, 8
        freq = num_fft // 2 + 1
        model = DiffusionVocoder1d(
            in_channels=freq, context_channels=(freq,),
            stft_num_fft=num_fft, stft_hop_length=hop, **TINY)
        length = 512
    k1, k2 = jax.random.split(key)
    wave = jax.random.normal(k1, (2, length, 1))
    stft = STFT(num_fft=num_fft, hop_length=hop)
    magnitude, phase = stft.encode(wave)                # (b, C, F, T)
    t_pad = (-magnitude.shape[-1]) % 4                  # patch x factors
    pad = ((0, 0), (0, 0), (0, 0), (0, t_pad))
    magnitude, phase = jnp.pad(magnitude, pad), jnp.pad(phase, pad)
    variables = model.init(k2, magnitude, phase, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, magnitude, phase, k2),
        variables["params"])
    out = sample_vocoder(model, variables, magnitude, k2, num_steps=4)
    print("magnitude:", tuple(magnitude.shape), "-> wave:", out.shape)


def demo_ar(key, full: bool):
    """Chunked autoregressive diffusion (reference `model.py:198-294`)."""
    from moleculediffusiontransformer_tpu.models import (
        DiffusionAR1d, sample_ar)
    banner("DiffusionAR1d (chunked AR diffusion)")
    from moleculediffusiontransformer_tpu.models import (
        get_default_model_kwargs)
    chunk = 1024 if full else 64
    kw = dict(get_default_model_kwargs()) if full else dict(TINY)
    model = DiffusionAR1d(in_channels=1, chunk_length=chunk,
                          upsample_factor=0, context_channels=(1,), **kw)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 4 * chunk, 1))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    noise = jax.random.normal(k2, x.shape)
    out = sample_ar(model, variables, noise, k2, num_steps=4)
    print("AR sampled:", out.shape, f"({4} chunks of {chunk})")


def demo_upphaser(key, full: bool):
    """Upsampler trained with random-rephase augmentation
    (reference `model.py:179-195, 386-392`)."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionUpphaser, DiffusionUpphaser1d, sample_upsampler)
    banner("AudioDiffusionUpphaser (rephase augmentation)")
    if full:
        model, length = AudioDiffusionUpphaser(in_channels=1), 2 ** 15
    else:
        model, length = DiffusionUpphaser1d(
            in_channels=1, factor=(1,), stft_num_fft=15, stft_hop_length=4,
            context_channels=(1,), **TINY), 256
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, length, 1))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    out = sample_upsampler(model, variables, x, k2, factor=1, num_steps=4)
    print("rephased:", out.shape)


def demo_conditional(key, full: bool):
    """CFG text/embedding-conditioned waveform diffusion
    (reference `model.py:365-392`): conditioning dropout at train,
    embedding_scale at sampling."""
    from moleculediffusiontransformer_tpu.models import (
        AudioDiffusionConditional, Model1d, sample_model1d)
    banner("AudioDiffusionConditional (CFG)")
    if full:
        model, length = AudioDiffusionConditional(
            embedding_features=768, embedding_max_length=64,
            in_channels=2), 2 ** 15
        feats, ctx_len = 768, 64
    else:
        feats, ctx_len = 16, 8
        model, length = Model1d(
            in_channels=2, unet_type="cfg", context_embedding_features=feats,
            context_embedding_max_length=ctx_len, **TINY), 256
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, length, 2))
    emb = jax.random.normal(k2, (2, ctx_len, feats))    # e.g. T5 states
    variables = model.init(k3, x, k3, embedding=emb)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k3, embedding=emb,
                              embedding_mask_proba=0.1,
                              rngs={"cfg": k3}),
        variables["params"])
    noise = jax.random.normal(k3, x.shape)
    out = sample_model1d(model, variables, noise, k3, num_steps=4,
                         embedding=emb, embedding_scale=5.0)
    print("sampled (cond_scale 5.0):", out.shape)


DEMOS = [demo_model, demo_upsampler, demo_autoencoder, demo_vocoder,
         demo_ar, demo_upphaser, demo_conditional]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="reference preset sizes (wants a TPU)")
    ap.add_argument("--only", default=None,
                    help="substring filter on demo names")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    for demo in DEMOS:
        if args.only and args.only not in demo.__name__:
            continue
        demo(key, args.full)
    print("\naudio lineage: losses differentiate, samplers run.")


if __name__ == "__main__":
    main()
