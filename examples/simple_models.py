"""Simple examples of basic models — the fifth reference notebook,
CLI-ified (reference `Simple examples of basic models.ipynb`).

The notebook's contract per model: construct with toy shapes, compute a
loss, check it differentiates (`loss.backward()` there, `jax.grad` here),
then sample/generate and print the output shape.  This script runs that
tour over every public model family — the notebook's three (QMDiffusion,
MoleculeTransformer, MoleculeTransformerSequence) plus the rest of the
exported zoo — on CPU-sized configs in about a minute.

Usage:  python examples/simple_models.py [--full]
        --full uses the notebook's actual sizes (channels 64, dim 128,
        depth 6) instead of the tiny smoke configs.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def banner(name: str) -> None:
    print(f"\n=== {name} " + "=" * max(0, 60 - len(name)))


def check_loss_and_grad(loss_fn, params) -> float:
    """The notebook's `loss.backward()` check: loss finite, grads finite."""
    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert np.isfinite(float(loss)), "loss is not finite"
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves), "NaN grad"
    print(f"loss = {float(loss):.4f}  (grads finite over "
          f"{len(leaves)} arrays)")
    return float(loss)


def demo_qm_diffusion(key, full: bool):
    """Notebook cell 3: conditional CFG diffusion, loss + 64-step sample."""
    from moleculediffusiontransformer_tpu.models import QMDiffusion, sample
    banner("QMDiffusion (cfg UNet diffusion)")
    if full:
        kw = dict(max_length=64, pred_dim=16, channels=64,
                  context_embedding_max_length=12, text_embed_dim=64,
                  embed_dim_position=64)
        steps = 64
    else:
        kw = dict(max_length=16, pred_dim=16, channels=16,
                  context_embedding_max_length=12, text_embed_dim=16,
                  embed_dim_position=8, multipliers=(1, 2), factors=(2,),
                  num_blocks=(1,), attentions=(1,), attention_heads=2,
                  attention_features=8, pre_transformer=1, patch_size=1)
        steps = 8
    model = QMDiffusion(**kw)
    k1, k2, k3 = jax.random.split(key, 3)
    sequences = jax.random.normal(k1, (4, 12))            # conditioning
    output = jax.nn.one_hot(
        jax.random.randint(k2, (4, kw["max_length"]), 0, 16), 16) * 2 - 1
    variables = model.init(k3, sequences, output, k3)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, sequences, output, k3),
        variables["params"])
    out = sample(model, variables, sequences, k3, num_steps=steps,
                 cond_scale=1.0)
    print("sampled:", out.shape, "(b, max_length, pred_dim)")


def demo_continuous_transformer(key, full: bool):
    """Notebook cell 6: continuous vector AR decoder, MSE loss +
    vector-feedback generate."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformer, generate_vectors)
    banner("MoleculeTransformer (continuous AR decoder)")
    dim, depth = (128, 6) if full else (32, 2)
    model = MoleculeTransformer(dim=dim, depth=depth, logits_dim=32,
                                dim_head=16, heads=8, text_embed_dim=32,
                                max_text_len=12, pos_fourier_graph_dim=32)
    k1, k2, k3 = jax.random.split(key, 3)
    sequences = jax.random.normal(k1, (4, 12))
    vectors = jax.random.normal(k2, (4, 24, 32))          # channels-last
    variables = model.init(k3, sequences, vectors, key=k3)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, sequences, vectors,
                              return_loss=True, key=k3),
        variables["params"])
    out = generate_vectors(model, variables, sequences,
                           tokens_to_generate=16)
    print("generated:", out.shape, "(b, tokens, logits_dim)")


def demo_sequence_transformer(key, full: bool):
    """Notebook cell 8: token-ID AR decoder, CE loss + KV-cached
    generate (with and without an explicit start token)."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, generate_sequence)
    banner("MoleculeTransformerSequence (token AR decoder)")
    dim, depth = (128, 6) if full else (32, 2)
    model = MoleculeTransformerSequence(dim=dim, depth=depth, logits_dim=32,
                                        dim_head=16, heads=8,
                                        text_embed_dim=32, max_text_len=12)
    k1, k2, k3 = jax.random.split(key, 3)
    sequences = jax.random.normal(k1, (4, 12))
    ids = jax.random.randint(k2, (4, 23), 0, 32)
    variables = model.init(k3, sequences, ids, key=k3)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, sequences, ids,
                              return_loss=True, key=k3),
        variables["params"])
    start = jax.random.randint(k1, (4, 1), 0, 32)
    out = generate_sequence(model, variables, sequences, start, k3,
                            tokens_to_generate=16)
    print("generated ids:", out.shape, "(b, 1 + tokens)")


def demo_encoder(key, full: bool):
    """Forward property-regression encoder: (b, L) ids -> (b, 1, 12)."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequenceEncoder)
    banner("MoleculeTransformerSequenceEncoder (property regression)")
    dim, depth = (256, 6) if full else (32, 2)
    model = MoleculeTransformerSequenceEncoder(
        dim=dim, depth=depth, heads=4, logits_dim=1, logits_dim_length=12,
        max_length=16, max_tokens=24, embed_dim=16)
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (4, 16), 0, 24)
    targets = jax.random.normal(k2, (4, 1, 12))
    variables = model.init(k1, ids)
    check_loss_and_grad(
        lambda p: jnp.mean(jnp.square(
            model.apply({"params": p}, ids) - targets)),
        variables["params"])
    print("predictions:", model.apply(variables, ids).shape, "(b, 1, 12)")


def demo_gpt(key, full: bool):
    """Unconditional GPT: CE loss + KV-cached gumbel generation."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerGPT, generate_gpt)
    banner("MoleculeTransformerGPT (unconditional)")
    dim, depth = (128, 6) if full else (32, 2)
    model = MoleculeTransformerGPT(dim=dim, depth=depth, logits_dim=32,
                                   max_tokens=32, dim_head=16, heads=4,
                                   embed_dim=16)
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (4, 23), 0, 32)
    variables = model.init(k1, ids, key=k1)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, ids, return_loss=True, key=k1),
        variables["params"])
    out = generate_gpt(model, variables, ids[:, :4], k2,
                       tokens_to_generate=12)
    print("generated ids:", out.shape)


def demo_audio_model1d(key, full: bool):
    """Audio-lineage Model1d: v-diffusion loss + VSampler sampling."""
    from moleculediffusiontransformer_tpu.diffusion import (
        UniformDistribution)
    from moleculediffusiontransformer_tpu.models import (
        Model1d, sample_model1d)
    banner("Model1d (audio-lineage v-diffusion)")
    length = 4096 if full else 64
    model = Model1d(in_channels=2, diffusion_type="v",
                    diffusion_sigma_distribution=UniformDistribution(),
                    channels=32 if full else 16, multipliers=(1, 2),
                    factors=(2,), num_blocks=(1,), attentions=(0,),
                    patch_size=2, attention_heads=2, attention_features=8,
                    attention_multiplier=2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, length, 2))
    variables = model.init(k2, x, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, x, k2), variables["params"])
    noise = jax.random.normal(k2, (2, length, 2))
    out = sample_model1d(model, variables, noise, k2, num_steps=4,
                         sampler="v", schedule="linear", clamp=True)
    print("sampled:", out.shape, "(b, length, channels)")


def demo_graph_analog(key, full: bool):
    """Graph-analog diffusion over packed per-node xyz(+neighbors)."""
    from moleculediffusiontransformer_tpu.models import (
        AnalogDiffusionSparse)
    banner("AnalogDiffusionSparse (graph analog)")
    model = AnalogDiffusionSparse(
        max_length=16, channels=32 if full else 16, pred_dim=3,
        text_embed_dim=16, embed_dim_position=8,
        context_embedding_max_length=12, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(1,), attention_heads=2,
        attention_features=8, patch_size=1, max_neighbors=4)
    k1, k2 = jax.random.split(key)
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    packed = jax.random.normal(k1, (2, 10, 4 + 16))
    variables = model.init(k2, seq, packed, k2)
    check_loss_and_grad(
        lambda p: model.apply({"params": p}, seq, packed, k2),
        variables["params"])
    print("ok")


DEMOS = [demo_qm_diffusion, demo_continuous_transformer,
         demo_sequence_transformer, demo_encoder, demo_gpt,
         demo_audio_model1d, demo_graph_analog]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="notebook-scale configs (slower)")
    ap.add_argument("--only", default=None,
                    help="substring filter on demo names")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    for demo in DEMOS:
        if args.only and args.only not in demo.__name__:
            continue
        demo(key, args.full)
    print("\nall model families constructed, differentiated, and sampled.")


if __name__ == "__main__":
    main()
