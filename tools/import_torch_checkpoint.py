"""Convert a published reference PyTorch checkpoint into this framework's
msgpack format.

The reference publishes state_dicts for the four trained models
(README.md:44-60: forward diffusion epoch 78, forward transformer epoch 10,
inverse diffusion epoch 4851, inverse transformer epoch 2861).  Param trees
here mirror the torch attribute paths, so conversion is mechanical.

  python tools/import_torch_checkpoint.py statedict.pt out.msgpack \
      --model inverse_diffusion --vocab 22
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_model(name: str, vocab: int):
    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, MoleculeTransformerSequenceEncoder,
        QMDiffusion, QMDiffusionForward, from_config)
    if name == "inverse_diffusion":
        model = from_config(QMDiffusion, cfg.inverse_diffusion_qm9(vocab))
        args = (jnp.zeros((1, 12)), jnp.zeros((1, model.max_length,
                                               model.pred_dim)),
                jax.random.PRNGKey(0))
        return model, args, {}
    if name == "forward_diffusion":
        model = from_config(QMDiffusionForward, cfg.forward_diffusion_qm9())
        args = (jnp.zeros((1, 64)), jnp.zeros((1, model.max_length, 1)),
                jax.random.PRNGKey(0))
        return model, args, {}
    if name == "inverse_transformer":
        t = cfg.inverse_transformer_qm9()
        model = MoleculeTransformerSequence(
            dim=t.dim, depth=t.depth, logits_dim=vocab, dim_head=t.dim_head,
            heads=t.heads, text_embed_dim=t.text_embed_dim,
            max_text_len=t.max_text_len)
        args = (jnp.zeros((1, 12)), jnp.zeros((1, 4), jnp.int32))
        return model, args, {"key": jax.random.PRNGKey(0)}
    if name == "forward_transformer":
        e = cfg.forward_transformer_qm9()
        model = MoleculeTransformerSequenceEncoder(
            dim=e.dim, depth=e.depth, heads=e.heads, ff_mult=e.ff_mult,
            logits_dim=e.logits_dim, logits_dim_length=e.logits_dim_length,
            max_length=e.max_length, max_tokens=vocab, embed_dim=e.embed_dim)
        args = (jnp.zeros((1, 64), jnp.int32),)
        return model, args, {}
    raise ValueError(f"unknown model: {name}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_checkpoint")
    p.add_argument("output")
    p.add_argument("--model", required=True,
                   choices=["inverse_diffusion", "forward_diffusion",
                            "inverse_transformer", "forward_transformer"])
    p.add_argument("--vocab", type=int, default=22,
                   help="vocabulary size incl. padding (22 plain, 24 with "
                        "@/$ delimiters)")
    args = p.parse_args()

    import torch
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        save_checkpoint)
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params

    sd = torch.load(args.torch_checkpoint, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    model, init_args, init_kwargs = build_model(args.model, args.vocab)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args,
                            **init_kwargs)
    params = state_dict_to_params(sd, shapes["params"])
    save_checkpoint(args.output, {"params": params})
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {len(sd)} torch tensors -> {args.output} "
          f"({n:,} parameters)")


if __name__ == "__main__":
    main()
