"""Build an AOT serving artifact for any of the four notebook presets.

Exports the full jitted program — CFG diffusion sampling (reference
`generative.py:834-870`), KV-cached AR generation
(`transformer.py:786-838`), or the forward property-regression pass
(`generative.py:1864-1913`) — to a portable StableHLO artifact via
``jax.export``; the serving fleet loads it with
``design.load_artifact(path).call(variables, ...)`` and needs no model
code or retrace.  Params remain call arguments: pair the one artifact
with any checkpoint of the same architecture.

  python tools/export_serving_artifact.py out.mdtx \
      --model inverse_diffusion --vocab 22 --batch 512 --steps 64 \
      --cond-scale 2.0 --platforms tpu,cpu [--fused]
  python tools/export_serving_artifact.py gen.mdtx \
      --model inverse_transformer --tokens 63
  python tools/export_serving_artifact.py enc.mdtx \
      --model forward_transformer --max-length 64

``--fused`` bakes the Pallas megakernel path into the artifact (TPU-only
deployment, Mosaic-version-pinned); the default is the portable XLA
composition (output-identical, PERF.md).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_model(name: str, vocab, dtype):
    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, MoleculeTransformerSequenceEncoder,
        QMDiffusion, QMDiffusionForward, from_config)
    if name == "inverse_diffusion":
        return from_config(QMDiffusion,
                           cfg.inverse_diffusion_qm9(vocab or 22),
                           dtype=dtype)
    if name == "forward_diffusion":
        return from_config(QMDiffusionForward, cfg.forward_diffusion_qm9(),
                           dtype=dtype)
    if name == "inverse_transformer":
        c = cfg.inverse_transformer_qm9()
        # notebook vocab for the transformer flows is 24 (22 + '@$')
        return MoleculeTransformerSequence(
            dim=c.dim, depth=c.depth, logits_dim=vocab or c.logits_dim,
            dim_head=c.dim_head, heads=c.heads,
            text_embed_dim=c.text_embed_dim, max_text_len=c.max_text_len)
    if name == "forward_transformer":
        c = cfg.forward_transformer_qm9()
        return MoleculeTransformerSequenceEncoder(
            dim=c.dim, depth=c.depth, heads=c.heads, ff_mult=c.ff_mult,
            logits_dim=c.logits_dim, logits_dim_length=c.logits_dim_length,
            max_length=c.max_length, max_tokens=vocab or c.max_tokens,
            embed_dim=c.embed_dim)
    raise ValueError(f"unknown model: {name}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("--model", default="inverse_diffusion",
                   choices=["inverse_diffusion", "forward_diffusion",
                            "inverse_transformer", "forward_transformer"])
    p.add_argument("--vocab", type=int, default=None,
                   help="vocab size (default: 22 for diffusion presets, "
                   "24 with '@$' for the transformer presets)")
    p.add_argument("--checkpoint", help="msgpack checkpoint to validate "
                   "tree compatibility against (optional)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--cond-scale", type=float, default=2.0)
    p.add_argument("--tokens", type=int, default=63,
                   help="inverse_transformer: tokens to generate")
    p.add_argument("--max-length", type=int, default=64,
                   help="forward_transformer: padded SMILES id length")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fused", action="store_true",
                   help="export the Pallas megakernel path (TPU-only)")
    p.add_argument("--aot-executable", action="store_true",
                   help="additionally bundle the LIVE-compiled executable "
                   "for THIS host's platform/device-kind/jax-version — "
                   "same-fleet serving replays live-jit performance "
                   "exactly (the portable StableHLO tier re-compiles "
                   "~50%% slower; it stays in the bundle as the fallback)")
    p.add_argument("--embed-vocab", action="store_true",
                   help="embed the dataset's tokenizer/scaler/novelty "
                   "corpus (self-contained serving bundle)")
    p.add_argument("--csv", default=None,
                   help="qm9_.csv for --embed-vocab (synthetic stand-in "
                   "when omitted)")
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="export the batch-parallel serving program over an "
                   "N-device mesh (params replicated, batch sharded over "
                   "'data'); N virtual CPU devices stand in at export time "
                   "— the artifact runs on any same-size device mesh")
    args = p.parse_args()

    if args.mesh_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.mesh_devices}").strip()

    from moleculediffusiontransformer_tpu.design import export as dexport

    bundle: dict = {}
    vocab = args.vocab
    if args.embed_vocab:
        from moleculediffusiontransformer_tpu.data.qm9 import (
            load_qm9, prepare_qm9, synthetic_qm9)
        from moleculediffusiontransformer_tpu.train.recipes import data_mode
        mode = data_mode(args.model)
        if args.csv:
            smiles, props = load_qm9(args.csv, max_rows=args.rows)
        else:
            smiles, props = synthetic_qm9(n=args.rows or 2048,
                                          chemically_valid=True)
            print("NOTE: synthetic stand-in vocabulary "
                  "(pass --csv qm9_.csv for the real set)", file=sys.stderr)
        data = prepare_qm9(smiles, props, mode=mode)
        bundle = dict(tokenizer=data.tokenizer, scaler=data.scaler,
                      training_smiles=data.smiles)
        if vocab is None:
            vocab = data.vocab_size

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args.model, vocab, dtype)
    key = jax.random.PRNGKey(0)
    if args.model in ("inverse_diffusion", "forward_diffusion"):
        cond_len = (12 if args.model == "inverse_diffusion"
                    else model.max_length)
        cond = jnp.zeros((1, cond_len))
        target = jnp.zeros((1, model.max_length, model.pred_dim))
        variables = jax.eval_shape(model.init, key, cond, target, key)
    elif args.model == "inverse_transformer":
        props = jnp.zeros((1, model.max_text_len))
        start = jnp.zeros((1, 1), jnp.int32)
        variables = jax.eval_shape(
            lambda: model.init(key, props, start, cond_drop_prob=0.0))
    else:                                           # forward_transformer
        ids = jnp.zeros((1, args.max_length), jnp.int32)
        variables = jax.eval_shape(model.init, key, ids)

    if args.checkpoint:
        from moleculediffusiontransformer_tpu.core.checkpoint import (
            restore_checkpoint)
        variables = {"params": restore_checkpoint(
            args.checkpoint, jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                variables))["params"]}

    mesh = None
    if args.mesh_devices:
        from moleculediffusiontransformer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh_devices, backend="cpu")

    platforms = tuple(args.platforms.split(","))
    aot = args.aot_executable
    if aot and mesh is not None:
        p.error("--aot-executable is single-host (the executable pins the "
                "exporting process's device layout); drop --mesh-devices")
    if args.model in ("inverse_diffusion", "forward_diffusion"):
        exported = dexport.export_sampler(
            model, variables, batch=args.batch, num_steps=args.steps,
            cond_scale=args.cond_scale, platforms=platforms,
            allow_tpu_custom_calls=args.fused, mesh=mesh, executable=aot)
        detail = f"steps={args.steps}"
    elif args.model == "inverse_transformer":
        if mesh is not None or args.fused:
            p.error("--mesh-devices/--fused apply to the diffusion "
                    "samplers only")
        exported = dexport.export_generator(
            model, variables, batch=args.batch,
            tokens_to_generate=args.tokens, cond_scale=args.cond_scale,
            platforms=platforms, executable=aot)
        detail = f"tokens={args.tokens}"
    else:                                           # forward_transformer
        if mesh is not None or args.fused:
            p.error("--mesh-devices/--fused apply to the diffusion "
                    "samplers only")
        exported = dexport.export_encoder(
            model, variables, batch=args.batch, max_length=args.max_length,
            platforms=platforms, executable=aot)
        detail = f"max_length={args.max_length}"
    exec_blob = None
    if aot:
        exported, exec_blob = exported
        detail += " +aot-executable"
    dexport.save_artifact(exported, args.output, executable=exec_blob,
                          extra={"task": args.model}, **bundle)
    size = os.path.getsize(args.output)
    print(f"wrote {args.output} ({size/1e6:.2f} MB): "
          f"{args.model} batch={args.batch} {detail} "
          f"platforms={exported.platforms}"
          f"{' vocab+scaler embedded' if bundle else ''}")


if __name__ == "__main__":
    main()
