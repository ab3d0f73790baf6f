"""Build an AOT serving artifact for a diffusion preset.

Exports the full jitted CFG sampling program (reference
`generative.py:834-870` semantics) to a portable StableHLO artifact via
``jax.export`` — the serving fleet loads it with
``design.load_artifact(path).call(variables, properties, key)`` and needs
no model code or retrace.  Params remain call arguments: pair the one
artifact with any checkpoint of the same architecture.

  python tools/export_serving_artifact.py out.mdtx \
      --model inverse_diffusion --vocab 22 --batch 512 --steps 64 \
      --cond-scale 2.0 --platforms tpu,cpu [--fused]

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


def build_model(name: str, vocab: int, dtype):
    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.models import (
        QMDiffusion, QMDiffusionForward, from_config)
    if name == "inverse_diffusion":
        return from_config(QMDiffusion, cfg.inverse_diffusion_qm9(vocab),
                           dtype=dtype)
    if name == "forward_diffusion":
        return from_config(QMDiffusionForward, cfg.forward_diffusion_qm9(),
                           dtype=dtype)
    raise ValueError(f"unknown model: {name}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("--model", default="inverse_diffusion",
                   choices=["inverse_diffusion", "forward_diffusion"])
    p.add_argument("--vocab", type=int, default=22)
    p.add_argument("--checkpoint", help="msgpack checkpoint to validate "
                   "tree compatibility against (optional)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--cond-scale", type=float, default=2.0)
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fused", action="store_true",
                   help="export the Pallas megakernel path (TPU-only)")
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

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args.model, args.vocab, dtype)
    key = jax.random.PRNGKey(0)
    cond_len = 12 if args.model == "inverse_diffusion" else model.max_length
    cond = jnp.zeros((1, cond_len))
    target = jnp.zeros((1, model.max_length, model.pred_dim))
    variables = jax.eval_shape(model.init, key, cond, target, key)

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

    exported = dexport.export_sampler(
        model, variables, batch=args.batch, num_steps=args.steps,
        cond_scale=args.cond_scale,
        platforms=tuple(args.platforms.split(",")),
        allow_tpu_custom_calls=args.fused, mesh=mesh)
    dexport.save_artifact(exported, args.output)
    size = os.path.getsize(args.output)
    print(f"wrote {args.output} ({size/1e6:.2f} MB): "
          f"{args.model} batch={args.batch} steps={args.steps} "
          f"platforms={exported.platforms}")


if __name__ == "__main__":
    main()
