"""Command-line interface: ``python -m moleculediffusiontransformer_tpu``.

The packaged equivalent of the reference's four notebooks plus its
serving/export story, one subcommand each:

  info      backend, devices, kernel-path gates
  train     train any of the four notebook models (tiny or notebook
            preset), save a msgpack checkpoint, report held-out metrics
  eval      held-out metrics for a checkpoint (R² / validity+novelty)
  sample    inverse design: property targets -> SMILES
            (diffusion sampler or KV-cached AR transformer)
  inpaint   constrained design: freeze draft positions, regenerate
            the rest under property conditioning (RePaint)
  predict   forward direction: SMILES -> 12 QM9 properties
  export    AOT StableHLO serving artifact (``design/export.py``)
  inspect   artifact kind/specs/bundle report (runs nothing)
  serve     run an artifact model-code-free (``design/serve.py``);
            ``--http PORT`` starts the JSON daemon (``design/http_serve.py``)

Dataset flags mirror ``examples/``: ``--csv qm9_.csv`` for the reference
set (reference README.md:30), synthetic valence-correct stand-in
otherwise.  Reference flows: training `generative.py:1090-1180`,
sampling `generative.py:1662-1738`, prediction `generative.py:664-711`
and `:1864-1913`.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional


def _dataset(args, mode: str):
    from .data.qm9 import load_qm9, prepare_qm9, synthetic_qm9
    if args.csv:
        smiles, props = load_qm9(args.csv, max_rows=args.rows)
    else:
        smiles, props = synthetic_qm9(n=args.rows or 2048, seed=args.seed,
                                      chemically_valid=True)
        print("NOTE: synthetic stand-in dataset "
              "(pass --csv qm9_.csv for the real set)", file=sys.stderr)
    return prepare_qm9(smiles, props, mode=mode)


def _data_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--csv", default=None,
                   help="qm9_.csv (synthetic stand-in when omitted)")
    p.add_argument("--rows", type=int, default=None,
                   help="cap dataset rows")
    p.add_argument("--seed", type=int, default=0)


def _model_flags(p: argparse.ArgumentParser, tasks) -> None:
    p.add_argument("--task", default=tasks[0], choices=list(tasks))
    p.add_argument("--preset", default="notebook",
                   choices=("tiny", "notebook"),
                   help="architecture scale (tiny: CPU-feasible smoke)")


def _load(args, task: str, data, checkpoint: Optional[str]):
    from .train import recipes
    model = recipes.build_model(task, data.vocab_size, args.preset)
    params, src = recipes.load_params(checkpoint, task, model)
    if checkpoint is None:
        print("NOTE: random-init params (pass --checkpoint)",
              file=sys.stderr)
    return model, {"params": params}


def _emit(payload: dict) -> None:
    print(json.dumps(payload, indent=2, default=float))


# ---------------------------------------------------------- subcommands ---

def cmd_info(args) -> None:
    import jax

    import moleculediffusiontransformer_tpu as pkg
    from .ops import transformer_fusion as tf
    devices = jax.devices()
    _emit({
        "version": getattr(pkg, "__version__", "0.1.0"),
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devices],
        "device_count": len(devices),
        "fusion_default": tf.fusion_enabled(),
        "flash_attention": os.environ.get("MDT_FLASH", "1") != "0",
    })


def cmd_train(args) -> None:
    import jax

    from .core.config import TrainConfig
    from .train import recipes
    data = _dataset(args, recipes.data_mode(args.task))
    model = recipes.build_model(args.task, data.vocab_size, args.preset)
    config = TrainConfig(learning_rate=args.learning_rate,
                         batch_size=args.batch_size, epochs=args.epochs,
                         seed=args.seed,
                         accumulation_steps=args.accumulation_steps)
    params = recipes.train_task(args.task, model, data, config,
                                checkpoint_dir=args.checkpoint_dir,
                                resume=args.resume)
    if args.out:
        from .core.checkpoint import save_checkpoint
        save_checkpoint(args.out, {"params": params})
        print(f"saved {args.out}", file=sys.stderr)
    metrics = recipes.eval_task(
        args.task, model, {"params": params}, data, jax.random.PRNGKey(
            args.seed), timesteps=args.timesteps,
        num_rescore=args.num_eval, num_generate=args.num_eval)
    _emit({"task": args.task, "preset": args.preset, "epochs": args.epochs,
           **{k: v for k, v in metrics.items() if k != "sample_smiles"}})


def cmd_eval(args) -> None:
    import jax

    from .train import recipes
    data = _dataset(args, recipes.data_mode(args.task))
    model, variables = _load(args, args.task, data, args.checkpoint)
    metrics = recipes.eval_task(
        args.task, model, variables, data, jax.random.PRNGKey(args.seed),
        timesteps=args.timesteps, num_rescore=args.num_eval,
        num_generate=args.num_eval)
    _emit({"task": args.task, "checkpoint": args.checkpoint, **metrics})


def cmd_sample(args) -> None:
    import jax
    import numpy as np

    from .design import (generate_from_conditioning,
                         generate_from_conditioning_transformer)
    from .train import recipes
    data = _dataset(args, recipes.data_mode(args.task))
    model, variables = _load(args, args.task, data, args.checkpoint)
    if args.properties:
        props = np.asarray([[float(v) for v in row.split(",")]
                            for row in args.properties], np.float32)
        props = data.scaler.transform(props)  # physical units in
    else:
        props = np.asarray(data.y_test[:args.num])
    key = jax.random.PRNGKey(args.seed)
    if args.task == "inverse_diffusion":
        report = generate_from_conditioning(
            model, variables, props, data.tokenizer, key,
            cond_scale=args.cond_scale, timesteps=args.timesteps,
            training_smiles=data.smiles)
    else:
        report = generate_from_conditioning_transformer(
            model, variables, props, data.tokenizer, key,
            cond_scale=args.cond_scale,
            tokens_to_generate=args.tokens,
            training_smiles=data.smiles)
    _emit({"task": args.task, "smiles": report["smiles"],
           "validity_fraction": report["validity_fraction"],
           "novelty_fraction": report["novelty_fraction"]})


def cmd_inpaint(args) -> None:
    """Constrained design: freeze positions of a draft molecule,
    regenerate the rest under property conditioning (RePaint-style,
    reference `generative.py:1574-1660`)."""
    import jax
    import numpy as np

    from .design import inpaint_from_draft_and_conditioning
    data = _dataset(args, "inverse_diffusion")
    model, variables = _load(args, "inverse_diffusion", data,
                             args.checkpoint)
    if args.properties:
        props = data.scaler.transform(np.asarray(
            [[float(v) for v in args.properties.split(",")]], np.float32))
    else:
        props = np.asarray(data.y_test[:1])
    report = inpaint_from_draft_and_conditioning(
        model, variables, args.draft, props, args.fixed, data.tokenizer,
        jax.random.PRNGKey(args.seed), num_resamples=args.resamples,
        cond_scale=args.cond_scale, timesteps=args.timesteps,
        num_candidates=args.num, training_smiles=data.smiles)
    _emit({"task": "inpaint", "draft": args.draft, "fixed": args.fixed,
           "smiles": report["smiles"],
           "validity_fraction": report["validity_fraction"],
           "novelty_fraction": report["novelty_fraction"]})


def cmd_predict(args) -> None:
    import jax

    from .design import (predict_properties_from_smiles,
                         predict_properties_from_smiles_transformer)
    from .train import recipes
    data = _dataset(args, recipes.data_mode(args.task))
    model, variables = _load(args, args.task, data, args.checkpoint)
    if args.task == "forward_transformer":
        preds = predict_properties_from_smiles_transformer(
            model, variables, args.smiles, data.tokenizer, data.scaler)
    else:
        preds = predict_properties_from_smiles(
            model, variables, args.smiles, data.tokenizer, data.scaler,
            jax.random.PRNGKey(args.seed), timesteps=args.timesteps)
    _emit({"task": args.task,
           "predictions": {s: [float(v) for v in row]
                           for s, row in zip(args.smiles, preds)}})


def cmd_export(args) -> None:
    import jax
    import jax.numpy as jnp

    from .design import export as dexport
    from .train import recipes
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = {}
    vocab = args.vocab
    if args.embed_vocab:
        # self-contained serving bundle: tokenizer/scaler/novelty corpus
        # ride with the program (design/export.py header)
        data = _dataset(args, recipes.data_mode(args.task))
        bundle = dict(tokenizer=data.tokenizer, scaler=data.scaler,
                      training_smiles=data.smiles)
        if vocab is None:
            vocab = data.vocab_size
    model = recipes.build_model(args.task, vocab, "notebook",
                                dtype=dtype)
    ia, kw = recipes.init_example(args.task, model,
                                  max_length=args.max_length)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *ia, **kw)
    if args.checkpoint:
        from .core.checkpoint import restore_checkpoint
        variables = {"params": restore_checkpoint(
            args.checkpoint, jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), variables))["params"]}
    platforms = tuple(args.platforms.split(","))
    if args.inpaint and args.task not in ("inverse_diffusion",
                                          "forward_diffusion"):
        raise SystemExit("--inpaint applies to the diffusion tasks only")
    aot = args.aot_executable
    if args.inpaint:
        exported = dexport.export_inpainter(
            model, variables, batch=args.batch, num_steps=args.timesteps,
            cond_scale=args.cond_scale, platforms=platforms,
            executable=aot)
    elif args.task in ("inverse_diffusion", "forward_diffusion"):
        exported = dexport.export_sampler(
            model, variables, batch=args.batch, num_steps=args.timesteps,
            cond_scale=args.cond_scale, platforms=platforms,
            executable=aot)
    elif args.task == "inverse_transformer":
        exported = dexport.export_generator(
            model, variables, batch=args.batch,
            tokens_to_generate=args.tokens, cond_scale=args.cond_scale,
            platforms=platforms, executable=aot)
    else:
        exported = dexport.export_encoder(
            model, variables, batch=args.batch, max_length=args.max_length,
            platforms=platforms, executable=aot)
    exec_blob = None
    if aot:
        exported, exec_blob = exported
    dexport.save_artifact(exported, args.out, extra={"task": args.task},
                          executable=exec_blob, **bundle)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB"
          f"{', vocab+scaler embedded' if bundle else ''}"
          f"{', +aot executable' if exec_blob else ''})",
          file=sys.stderr)
    # full knob surface (--fused, --mesh-devices, tree validation):
    # tools/export_serving_artifact.py


def cmd_export_torch(args) -> None:
    """Checkpoint -> torch ``state_dict`` file (reference-layout keys and
    tensor layouts via ``nn.params_to_state_dict``), so models fine-tuned
    here load straight into the reference's torch tooling
    (``model.load_state_dict(torch.load(out), strict=False)``)."""
    import flax.serialization
    import numpy as np

    from .nn import params_to_state_dict

    with open(args.checkpoint, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    # accept a bare params tree, a {'params': ...} variables dict, or a
    # full train-state checkpoint (params + optimizer state + step)
    params = tree.get("params", tree) if isinstance(tree, dict) else tree
    sd = params_to_state_dict(params)
    if args.out.endswith(".npz"):
        np.savez(args.out, **sd)
    else:
        try:
            import torch
        except ImportError:
            raise SystemExit("torch unavailable — use an .npz --out "
                             "(load with np.load + torch.from_numpy)")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    total = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"wrote {args.out}: {len(sd)} tensors, {total:,} parameters",
          file=sys.stderr)


def cmd_inspect(args) -> None:
    """Artifact introspection: kind, input specs, platforms, bundle
    contents, parameter count — without running anything."""
    import math

    import jax

    from .design import export as dexport
    from .design.serve import KINDS
    art, header = dexport.load_bundle(args.artifact)
    specs, _ = jax.tree_util.tree_unflatten(art.in_tree,
                                            list(art.in_avals))
    data_specs = specs[1:]
    n_params = sum(math.prod(s.shape) if s.shape else 1
                   for s in jax.tree_util.tree_leaves(specs[0]))
    _emit({
        "artifact": args.artifact,
        "kind": KINDS.get(len(data_specs), "unknown"),
        "platforms": list(art.platforms),
        "param_count": n_params,
        "inputs": [{"shape": list(s.shape), "dtype": str(s.dtype)}
                   for s in data_specs],
        "bundle": {
            "tokenizer_vocab": (len(header["tokenizer"]["word_index"]) + 1
                                if "tokenizer" in header else None),
            "scaler": "scaler" in header,
            "novelty_corpus": len(header.get("training_smiles", [])),
            "executable_mb": (round(len(header["executable"]) / 1e6, 2)
                              if "executable" in header else None),
            **{k: v for k, v in header.items()
               if k not in ("tokenizer", "scaler", "training_smiles",
                            "executable")},
        },
    })


def cmd_serve(args) -> None:
    """Model-code-free serving: artifact + checkpoint + vocab -> outputs."""
    import jax
    import numpy as np

    from .design import ArtifactServer, decode_one_hot, evaluate_generated
    server = ArtifactServer(args.artifact, args.checkpoint, seed=args.seed)
    if args.checkpoint is None:
        print("NOTE: random placeholder params (pass --checkpoint)",
              file=sys.stderr)
    if getattr(args, "http", None) is not None:
        from .design.http_serve import make_httpd
        if server.tokenizer is not None:     # bundled artifact: no dataset
            httpd = make_httpd(server, host=args.host, port=args.http,
                               batch_window_ms=args.batch_window_ms)
        else:
            mode = {"encoder": "transformer",
                    "generator": "transformer"}.get(server.kind,
                                                    "inverse_diffusion")
            data = _dataset(args, mode)
            httpd = make_httpd(server, data.tokenizer, data.scaler,
                               data.smiles, host=args.host, port=args.http,
                               batch_window_ms=args.batch_window_ms)
        print(f"serving {server.kind} artifact on "
              f"http://{httpd.server_address[0]}:{httpd.server_address[1]} "
              "(POST /sample|/generate|/predict|/inpaint, "
              "GET /healthz|/specs)",
              file=sys.stderr)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            httpd.server_close()
        return
    key = jax.random.PRNGKey(args.seed)
    n = min(args.num, server.batch)

    if server.kind == "encoder":
        max_length = server.specs[0].shape[1]
        data = _dataset(args, "transformer")
        ids = np.asarray(data.X_test[:n], np.int32)[:, :max_length]
        scaled = server.call_padded(ids).reshape(n, -1)[:, :12]
        props = data.scaler.inverse_transform(scaled)
        _emit({"kind": server.kind,
               "predicted_properties": [[float(v) for v in r]
                                        for r in props]})
        return
    n_cond = server.specs[0].shape[1]
    if server.kind == "sampler":
        data = _dataset(args, "inverse_diffusion")
        props = np.asarray(data.y_test[:n], np.float32)[:, :n_cond]
        out = server.call_padded(props, key=key)
        smiles = decode_one_hot(out, data.tokenizer)
    elif server.kind == "generator":
        from .data.tokenizer import remove_start_end_token_first
        data = _dataset(args, "transformer")
        props = np.asarray(data.y_test[:n], np.float32)[:, :n_cond]
        start_id = data.tokenizer.word_index.get("@", 1)
        start = np.full((n, server.specs[1].shape[1]), start_id, np.int32)
        ids = server.call_padded(props, start, key=key)
        smiles = [remove_start_end_token_first(t)
                  for t in data.tokenizer.decode(ids)]
    else:
        raise SystemExit("inpainter artifacts need source/mask inputs — "
                         "serve them with --http (POST /inpaint) or drive "
                         "design.ArtifactServer.call directly")
    rep = evaluate_generated(smiles, data.smiles)
    _emit({"kind": server.kind, "smiles": smiles,
           "validity_fraction": rep["validity_fraction"],
           "novelty_fraction": rep["novelty_fraction"]})


def build_parser() -> argparse.ArgumentParser:
    from .train.recipes import TASKS
    p = argparse.ArgumentParser(
        prog="python -m moleculediffusiontransformer_tpu",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="backend + device + kernel-gate report"
                   ).set_defaults(fn=cmd_info)

    t = sub.add_parser("train", help="train a model, save checkpoint, eval")
    _model_flags(t, TASKS)
    _data_flags(t)
    t.add_argument("--epochs", type=int, default=1)
    t.add_argument("--batch-size", type=int, default=128)
    t.add_argument("--learning-rate", type=float, default=2e-4)
    t.add_argument("--accumulation-steps", type=int, default=1)
    t.add_argument("--timesteps", type=int, default=100)
    t.add_argument("--num-eval", type=int, default=8)
    t.add_argument("--out", default=None, help="msgpack checkpoint path")
    t.add_argument("--checkpoint-dir", default=None,
                   help="step-checkpoint directory (resumable)")
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="held-out metrics for a checkpoint")
    _model_flags(e, TASKS)
    _data_flags(e)
    e.add_argument("--checkpoint", default=None)
    e.add_argument("--timesteps", type=int, default=100)
    e.add_argument("--num-eval", type=int, default=16)
    e.set_defaults(fn=cmd_eval)

    s = sub.add_parser("sample", help="property targets -> SMILES")
    _model_flags(s, ("inverse_diffusion", "inverse_transformer"))
    _data_flags(s)
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--num", type=int, default=4,
                   help="held-out targets to condition on when "
                   "--properties is not given")
    s.add_argument("--properties", nargs="*", default=None,
                   help="explicit property rows, comma-separated physical "
                   "units, one row per molecule")
    s.add_argument("--cond-scale", type=float, default=2.0)
    s.add_argument("--timesteps", type=int, default=64)
    s.add_argument("--tokens", type=int, default=63)
    s.set_defaults(fn=cmd_sample)

    ip = sub.add_parser("inpaint", help="constrained design: freeze draft "
                        "positions, regenerate the rest")
    ip.add_argument("draft", help="draft SMILES")
    ip.add_argument("--fixed", type=int, nargs="+", required=True,
                    help="0-based character positions to keep")
    ip.add_argument("--preset", default="notebook",
                    choices=("tiny", "notebook"))
    _data_flags(ip)
    ip.add_argument("--checkpoint", default=None)
    ip.add_argument("--properties", default=None,
                    help="comma-separated property targets, physical units")
    ip.add_argument("--num", type=int, default=4, help="candidates")
    ip.add_argument("--resamples", type=int, default=1)
    ip.add_argument("--cond-scale", type=float, default=2.0)
    ip.add_argument("--timesteps", type=int, default=64)
    ip.set_defaults(fn=cmd_inpaint)

    pr = sub.add_parser("predict", help="SMILES -> 12 QM9 properties")
    _model_flags(pr, ("forward_transformer", "forward_diffusion"))
    _data_flags(pr)
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--timesteps", type=int, default=100)
    pr.add_argument("smiles", nargs="+")
    pr.set_defaults(fn=cmd_predict)

    x = sub.add_parser("export", help="AOT StableHLO serving artifact")
    _model_flags(x, TASKS)
    _data_flags(x)
    x.add_argument("--embed-vocab", action="store_true",
                   help="embed the dataset's tokenizer/scaler/novelty "
                   "corpus in the artifact (self-contained serving)")
    x.add_argument("--inpaint", action="store_true",
                   help="export the RePaint inpainting program instead of "
                   "the sampler (diffusion tasks; serve via --http "
                   "POST /inpaint)")
    x.add_argument("--out", required=True)
    x.add_argument("--checkpoint", default=None)
    x.add_argument("--vocab", type=int, default=None)
    x.add_argument("--batch", type=int, default=512)
    x.add_argument("--timesteps", type=int, default=64)
    x.add_argument("--cond-scale", type=float, default=2.0)
    x.add_argument("--tokens", type=int, default=63)
    x.add_argument("--max-length", type=int, default=64)
    x.add_argument("--platforms", default="tpu,cpu")
    x.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    x.add_argument("--aot-executable", action="store_true",
                   help="bundle the LIVE-compiled executable for THIS "
                   "host's platform/device-kind/jax-version — same-fleet "
                   "serving replays live-jit performance exactly; the "
                   "portable StableHLO tier stays as the fallback")
    x.set_defaults(fn=cmd_export)

    xt = sub.add_parser("export-torch", help="checkpoint -> torch "
                        "state_dict (reference-layout; .pt or .npz)")
    xt.add_argument("--checkpoint", required=True,
                    help="msgpack checkpoint (train-state, variables, or "
                    "bare params tree)")
    xt.add_argument("--out", required=True,
                    help=".pt (torch.save) or .npz (numpy) output")
    xt.set_defaults(fn=cmd_export_torch)

    ins = sub.add_parser("inspect", help="artifact kind/specs/bundle "
                         "report (runs nothing)")
    ins.add_argument("artifact")
    ins.set_defaults(fn=cmd_inspect)

    sv = sub.add_parser("serve", help="serve an artifact (no model code)")
    sv.add_argument("artifact")
    sv.add_argument("--checkpoint", default=None)
    sv.add_argument("--num", type=int, default=4,
                    help="held-out rows to serve (<= artifact batch)")
    sv.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="start a JSON HTTP daemon instead of a one-shot "
                    "run (design/http_serve.py)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="dynamic-batching window for /predict on encoder "
                    "artifacts: concurrent requests within the window "
                    "coalesce into one device call (exact; 0 disables)")
    _data_flags(sv)
    sv.set_defaults(fn=cmd_serve)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
