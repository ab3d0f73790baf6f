"""Serve from an AOT artifact — no model code on the host.

The deployment counterpart of `tools/export_serving_artifact.py`: load a
`.mdtx` StableHLO artifact, restore a checkpoint into the artifact's own
parameter skeleton, and serve.  All of that is
``design.ArtifactServer`` — the artifact KIND is detected from its own
input specs; the serving host needs the artifact, a checkpoint, and the
tokenizer vocabulary; `moleculediffusiontransformer_tpu.models` is never
imported.

Supported artifacts (see `design/export.py`):
  * diffusion sampler  — call(vars, props, key) -> one-hot tracks
    (reference `generative.py:834-870` semantics) -> decoded SMILES
  * AR generator       — call(vars, props, start_ids, key) -> token ids
    (reference `transformer.py:786-838`) -> decoded SMILES
  * property encoder   — call(vars, ids) -> scaled properties
    (reference `generative.py:1864-1913`) -> physical-unit properties

  # build (once, anywhere):
  python tools/export_serving_artifact.py sampler.mdtx \
      --model inverse_diffusion --batch 64 --steps 64
  # same-fleet production build: bundle the live-compiled executable
  # (serves at exactly live-jit speed; StableHLO stays as fallback)
  # and bake the Pallas megakernel into the StableHLO tier too:
  python tools/export_serving_artifact.py sampler.mdtx \
      --model inverse_diffusion --batch 512 --steps 64 \
      --fused --aot-executable
  # serve (tiny smoke with synthetic data + random params):
  python examples/serve_artifact.py sampler.mdtx \
      [--checkpoint ckpts/step_100.msgpack] [--csv qm9_.csv]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from common import load_dataset


def serve_sampler(server, args):
    """Diffusion sampler: condition on held-out property vectors."""
    from moleculediffusiontransformer_tpu.design import (decode_one_hot,
                                                         evaluate_generated)
    n_cond = server.specs[0].shape[1]
    data = load_dataset(args, mode="inverse_diffusion", max_length=32)
    props = np.asarray(data.y_test[:server.batch], np.float32)[:, :n_cond]
    out = server.call_padded(props, key=jax.random.PRNGKey(args.seed))
    smiles = decode_one_hot(out, data.tokenizer)
    _report("sampled", smiles, evaluate_generated(smiles, data.smiles))


def serve_generator(server, args):
    """AR transformer: start every row at the '@' token, decode to '$'."""
    from moleculediffusiontransformer_tpu.data.tokenizer import (
        remove_start_end_token_first)
    from moleculediffusiontransformer_tpu.design import evaluate_generated
    n_cond = server.specs[0].shape[1]
    start_len = server.specs[1].shape[1]
    data = load_dataset(args, mode="transformer", max_length=64)
    props = np.asarray(data.y_test[:server.batch], np.float32)[:, :n_cond]
    start_id = data.tokenizer.word_index.get("@", 1)
    start = np.full((props.shape[0], start_len), start_id, np.int32)
    ids = server.call_padded(props, start, key=jax.random.PRNGKey(args.seed))
    texts = data.tokenizer.decode(ids)
    smiles = [remove_start_end_token_first(t) for t in texts]
    _report("generated", smiles, evaluate_generated(smiles, data.smiles))


def serve_encoder(server, args):
    """Forward property prediction on held-out SMILES."""
    max_length = server.specs[0].shape[1]
    data = load_dataset(args, mode="transformer", max_length=max_length)
    ids = np.asarray(data.X_test[:server.batch], np.int32)
    logits = server.call_padded(ids)
    scaled = logits.reshape(ids.shape[0], -1)[:, :12]
    props = data.scaler.inverse_transform(scaled)
    print(f"served batch={ids.shape[0]}: predicted properties "
          f"(physical units, first 3 rows x 6 cols):")
    for row in props[:3]:
        print("  " + " ".join(f"{v:9.3f}" for v in row[:6]))


def _report(verb, smiles, report):
    print(f"{verb} batch={len(smiles)}: validity "
          f"{report['validity_fraction']:.2f}, novelty "
          f"{report['novelty_fraction']:.2f}")
    for s in smiles[:8]:
        print(" ", s or "<empty>")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("artifact", help=".mdtx file from export_serving_artifact")
    p.add_argument("--checkpoint", default=None,
                   help="msgpack checkpoint (params); random-normal "
                        "placeholder params when omitted (smoke mode)")
    p.add_argument("--csv", default=None,
                   help="qm9_.csv for the tokenizer vocabulary + novelty "
                        "set; synthetic stand-in when omitted")
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from moleculediffusiontransformer_tpu.design import ArtifactServer

    server = ArtifactServer(args.artifact, args.checkpoint, seed=args.seed)
    if args.checkpoint:
        print(f"restored {args.checkpoint}")
    else:
        print("NOTE: random placeholder params (pass --checkpoint)")

    if server.kind == "encoder":
        serve_encoder(server, args)
    elif server.kind == "sampler":
        serve_sampler(server, args)
    elif server.kind == "generator":
        serve_generator(server, args)
    else:
        sys.exit("inpainter artifacts need source/mask inputs — drive them "
                 "via server.call(props, source, mask, key) directly")


if __name__ == "__main__":
    main()
