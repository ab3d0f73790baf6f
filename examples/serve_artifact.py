"""Serve from an AOT artifact — no model code on the host.

The deployment counterpart of `tools/export_serving_artifact.py`: load a
`.mdtx` StableHLO artifact, restore a checkpoint into the artifact's own
parameter skeleton, and serve.  The artifact KIND is detected from its
own input specs — the serving host needs the artifact, a checkpoint, and
the tokenizer vocabulary; `moleculediffusiontransformer_tpu.models` is
never imported.

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


def serve_sampler(art, variables, specs, args):
    """Diffusion sampler: condition on held-out property vectors."""
    from moleculediffusiontransformer_tpu.design import (decode_one_hot,
                                                         evaluate_generated)
    props_spec = specs[1]
    batch, n_cond = props_spec.shape
    data = load_dataset(args, mode="inverse_diffusion", max_length=32)
    props = _take_props(data, batch, n_cond)
    out = art.call(variables, props, jax.random.PRNGKey(args.seed))
    smiles = decode_one_hot(np.asarray(out), data.tokenizer)
    _report("sampled", smiles, evaluate_generated(smiles, data.smiles))


def serve_generator(art, variables, specs, args):
    """AR transformer: start every row at the '@' token, decode to '$'."""
    from moleculediffusiontransformer_tpu.data.tokenizer import (
        remove_start_end_token_first)
    from moleculediffusiontransformer_tpu.design import evaluate_generated
    props_spec, start_spec = specs[1], specs[2]
    batch, n_cond = props_spec.shape
    data = load_dataset(args, mode="transformer", max_length=64)
    props = _take_props(data, batch, n_cond)
    start_id = data.tokenizer.word_index.get("@", 1)
    start = np.full(start_spec.shape, start_id, np.int32)
    ids = art.call(variables, props, start, jax.random.PRNGKey(args.seed))
    texts = data.tokenizer.decode(np.asarray(ids))
    smiles = [remove_start_end_token_first(t) for t in texts]
    _report("generated", smiles, evaluate_generated(smiles, data.smiles))


def serve_encoder(art, variables, specs, args):
    """Forward property prediction on held-out SMILES."""
    ids_spec = specs[1]
    batch, max_length = ids_spec.shape
    data = load_dataset(args, mode="transformer", max_length=max_length)
    ids = np.asarray(data.X_test[:batch], np.int32)
    if ids.shape[0] < batch:
        ids = np.concatenate(
            [ids, np.repeat(ids[:1], batch - ids.shape[0], 0)], 0)
    logits = np.asarray(art.call(variables, ids))
    scaled = logits.reshape(batch, -1)[:, :12]
    props = data.scaler.inverse_transform(scaled)
    print(f"served batch={batch}: predicted properties "
          f"(physical units, first 3 rows x 6 cols):")
    for row in props[:3]:
        print("  " + " ".join(f"{v:9.3f}" for v in row[:6]))


def _take_props(data, batch, n_cond):
    props = np.asarray(data.y_test[:batch], np.float32)
    if props.shape[0] < batch:  # pad up to the artifact's fixed batch
        props = np.concatenate(
            [props, np.repeat(props[:1], batch - props.shape[0], 0)], 0)
    return props[:, :n_cond]


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

    from moleculediffusiontransformer_tpu.design import load_artifact
    from moleculediffusiontransformer_tpu.design.export import (
        variables_skeleton)

    art = load_artifact(args.artifact)
    variables = variables_skeleton(art)
    specs, _ = jax.tree_util.tree_unflatten(art.in_tree, list(art.in_avals))

    if args.checkpoint:
        from moleculediffusiontransformer_tpu.core.checkpoint import (
            restore_checkpoint)
        variables = restore_checkpoint(args.checkpoint, variables)
        print(f"restored {args.checkpoint}")
    else:
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        rng = np.random.RandomState(args.seed)
        leaves = [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype)
                  for l in leaves]
        variables = jax.tree_util.tree_unflatten(treedef, leaves)
        print("NOTE: random placeholder params (pass --checkpoint)")

    # dispatch on the artifact's own calling convention (args after the
    # variables pytree): 1 arg = encoder (ids), 2 = sampler (props, key),
    # 3 = generator (props, start_ids, key), 4 = inpainter
    n_call = len(specs) - 1
    if n_call == 1:
        serve_encoder(art, variables, specs, args)
    elif n_call == 2:
        serve_sampler(art, variables, specs, args)
    elif n_call == 3:
        serve_generator(art, variables, specs, args)
    else:
        sys.exit("inpainter artifacts need source/mask inputs — drive them "
                 "via design.load_artifact(...).call directly")


if __name__ == "__main__":
    main()
