"""Serve molecules from an AOT artifact — no model code on the host.

The deployment counterpart of `tools/export_serving_artifact.py`: load a
`.mdtx` StableHLO artifact (the whole jitted CFG sampling program,
reference `generative.py:834-870` semantics), restore a checkpoint into
the artifact's own parameter skeleton, and decode sampled one-hot tracks
to SMILES.  The serving host needs the artifact, a checkpoint, and the
tokenizer vocabulary — `moleculediffusiontransformer_tpu.models` is never
imported.

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

    from moleculediffusiontransformer_tpu.design import (decode_one_hot,
                                                         evaluate_generated,
                                                         load_artifact)
    from moleculediffusiontransformer_tpu.design.export import (
        variables_skeleton)

    art = load_artifact(args.artifact)
    variables = variables_skeleton(art)
    # call convention: (variables, properties (b, n_cond), key) — see
    # design/export.py::export_sampler; the conditioning spec is the
    # second positional argument
    args_specs, _ = jax.tree_util.tree_unflatten(art.in_tree,
                                                 list(art.in_avals))
    batch, n_cond = args_specs[1].shape

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

    data = load_dataset(args, mode="inverse_diffusion", max_length=32)
    # serve: condition on the first `batch` held-out property vectors
    props = np.asarray(data.y_test[:batch], np.float32)
    if props.shape[0] < batch:  # pad up to the artifact's fixed batch
        props = np.concatenate(
            [props, np.repeat(props[:1], batch - props.shape[0], 0)], 0)
    props = props[:, :n_cond]

    out = art.call(variables, props, jax.random.PRNGKey(args.seed))
    smiles = decode_one_hot(np.asarray(out), data.tokenizer)
    report = evaluate_generated(smiles, data.smiles)
    print(f"served batch={batch}: validity "
          f"{report['validity_fraction']:.2f}, novelty "
          f"{report['novelty_fraction']:.2f}")
    for s in smiles[:8]:
        print(" ", s or "<empty>")


if __name__ == "__main__":
    main()
