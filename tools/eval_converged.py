"""Notebook-protocol evaluation of the CONVERGED quality checkpoints.

The round-5 convergence curves (tools/quality_convergence.py) evaluate
with variance-reducing settings (64-sample forward R², 41 generations).
This tool re-evaluates the plateaued checkpoints under the REFERENCE
NOTEBOOKS' exact protocols so the QUALITY.md table is comparable
anchor-for-anchor:

  forward diffusion    16 held-out molecules, 100-step ADPM2, cond 1.0
                       (Forward_Diffusion.ipynb cell 56)
  inverse diffusion    4 generations (cell 65's 1/4-valid anchor) and
                       41 for a lower-variance companion figure
  inverse transformer  41 generations (Inverse_Transformer.ipynb cell 51)
  forward transformer  held-out R² (256 samples)

Checkpoints are the TrainState msgpacks quality_convergence wrote
(params + optimizer state); the corpus/seed must match training so the
held-out split is the trained-on split's complement.

  python tools/eval_converged.py --ckpts quality_r5/ckpts \
      --rows 20480 --out quality_r5/notebook_parity_eval.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def restore_params(task: str, model, ckpt_dir: str):
    """Latest step_N.msgpack -> host params (TrainState-shaped restore,
    exactly like the trainer's resume path, trainer.py:358-368)."""
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        latest_checkpoint, restore_checkpoint)
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.train import (TrainState,
                                                        make_optimizer)
    from moleculediffusiontransformer_tpu.train import recipes

    path = latest_checkpoint(os.path.join(ckpt_dir, task))
    if path is None:
        raise FileNotFoundError(f"no step_*.msgpack under {ckpt_dir}/{task}")
    args, kwargs = recipes.init_example(task, model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args, **kwargs)
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    state = restore_checkpoint(path, jax.device_get(state))
    return state.params, path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpts", default="quality_r5/ckpts")
    p.add_argument("--rows", type=int, default=20480)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="quality_r5/notebook_parity_eval.json")
    args = p.parse_args()

    from moleculediffusiontransformer_tpu.data.qm9 import (prepare_qm9,
                                                           synthetic_qm9)
    from moleculediffusiontransformer_tpu.train import recipes

    smiles, props = synthetic_qm9(n=args.rows, seed=args.seed,
                                  chemically_valid=True)
    key = jax.random.PRNGKey(args.seed + 7)
    out = {"corpus": f"synthetic_qm9(n={args.rows}, seed={args.seed}, "
                     "chemically_valid=True)",
           "checkpoints": {}, "metrics": {}}

    plan = [
        ("forward_diffusion", dict(timesteps=100, num_rescore=16), "n16"),
        ("inverse_diffusion", dict(timesteps=100, num_generate=4), "n4"),
        ("inverse_diffusion", dict(timesteps=100, num_generate=41), "n41"),
        ("inverse_transformer", dict(num_generate=41), "n41"),
        ("forward_transformer", {}, "n256"),
    ]
    cache = {}
    for task, kw, tag in plan:
        if task not in cache:
            data = prepare_qm9(smiles, props, mode=recipes.data_mode(task))
            model = recipes.build_model(task, data.vocab_size, "notebook")
            params, path = restore_params(task, model, args.ckpts)
            cache[task] = (data, model, params)
            out["checkpoints"][task] = path
        data, model, params = cache[task]
        m = recipes.eval_task(task, model, {"params": params}, data, key,
                              **kw)
        rec = {k: (round(float(v), 4) if hasattr(v, "__float__") else v)
               for k, v in m.items() if not isinstance(v, (list, dict))}
        out["metrics"][f"{task}_{tag}"] = rec
        print(f"[{task} {tag}] {rec}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
