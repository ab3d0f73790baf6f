"""Reproduce the BASELINE.md quality table end-to-end with ONE command.

Given the reference dataset (``qm9_.csv``, the Dropbox blob cited at
reference README.md:30) and the four published checkpoints
(reference README.md:44-60), this recomputes every quality number in
BASELINE.md:

  1. forward diffusion  — property R² (16 held-out, 100-step ADPM2,
     cond_scale 1; reference Forward_Diffusion.ipynb cell 56: 0.9668)
  2. inverse diffusion  — validity + novelty of generated molecules
     (reference Inverse_Diffusion.ipynb cell 65: novelty 0.25, 1/4 valid)
  3. inverse transformer — validity + novelty + per-molecule re-scored R²
     (reference Inverse_Transformer.ipynb cell 51: novelty 0.2195, 9/41
     valid, per-molecule R² 0.25-0.98)
  4. forward transformer — property R² on held-out data

Checkpoints may be torch state_dicts (``.pt``, converted in-process via
``nn.torch_import``) or this framework's ``.msgpack``.  Both dataset and
checkpoints are OPTIONAL so the pipeline is runnable in any environment:
absent blobs fall back to the synthetic QM9 stand-in and fresh random
init (clearly labeled — random-weight numbers are pipeline smoke values,
not comparable to BASELINE.md).

  python tools/reproduce_baseline.py \
      --csv qm9_.csv --checkpoint-dir ckpts/ --out baseline_repro.json

where ``ckpts/`` holds {forward_diffusion, inverse_diffusion,
inverse_transformer, forward_transformer}.{pt|msgpack}.
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MODELS = ("forward_diffusion", "inverse_diffusion",
          "inverse_transformer", "forward_transformer")


def find_checkpoint(directory, name):
    if not directory:
        return None
    hits = sorted(glob.glob(os.path.join(directory, f"{name}*")))
    return hits[0] if hits else None


def load_params(path, model, init_args, init_kwargs):
    """Checkpoint -> params; fresh init when path is None."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args,
                            **init_kwargs)
    if path is None:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args,
                                        **init_kwargs)
        return variables["params"], "random-init (no checkpoint found)"
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch
        from moleculediffusiontransformer_tpu.nn import state_dict_to_params
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return state_dict_to_params(sd, shapes["params"]), path
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        restore_checkpoint)
    restored = restore_checkpoint(path, {"params": shapes["params"]})
    return restored["params"], path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", default=None, help="qm9_.csv; synthetic "
                   "stand-in when omitted")
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None,
                   help="dir with {model_name}.{pt|msgpack} files")
    p.add_argument("--timesteps", type=int, default=100)
    p.add_argument("--num-rescore", type=int, default=16,
                   help="forward-R2 sample count (notebook: 16)")
    p.add_argument("--num-generate", type=int, default=41,
                   help="inverse-generation count (notebook: 41/4)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="baseline_repro.json")
    args = p.parse_args()

    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.data.qm9 import (load_qm9,
                                                           prepare_qm9,
                                                           synthetic_qm9)
    from moleculediffusiontransformer_tpu.design.inverse_design import (
        rescore_generated)
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, MoleculeTransformerSequenceEncoder,
        QMDiffusion, QMDiffusionForward, from_config)
    from moleculediffusiontransformer_tpu.train.eval import (
        eval_forward_diffusion, eval_forward_transformer,
        eval_inverse_diffusion, eval_inverse_transformer)

    if args.csv:
        smiles, props = load_qm9(args.csv, max_rows=args.rows)
        dataset = os.path.abspath(args.csv)
    else:
        # chemically_valid: valence-correct molecules, so validity/novelty
        # metrics carry meaning even on the stand-in
        smiles, props = synthetic_qm9(n=args.rows or 4096, seed=args.seed,
                                      chemically_valid=True)
        dataset = "synthetic stand-in (pass --csv qm9_.csv for the real set)"
        print(f"NOTE: {dataset}")

    key = jax.random.PRNGKey(args.seed)
    results = {"dataset": dataset, "checkpoints": {}, "metrics": {}}

    # ---- 1. forward diffusion: property R² --------------------------------
    data_fd = prepare_qm9(smiles, props, mode="forward_diffusion")
    model_fd = from_config(QMDiffusionForward, cfg.forward_diffusion_qm9())
    ckpt = find_checkpoint(args.checkpoint_dir, "forward_diffusion")
    fa = (jnp.zeros((1, 64)), jnp.zeros((1, model_fd.max_length, 1)),
          jax.random.PRNGKey(0))
    params_fd, src = load_params(ckpt, model_fd, fa, {})
    results["checkpoints"]["forward_diffusion"] = src
    m = eval_forward_diffusion(model_fd, {"params": params_fd},
                               data_fd.X_test, data_fd.y_test, key,
                               num_samples=args.num_rescore,
                               timesteps=args.timesteps, cond_scale=1.0)
    results["metrics"]["forward_diffusion_r2"] = m["r2"]
    results["metrics"]["forward_diffusion_mae"] = m["mae"]
    print(f"forward diffusion R2 = {m['r2']:.4f}  "
          f"(BASELINE.md target: 0.9668)")

    # ---- 2. inverse diffusion: validity + novelty -------------------------
    data_id = prepare_qm9(smiles, props, mode="inverse_diffusion")
    model_id = from_config(QMDiffusion,
                           cfg.inverse_diffusion_qm9(data_id.vocab_size))
    ckpt = find_checkpoint(args.checkpoint_dir, "inverse_diffusion")
    ia = (jnp.zeros((1, 12)),
          jnp.zeros((1, model_id.max_length, model_id.pred_dim)),
          jax.random.PRNGKey(0))
    params_id, src = load_params(ckpt, model_id, ia, {})
    results["checkpoints"]["inverse_diffusion"] = src
    m = eval_inverse_diffusion(model_id, {"params": params_id},
                               data_id.y_test, data_id.tokenizer,
                               data_id.smiles, key,
                               num_samples=args.num_generate,
                               timesteps=args.timesteps, cond_scale=2.0)
    results["metrics"]["inverse_diffusion_validity"] = m["validity_fraction"]
    results["metrics"]["inverse_diffusion_novelty"] = m["novelty_fraction"]
    print(f"inverse diffusion validity = {m['validity_fraction']:.4f}, "
          f"novelty = {m['novelty_fraction']:.4f}  "
          f"(BASELINE.md novelty: 0.25)")

    # ---- 3. inverse transformer: validity/novelty + re-scored R² ----------
    data_tr = prepare_qm9(smiles, props, mode="transformer")
    t = cfg.inverse_transformer_qm9()
    model_it = MoleculeTransformerSequence(
        dim=t.dim, depth=t.depth, logits_dim=data_tr.vocab_size,
        dim_head=t.dim_head, heads=t.heads, text_embed_dim=t.text_embed_dim,
        max_text_len=t.max_text_len)
    ckpt = find_checkpoint(args.checkpoint_dir, "inverse_transformer")
    ta = (jnp.zeros((1, 12)), jnp.zeros((1, 4), jnp.int32))
    params_it, src = load_params(ckpt, model_it, ta,
                                 {"key": jax.random.PRNGKey(0)})
    results["checkpoints"]["inverse_transformer"] = src
    m = eval_inverse_transformer(model_it, {"params": params_it},
                                 data_tr.y_test, data_tr.tokenizer,
                                 data_tr.smiles, key,
                                 num_samples=args.num_generate)
    results["metrics"]["inverse_transformer_validity"] = (
        m["validity_fraction"])
    results["metrics"]["inverse_transformer_novelty"] = m["novelty_fraction"]
    print(f"inverse transformer validity = {m['validity_fraction']:.4f}, "
          f"novelty = {m['novelty_fraction']:.4f}  "
          f"(BASELINE.md novelty: 0.2195)")

    # re-score the generated molecules with the forward diffusion model
    # (reference sample_loop_transformer -> forward re-score,
    # generative.py:1505-1529)
    gen = [s for s in m.get("sample_smiles", []) if s]
    if gen:
        targets = data_tr.scaler.inverse_transform(
            np.asarray(data_tr.y_test[:len(gen)]))
        rs = rescore_generated(model_fd, {"params": params_fd}, gen,
                               targets, data_fd.tokenizer, data_fd.scaler,
                               key)
        per_mol = [round(float(r), 3) for r in rs["per_molecule_r2"]]
        results["metrics"]["rescored_per_molecule_r2"] = per_mol
        print(f"re-scored per-molecule R2 = {per_mol}  "
              f"(BASELINE.md spread: 0.25-0.98)")

    # ---- 4. forward transformer: property R² ------------------------------
    e = cfg.forward_transformer_qm9()
    model_ft = MoleculeTransformerSequenceEncoder(
        dim=e.dim, depth=e.depth, heads=e.heads, ff_mult=e.ff_mult,
        logits_dim=e.logits_dim, logits_dim_length=e.logits_dim_length,
        max_length=e.max_length, max_tokens=data_tr.vocab_size,
        embed_dim=e.embed_dim)
    ckpt = find_checkpoint(args.checkpoint_dir, "forward_transformer")
    ea = (jnp.zeros((1, 64), jnp.int32),)
    params_ft, src = load_params(ckpt, model_ft, ea, {})
    results["checkpoints"]["forward_transformer"] = src
    m = eval_forward_transformer(model_ft, {"params": params_ft},
                                 data_tr.X_test, data_tr.y_test)
    results["metrics"]["forward_transformer_r2"] = m["r2"]
    print(f"forward transformer R2 = {m['r2']:.4f}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
