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

``--train-epochs N`` upgrades the no-checkpoint fallback from smoke to
evidence: any model WITHOUT a checkpoint is trained in-process on the
(real or synthetic) train split for N epochs before evaluation, so the
emitted metrics reflect the full train→generate→validate pipeline.
``--train-preset tiny`` (default) uses CPU-feasible architectures;
``--train-preset notebook`` trains the full notebook presets (run on
TPU).  Found checkpoints always win and always use the notebook
architectures they were trained with.

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


def _train_cfg(args):
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    # reference training hyperparameters: Adam 2e-4 + grad-clip 0.5
    # (generative.py:1132; Inverse_Diffusion.ipynb cell 64)
    return TrainConfig(learning_rate=2e-4, batch_size=args.train_batch,
                       epochs=args.train_epochs, seed=args.seed)


def _trained_label(args):
    return (f"trained in-process ({args.train_preset} preset, "
            f"{args.train_epochs} epochs, batch {args.train_batch})")


def train_forward_diffusion(model, data, args):
    """`train_loop_forward` semantics (reference generative.py:525-533):
    conditioning = token ids, target = the zero-padded property track."""
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.train import train_diffusion
    L = model.max_length

    def pad_props(y):
        track = np.zeros((y.shape[0], L, 1), np.float32)
        track[:, :y.shape[1], 0] = y
        return track

    def make_iter():
        for X, y in batch_iterator(data.X_train, data.y_train,
                                   args.train_batch,
                                   rng=np.random.RandomState(args.seed)):
            yield X, pad_props(y)

    state, _ = train_diffusion(model, make_iter, _train_cfg(args),
                               init_conditioning=data.X_train[:2],
                               init_target=pad_props(data.y_train[:2]),
                               swap_xy=True)
    return jax.device_get(state.params), _trained_label(args)


def train_inverse_diffusion(model, data, args):
    """Inverse direction: conditioning = properties, target = one-hot."""
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.train import train_diffusion

    def make_iter():
        return batch_iterator(data.X_train, data.y_train, args.train_batch,
                              rng=np.random.RandomState(args.seed))

    state, _ = train_diffusion(model, make_iter, _train_cfg(args),
                               init_conditioning=data.y_train[:2],
                               init_target=data.X_train[:2])
    return jax.device_get(state.params), _trained_label(args)


def train_transformer(model, data, args, encoder=False):
    """AR decoder (CE over shifted ids) / property encoder (MSE) training,
    mirroring examples/{inverse,forward}_transformer.py."""
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.train import (
        TrainState, make_encoder_train_step, make_optimizer,
        make_transformer_train_step)
    config = _train_cfg(args)
    key = jax.random.PRNGKey(args.seed)
    if encoder:
        variables = jax.jit(model.init)(
            key, jnp.asarray(data.X_train[:2], jnp.int32))
    else:
        variables = model.init({"params": key},
                               jnp.asarray(data.y_train[:2]),
                               jnp.asarray(data.X_train[:2], jnp.int32),
                               key=key)
    tx = make_optimizer(config)
    state = TrainState.create(variables["params"], tx)
    step_fn = (make_encoder_train_step(model, tx) if encoder
               else make_transformer_train_step(model, tx))
    data_key = jax.random.PRNGKey(args.seed + 1)
    for _ in range(config.epochs):
        for X, y in batch_iterator(data.X_train, data.y_train,
                                   config.batch_size,
                                   rng=np.random.RandomState(args.seed)):
            if encoder:
                state, _loss = step_fn(state, jnp.asarray(X, jnp.int32),
                                       jnp.asarray(y))
            else:
                state, _loss = step_fn(state, jnp.asarray(y),
                                       jnp.asarray(X, jnp.int32), data_key)
    return jax.device_get(state.params), _trained_label(args)


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
    p.add_argument("--train-epochs", type=int, default=0,
                   help="train any model WITHOUT a checkpoint in-process "
                   "for N epochs before evaluating (0 = evaluate as-is; "
                   "random-init numbers are smoke values)")
    p.add_argument("--train-preset", choices=("tiny", "notebook"),
                   default="tiny",
                   help="architecture scale for --train-epochs (tiny: "
                   "CPU-feasible; notebook: full presets — run on TPU)")
    p.add_argument("--train-batch", type=int, default=128)
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
    if args.train_epochs:
        results["training"] = {"epochs": args.train_epochs,
                               "preset": args.train_preset,
                               "batch": args.train_batch,
                               "optimizer": "adam 2e-4 + grad-clip 0.5 "
                                            "(reference generative.py:1132)"}

    # ---- 1. forward diffusion: property R² --------------------------------
    data_fd = prepare_qm9(smiles, props, mode="forward_diffusion")
    ckpt = find_checkpoint(args.checkpoint_dir, "forward_diffusion")
    train = ckpt is None and args.train_epochs > 0
    if train and args.train_preset == "tiny":
        model_fd = QMDiffusionForward(
            max_length=64, channels=32, pred_dim=1, text_embed_dim=32,
            embed_dim_position=16, context_embedding_max_length=64,
            multipliers=(1, 2), factors=(4,), num_blocks=(2,),
            attentions=(1,), attention_heads=4, attention_features=32,
            patch_size=4)
    else:
        model_fd = from_config(QMDiffusionForward,
                               cfg.forward_diffusion_qm9())
    fa = (jnp.zeros((1, 64)), jnp.zeros((1, model_fd.max_length, 1)),
          jax.random.PRNGKey(0))
    if train:
        params_fd, src = train_forward_diffusion(model_fd, data_fd, args)
    else:
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
    ckpt = find_checkpoint(args.checkpoint_dir, "inverse_diffusion")
    train = ckpt is None and args.train_epochs > 0
    if train and args.train_preset == "tiny":
        model_id = QMDiffusion(
            max_length=32, channels=32, pred_dim=data_id.vocab_size,
            text_embed_dim=32, embed_dim_position=16,
            context_embedding_max_length=12, multipliers=(1, 2),
            factors=(4,), num_blocks=(2,), attentions=(1,),
            attention_heads=4, attention_features=32, pre_transformer=1,
            patch_size=1)
    else:
        model_id = from_config(QMDiffusion,
                               cfg.inverse_diffusion_qm9(data_id.vocab_size))
    ia = (jnp.zeros((1, 12)),
          jnp.zeros((1, model_id.max_length, model_id.pred_dim)),
          jax.random.PRNGKey(0))
    if train:
        params_id, src = train_inverse_diffusion(model_id, data_id, args)
    else:
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
    ckpt = find_checkpoint(args.checkpoint_dir, "inverse_transformer")
    train = ckpt is None and args.train_epochs > 0
    dim, depth = ((32, 2) if train and args.train_preset == "tiny"
                  else (t.dim, t.depth))
    model_it = MoleculeTransformerSequence(
        dim=dim, depth=depth, logits_dim=data_tr.vocab_size,
        dim_head=t.dim_head, heads=t.heads, text_embed_dim=t.text_embed_dim,
        max_text_len=t.max_text_len)
    if train:
        params_it, src = train_transformer(model_it, data_tr, args)
    else:
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
    ckpt = find_checkpoint(args.checkpoint_dir, "forward_transformer")
    train = ckpt is None and args.train_epochs > 0
    dim, depth, heads = ((32, 2, 4) if train and args.train_preset == "tiny"
                         else (e.dim, e.depth, e.heads))
    model_ft = MoleculeTransformerSequenceEncoder(
        dim=dim, depth=depth, heads=heads, ff_mult=e.ff_mult,
        logits_dim=e.logits_dim, logits_dim_length=e.logits_dim_length,
        max_length=e.max_length, max_tokens=data_tr.vocab_size,
        embed_dim=e.embed_dim)
    if train:
        params_ft, src = train_transformer(model_ft, data_tr, args,
                                           encoder=True)
    else:
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
