"""Forward transformer encoder: 12 QM9 properties from tokenized SMILES —
the rebuild of `Forward_Transformer.ipynb` (notebook preset: dim 256,
depth 6, heads 16, ff_mult 2, output (b, 1, 12) => 3,162,496 params).

  python examples/forward_transformer.py --csv qm9_.csv --epochs 50
  python examples/forward_transformer.py --tiny --epochs 2    # smoke
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from common import base_parser, load_dataset


def main():
    args = base_parser(__doc__).parse_args()
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_step_checkpoint)
    from moleculediffusiontransformer_tpu.core.config import (
        TrainConfig, forward_transformer_qm9)
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequenceEncoder)
    from moleculediffusiontransformer_tpu.train import (
        MetricsLogger, TrainState, eval_forward_transformer, make_optimizer,
        make_encoder_train_step)

    data = load_dataset(args, mode="transformer", max_length=64)
    preset = forward_transformer_qm9()
    dim, depth = (32, 2) if args.tiny else (preset.dim, preset.depth)
    model = MoleculeTransformerSequenceEncoder(
        dim=dim, depth=depth, heads=4 if args.tiny else preset.heads,
        ff_mult=preset.ff_mult, logits_dim=preset.logits_dim,
        logits_dim_length=preset.logits_dim_length,
        max_length=preset.max_length, max_tokens=data.vocab_size,
        embed_dim=preset.embed_dim)

    config = TrainConfig(learning_rate=1e-4, batch_size=args.batch_size,
                         epochs=args.epochs, seed=args.seed)
    key = jax.random.PRNGKey(config.seed)
    variables = model.init(key, jnp.asarray(data.X_train[:2], jnp.int32))
    tx = make_optimizer(config)
    state = TrainState.create(variables["params"], tx)
    if args.resume and args.checkpoint_dir:
        ckpt = latest_checkpoint(args.checkpoint_dir)
        if ckpt:
            state = restore_checkpoint(ckpt, state)

    step_fn = make_encoder_train_step(model, tx)
    logger = MetricsLogger(path=args.checkpoint_dir
                           and f"{args.checkpoint_dir}/metrics.jsonl")
    t0 = time.time()
    for epoch in range(config.epochs):
        for X, y in batch_iterator(data.X_train, data.y_train,
                                   config.batch_size,
                                   rng=np.random.RandomState(args.seed)):
            state, loss = step_fn(state, jnp.asarray(X, jnp.int32),
                                  jnp.asarray(y))
        metrics = eval_forward_transformer(model, {"params": state.params},
                                           data.X_test, data.y_test)
        logger.log(epoch=epoch, step=int(state.step), loss=float(loss),
                   elapsed_s=time.time() - t0, **metrics)
        if args.checkpoint_dir:
            save_step_checkpoint(args.checkpoint_dir, jax.device_get(state),
                                 int(state.step))
    print("final:", logger.history[-1] if logger.history else "(none)")


if __name__ == "__main__":
    main()
