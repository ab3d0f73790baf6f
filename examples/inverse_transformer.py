"""Inverse transformer: property-conditioned autoregressive SMILES
generation — the rebuild of `Inverse_Transformer.ipynb` (notebook preset:
dim 128, depth 12, dim_head 16, logits_dim = vocab-with-delimiters
=> 2,407,712 params at vocab 24).

  python examples/inverse_transformer.py --csv qm9_.csv --epochs 200
  python examples/inverse_transformer.py --tiny --epochs 2    # smoke
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
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence)
    from moleculediffusiontransformer_tpu.train import (
        MetricsLogger, TrainState, eval_inverse_transformer, make_optimizer,
        make_transformer_train_step)

    data = load_dataset(args, mode="transformer", max_length=64)
    vocab = data.vocab_size
    depth, dim = (2, 32) if args.tiny else (12, 128)
    model = MoleculeTransformerSequence(
        dim=dim, depth=depth, logits_dim=vocab, dim_head=16, heads=8,
        text_embed_dim=16, max_text_len=12)

    config = TrainConfig(learning_rate=args.learning_rate,
                         batch_size=args.batch_size, epochs=args.epochs,
                         seed=args.seed)
    key = jax.random.PRNGKey(config.seed)
    variables = model.init({"params": key},
                           jnp.asarray(data.y_train[:2]),
                           jnp.asarray(data.X_train[:2], jnp.int32), key=key)
    tx = make_optimizer(config)
    state = TrainState.create(variables["params"], tx)
    if args.resume and args.checkpoint_dir:
        ckpt = latest_checkpoint(args.checkpoint_dir)
        if ckpt:
            state = restore_checkpoint(ckpt, state)

    step_fn = make_transformer_train_step(model, tx)
    logger = MetricsLogger(path=args.checkpoint_dir
                           and f"{args.checkpoint_dir}/metrics.jsonl")
    data_key = jax.random.PRNGKey(config.seed + 1)
    t0 = time.time()
    for epoch in range(config.epochs):
        for X, y in batch_iterator(data.X_train, data.y_train,
                                   config.batch_size,
                                   rng=np.random.RandomState(args.seed)):
            state, loss = step_fn(state, jnp.asarray(y),
                                  jnp.asarray(X, jnp.int32), data_key)
        metrics = eval_inverse_transformer(
            model, {"params": state.params}, data.y_test, data.tokenizer,
            data.smiles, jax.random.PRNGKey(epoch),
            num_samples=4, tokens_to_generate=16 if args.tiny else 63)
        logger.log(epoch=epoch, step=int(state.step), loss=float(loss),
                   elapsed_s=time.time() - t0, **metrics)
        if args.checkpoint_dir:
            save_step_checkpoint(args.checkpoint_dir, jax.device_get(state),
                                 int(state.step))
    print("final:", logger.history[-1] if logger.history else "(none)")


if __name__ == "__main__":
    main()
