"""Inverse diffusion: 12 QM9 properties -> SMILES one-hot tracks.

The rebuild of `Inverse_Diffusion.ipynb`: notebook preset (channels 128,
pred_dim = vocab, max_length 32, pre_transformer 2 => 90,965,554 params at
vocab 22), Adam 2e-4 + clip 0.5, online validity/novelty eval, checkpoints
with optimizer state.

  python examples/inverse_diffusion.py --csv qm9_.csv --epochs 300
  python examples/inverse_diffusion.py --tiny --epochs 2      # smoke
"""
import jax
import jax.numpy as jnp
import numpy as np

from common import base_parser, epoch_iterator, load_dataset


def main():
    args = base_parser(__doc__).parse_args()
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.models import QMDiffusion
    from moleculediffusiontransformer_tpu.train import (MetricsLogger,
                                                        eval_inverse_diffusion,
                                                        train_diffusion)

    data = load_dataset(args, mode="inverse_diffusion", max_length=32)
    vocab = data.vocab_size
    if args.tiny:
        model = QMDiffusion(max_length=32, channels=32, pred_dim=vocab,
                            text_embed_dim=32, embed_dim_position=16,
                            context_embedding_max_length=12,
                            multipliers=(1, 2), factors=(4,),
                            num_blocks=(2,), attentions=(1,),
                            attention_heads=4, attention_features=32,
                            pre_transformer=1, patch_size=1)
    else:
        model = QMDiffusion(max_length=32, channels=128, pred_dim=vocab,
                            text_embed_dim=64, embed_dim_position=64,
                            context_embedding_max_length=12,
                            multipliers=(1, 2, 4), factors=(4, 4),
                            num_blocks=(3, 3), attentions=(4, 4),
                            attention_heads=8, attention_features=64,
                            attention_multiplier=2,
                            pre_transformer=2, patch_size=1)

    config = TrainConfig(learning_rate=args.learning_rate,
                         batch_size=args.batch_size, epochs=args.epochs,
                         seed=args.seed)
    eval_key = jax.random.PRNGKey(args.seed + 7)

    def eval_fn(state):
        return eval_inverse_diffusion(
            model, {"params": state.params}, data.y_test, data.tokenizer,
            data.smiles, eval_key, num_samples=4, timesteps=32)

    state, logger = train_diffusion(
        model, epoch_iterator(data, config.batch_size, args.seed), config,
        init_conditioning=data.y_train[:2],
        init_target=data.X_train[:2],
        eval_fn=eval_fn, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        logger=MetricsLogger(path=args.checkpoint_dir
                             and f"{args.checkpoint_dir}/metrics.jsonl"))
    print("final:", logger.history[-1] if logger.history else "(no metrics)")


if __name__ == "__main__":
    main()
