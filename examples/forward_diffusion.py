"""Forward diffusion: tokenized SMILES -> 12 QM9 properties.

The rebuild of `Forward_Diffusion.ipynb`: notebook preset (channels 64,
pred_dim 1, max_length 64, patch 4 => 18,322,684 params), properties padded
onto a 64-long track with the SMILES ids as conditioning
(reference `train_loop_forward`, `generative.py:488-588`).

  python examples/forward_diffusion.py --csv qm9_.csv --epochs 100
  python examples/forward_diffusion.py --tiny --epochs 2      # smoke
"""
import jax
import numpy as np

from common import base_parser, load_dataset


def main():
    args = base_parser(__doc__).parse_args()
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator
    from moleculediffusiontransformer_tpu.models import QMDiffusionForward
    from moleculediffusiontransformer_tpu.train import (MetricsLogger,
                                                        eval_forward_diffusion,
                                                        train_diffusion)

    max_length = 64
    data = load_dataset(args, mode="forward_diffusion", max_length=max_length)
    if args.tiny:
        model = QMDiffusionForward(max_length=max_length, channels=32,
                                   pred_dim=1, text_embed_dim=32,
                                   embed_dim_position=16,
                                   context_embedding_max_length=max_length,
                                   multipliers=(1, 2), factors=(4,),
                                   num_blocks=(2,), attentions=(1,),
                                   attention_heads=4, attention_features=32,
                                   patch_size=4)
    else:
        model = QMDiffusionForward(max_length=max_length, channels=64,
                                   pred_dim=1, text_embed_dim=64,
                                   embed_dim_position=64,
                                   context_embedding_max_length=max_length,
                                   multipliers=(1, 2, 4), factors=(4, 4),
                                   num_blocks=(3, 3), attentions=(2, 2),
                                   attention_heads=8, attention_features=64,
                                   attention_multiplier=2, patch_size=4)

    def pad_props(y):
        """properties (b, 12) -> diffusion track (b, 64, 1)
        (reference `generative.py:525-533`)."""
        track = np.zeros((y.shape[0], max_length, 1), np.float32)
        track[:, :y.shape[1], 0] = y
        return track

    def make_iter():
        for X, y in batch_iterator(data.X_train, data.y_train,
                                   args.batch_size,
                                   rng=np.random.RandomState(args.seed)):
            yield X, pad_props(y)   # (conditioning, target) with swap_xy

    config = TrainConfig(learning_rate=args.learning_rate,
                         batch_size=args.batch_size, epochs=args.epochs,
                         seed=args.seed)
    eval_key = jax.random.PRNGKey(args.seed + 7)

    def eval_fn(state):
        return eval_forward_diffusion(model, {"params": state.params},
                                      data.X_test, data.y_test, eval_key,
                                      num_samples=16, timesteps=32)

    state, logger = train_diffusion(
        model, make_iter, config,
        init_conditioning=data.X_train[:2],
        init_target=pad_props(data.y_train[:2]),
        eval_fn=eval_fn, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume, swap_xy=True,
        logger=MetricsLogger(path=args.checkpoint_dir
                             and f"{args.checkpoint_dir}/metrics.jsonl"))
    print("final:", logger.history[-1] if logger.history else "(no metrics)")


if __name__ == "__main__":
    main()
