"""Per-task recipes: build, train, and evaluate any of the four notebook
models from a prepared QM9 dataset.

One shared implementation behind the package CLI
(``python -m moleculediffusiontransformer_tpu``) and
``tools/reproduce_baseline.py``.  Each task mirrors one reference
notebook flow:

  * ``forward_diffusion``   — property regression by diffusion
    (`Forward_Diffusion.ipynb`; training loop `generative.py:525-533`)
  * ``inverse_diffusion``   — property-conditioned molecule diffusion
    (`Inverse_Diffusion.ipynb`; `generative.py:1090-1180`)
  * ``inverse_transformer`` — property-conditioned AR generation
    (`Inverse_Transformer.ipynb`; `generative.py:1302-1400`)
  * ``forward_transformer`` — single-pass property regression
    (`generative.py:1864-1913`)

Training follows the reference hyperparameters (Adam 2e-4 + grad-clip
0.5, `generative.py:1132`) through this framework's jitted/mesh-aware
train steps.  ``preset="tiny"`` swaps CPU-feasible architectures for
smoke runs and CI; ``preset="notebook"`` is the reference scale.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TASKS = ("forward_diffusion", "inverse_diffusion",
         "inverse_transformer", "forward_transformer")

# task -> (batch, accumulation_steps) for NOTEBOOK-preset training on one
# v5e chip.  Batches follow the reference (diffusion 1024, transformer
# 256 — Inverse_Diffusion.ipynb cell 64, Forward_Transformer cell 60);
# fp32 training halves the bf16 activation envelopes PERF.md measured,
# so the diffusion tasks accumulate to fp32-safe microbatches (2x512 /
# 4x256) while the optimizer still sees the full reference batch.
# Validated by the round-5 quality-convergence runs (QUALITY.md).
PRODUCTION_BATCHES = {
    "forward_diffusion": (1024, 2),
    "inverse_diffusion": (1024, 4),
    "inverse_transformer": (256, 1),
    "forward_transformer": (256, 1),
}


def data_mode(task: str) -> str:
    """`prepare_qm9` mode for a task (the two transformer tasks share the
    start/end-delimited id layout, notebook cells 22-48)."""
    if task in ("inverse_transformer", "forward_transformer"):
        return "transformer"
    if task in ("forward_diffusion", "inverse_diffusion"):
        return task
    raise ValueError(f"unknown task: {task!r} (expected one of {TASKS})")


def build_model(task: str, vocab_size: Optional[int] = None,
                preset: str = "notebook", dtype=jnp.float32):
    """Construct the task's model at notebook (reference) or tiny scale."""
    from ..core import config as cfg
    from ..models import (MoleculeTransformerSequence,
                          MoleculeTransformerSequenceEncoder, QMDiffusion,
                          QMDiffusionForward, from_config)
    if preset not in ("notebook", "tiny"):
        raise ValueError(f"unknown preset: {preset!r}")
    tiny = preset == "tiny"

    if task == "forward_diffusion":
        if tiny:
            return QMDiffusionForward(
                max_length=64, channels=32, pred_dim=1, text_embed_dim=32,
                embed_dim_position=16, context_embedding_max_length=64,
                multipliers=(1, 2), factors=(4,), num_blocks=(2,),
                attentions=(1,), attention_heads=4, attention_features=32,
                patch_size=4, dtype=dtype)
        return from_config(QMDiffusionForward, cfg.forward_diffusion_qm9(),
                           dtype=dtype)
    if task == "inverse_diffusion":
        vocab = vocab_size or 22
        if tiny:
            return QMDiffusion(
                max_length=32, channels=32, pred_dim=vocab,
                text_embed_dim=32, embed_dim_position=16,
                context_embedding_max_length=12, multipliers=(1, 2),
                factors=(4,), num_blocks=(2,), attentions=(1,),
                attention_heads=4, attention_features=32, pre_transformer=1,
                patch_size=1, dtype=dtype)
        return from_config(QMDiffusion, cfg.inverse_diffusion_qm9(vocab),
                           dtype=dtype)
    if task == "inverse_transformer":
        t = cfg.inverse_transformer_qm9()
        dim, depth = (32, 2) if tiny else (t.dim, t.depth)
        return MoleculeTransformerSequence(
            dim=dim, depth=depth, logits_dim=vocab_size or t.logits_dim,
            dim_head=t.dim_head, heads=t.heads,
            text_embed_dim=t.text_embed_dim, max_text_len=t.max_text_len)
    if task == "forward_transformer":
        e = cfg.forward_transformer_qm9()
        dim, depth, heads = (32, 2, 4) if tiny else (e.dim, e.depth, e.heads)
        return MoleculeTransformerSequenceEncoder(
            dim=dim, depth=depth, heads=heads, ff_mult=e.ff_mult,
            logits_dim=e.logits_dim, logits_dim_length=e.logits_dim_length,
            max_length=e.max_length, max_tokens=vocab_size or e.max_tokens,
            embed_dim=e.embed_dim)
    raise ValueError(f"unknown task: {task!r} (expected one of {TASKS})")


def init_example(task: str, model,
                 max_length: int = 64) -> Tuple[tuple, dict]:
    """(args, kwargs) for ``model.init`` — minimal batch-1 example inputs,
    used for shape-only init (checkpoint restore targets, export specs)."""
    key = jax.random.PRNGKey(0)
    if task == "forward_diffusion":
        return ((jnp.zeros((1, 64)),
                 jnp.zeros((1, model.max_length, 1)), key), {})
    if task == "inverse_diffusion":
        return ((jnp.zeros((1, 12)),
                 jnp.zeros((1, model.max_length, model.pred_dim)), key), {})
    if task == "inverse_transformer":
        return ((jnp.zeros((1, model.max_text_len)),
                 jnp.zeros((1, 4), jnp.int32)), {"key": key})
    if task == "forward_transformer":
        return ((jnp.zeros((1, max_length), jnp.int32),), {})
    raise ValueError(f"unknown task: {task!r} (expected one of {TASKS})")


def load_params(path: Optional[str], task: str, model) -> Tuple[Any, str]:
    """Checkpoint -> params; fresh random init when ``path`` is None.
    Torch ``.pt``/``.pth`` state_dicts convert in-process via
    ``nn.torch_import`` (reference checkpoints, README.md:44-60);
    anything else restores this framework's msgpack format."""
    args, kwargs = init_example(task, model)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args,
                            **kwargs)
    if path is None:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args,
                                        **kwargs)
        return variables["params"], "random-init (no checkpoint found)"
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        from ..nn import state_dict_to_params
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return state_dict_to_params(sd, shapes["params"]), path
    from ..core.checkpoint import restore_checkpoint
    restored = restore_checkpoint(path, {"params": shapes["params"]})
    return restored["params"], path


# ----------------------------------------------------------- training -----

def _pad_props(y: np.ndarray, length: int) -> np.ndarray:
    """Zero-pad the property vector into a (b, L, 1) diffusion track
    (reference `train_loop_forward` target layout, generative.py:525-533)."""
    track = np.zeros((y.shape[0], length, 1), np.float32)
    track[:, :y.shape[1], 0] = y
    return track


def train_task(task: str, model, data, config,
               checkpoint_dir: Optional[str] = None,
               resume: bool = False):
    """Train ``model`` on a prepared-QM9 split with the task's reference
    semantics; returns the trained host params tree."""
    from ..data.qm9 import batch_iterator
    from .trainer import (TrainState, make_encoder_train_step,
                          make_optimizer, make_transformer_train_step,
                          train_diffusion)

    if task == "forward_diffusion":
        L = model.max_length

        def make_iter():
            for X, y in batch_iterator(
                    data.X_train, data.y_train, config.batch_size,
                    rng=np.random.RandomState(config.seed)):
                yield X, _pad_props(y, L)

        state, _ = train_diffusion(
            model, make_iter, config,
            init_conditioning=data.X_train[:2],
            init_target=_pad_props(data.y_train[:2], L), swap_xy=True,
            checkpoint_dir=checkpoint_dir, resume=resume)
        return jax.device_get(state.params)

    if task == "inverse_diffusion":
        def make_iter():
            return batch_iterator(data.X_train, data.y_train,
                                  config.batch_size,
                                  rng=np.random.RandomState(config.seed))

        state, _ = train_diffusion(
            model, make_iter, config,
            init_conditioning=data.y_train[:2],
            init_target=data.X_train[:2],
            checkpoint_dir=checkpoint_dir, resume=resume)
        return jax.device_get(state.params)

    if task in ("inverse_transformer", "forward_transformer"):
        encoder = task == "forward_transformer"
        key = jax.random.PRNGKey(config.seed)
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
        if resume and checkpoint_dir:
            from ..core.checkpoint import (latest_checkpoint,
                                           restore_checkpoint)
            ckpt = latest_checkpoint(checkpoint_dir)
            if ckpt:
                state = restore_checkpoint(ckpt, state)
        step_fn = (make_encoder_train_step(model, tx) if encoder
                   else make_transformer_train_step(model, tx))
        data_key = jax.random.PRNGKey(config.seed + 1)
        for _ in range(config.epochs):
            for X, y in batch_iterator(data.X_train, data.y_train,
                                       config.batch_size,
                                       rng=np.random.RandomState(
                                           config.seed)):
                if encoder:
                    state, _loss = step_fn(state, jnp.asarray(X, jnp.int32),
                                           jnp.asarray(y))
                else:
                    state, _loss = step_fn(state, jnp.asarray(y),
                                           jnp.asarray(X, jnp.int32),
                                           data_key)
        if checkpoint_dir:
            from ..core.checkpoint import save_step_checkpoint
            save_step_checkpoint(checkpoint_dir, jax.device_get(state),
                                 int(state.step))
        return jax.device_get(state.params)

    raise ValueError(f"unknown task: {task!r} (expected one of {TASKS})")


# --------------------------------------------------------- evaluation -----

def eval_task(task: str, model, variables, data, key: jax.Array, *,
              timesteps: int = 100, num_rescore: int = 16,
              num_generate: int = 41,
              tokens_to_generate: int = 63) -> Dict:
    """Held-out evaluation with the task's notebook metric (R² for the
    forward directions, validity/novelty for the inverse)."""
    from .eval import (eval_forward_diffusion, eval_forward_transformer,
                       eval_inverse_diffusion, eval_inverse_transformer)
    if task == "forward_diffusion":
        return eval_forward_diffusion(
            model, variables, data.X_test, data.y_test, key,
            num_samples=num_rescore, timesteps=timesteps, cond_scale=1.0)
    if task == "inverse_diffusion":
        return eval_inverse_diffusion(
            model, variables, data.y_test, data.tokenizer, data.smiles, key,
            num_samples=num_generate, timesteps=timesteps, cond_scale=2.0)
    if task == "inverse_transformer":
        return eval_inverse_transformer(
            model, variables, data.y_test, data.tokenizer, data.smiles, key,
            num_samples=num_generate, tokens_to_generate=tokens_to_generate)
    if task == "forward_transformer":
        return eval_forward_transformer(model, variables, data.X_test,
                                        data.y_test)
    raise ValueError(f"unknown task: {task!r} (expected one of {TASKS})")
