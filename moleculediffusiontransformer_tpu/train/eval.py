"""Online evaluation loops — the rebuild of the reference's sample_loop_*
functions (`generative.py:590-659,1176-1295,1403-1533,2009-2073`), minus
matplotlib: metrics come back as dicts for the JSONL logger.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import MinMaxScaler, mean_absolute_error, r2_score
from ..data.tokenizer import CharTokenizer
from ..design.inverse_design import decode_one_hot, evaluate_generated


def eval_forward_diffusion(model, variables, X_test: np.ndarray,
                           y_test: np.ndarray, key: jax.Array, *,
                           num_samples: int = 16, timesteps: int = 100,
                           cond_scale: float = 1.0) -> Dict:
    """R² of diffusion-predicted properties on held-out data
    (reference `sample_loop_forward`, `generative.py:590-659`).
    X_test = normalized token ids (conditioning), y_test = scaled props."""
    from ..models.qm_diffusion import sample as qm_sample
    cond = jnp.asarray(X_test[:num_samples])
    track = qm_sample(model, variables, cond, key, num_steps=timesteps,
                      cond_scale=cond_scale)
    preds = np.asarray(track)[:, :y_test.shape[1], 0]
    gt = y_test[:num_samples]
    return {"r2": r2_score(gt.ravel(), preds.ravel()),
            "mae": mean_absolute_error(gt, preds)}


def eval_inverse_diffusion(model, variables, y_test: np.ndarray,
                           tokenizer: CharTokenizer,
                           training_smiles: Sequence[str], key: jax.Array, *,
                           num_samples: int = 4, timesteps: int = 64,
                           cond_scale: float = 1.0) -> Dict:
    """Sample molecules for held-out property targets; validity + novelty
    (reference `sample_loop_generative`, `generative.py:1176-1295`)."""
    from ..models.qm_diffusion import sample as qm_sample
    cond = jnp.asarray(y_test[:num_samples])
    out = qm_sample(model, variables, cond, key, num_steps=timesteps,
                    cond_scale=cond_scale)
    smiles = decode_one_hot(np.asarray(out), tokenizer)
    rep = evaluate_generated(smiles, training_smiles)
    return {"validity_fraction": rep["validity_fraction"],
            "novelty_fraction": rep["novelty_fraction"],
            "num_valid": rep["num_valid"],
            "sample_smiles": smiles[:4]}


def eval_forward_transformer(model, variables, X_test: np.ndarray,
                             y_test: np.ndarray, *,
                             num_samples: int = 256) -> Dict:
    """R² of the encoder's property predictions
    (reference `sample_loop_forward_transformer`, `generative.py:2009-2073`)."""
    ids = jnp.asarray(X_test[:num_samples], jnp.int32)
    logits = model.apply(variables, ids)
    preds = np.asarray(logits).reshape(ids.shape[0], -1)[:, :y_test.shape[1]]
    gt = y_test[:num_samples]
    return {"r2": r2_score(gt.ravel(), preds.ravel()),
            "mae": mean_absolute_error(gt, preds)}


def eval_inverse_transformer(model, variables, y_test: np.ndarray,
                             tokenizer: CharTokenizer,
                             training_smiles: Sequence[str], key: jax.Array,
                             *, num_samples: int = 8,
                             tokens_to_generate: int = 63,
                             cond_scale: float = 1.5,
                             start_char: str = "@",
                             end_char: str = "$") -> Dict:
    """Generate molecules with the AR transformer; validity + novelty
    (reference `sample_loop_transformer`, `generative.py:1403-1533`)."""
    from ..design.inverse_design import (
        generate_from_conditioning_transformer)
    rep = generate_from_conditioning_transformer(
        model, variables, y_test[:num_samples], tokenizer, key,
        tokens_to_generate=tokens_to_generate, cond_scale=cond_scale,
        start_char=start_char, end_char=end_char,
        training_smiles=training_smiles)
    return {"validity_fraction": rep["validity_fraction"],
            "novelty_fraction": rep["novelty_fraction"],
            "num_valid": rep["num_valid"],
            "sample_smiles": rep["smiles"][:4]}
