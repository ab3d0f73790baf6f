"""Inverse-design pipeline: generate -> decode -> validate -> novelty ->
re-score with the forward model (reference `generative.py:1176-1295,
1574-1913`).

Device/host boundary: everything up to the argmax decode runs on-device in
one jitted program; tokenizer decode, RDKit validity, and novelty run
host-side on the final integer arrays (SURVEY §7.4.5).

RDKit is optional in this environment: when absent, ``smiles_is_valid``
falls back to a lightweight syntactic checker (clearly weaker than RDKit's
chemistry-aware parse — swap in RDKit wherever available).
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import MinMaxScaler, mean_absolute_error, r2_score
from ..data.qm9 import is_novel
from ..data.tokenizer import (CharTokenizer, add_start_end_char,
                              one_hot_signed, pad_sequences,
                              remove_start_end_token_first)

try:  # RDKit is the reference's validity oracle (`generative.py:947-994`)
    from rdkit import Chem  # type: ignore
    HAS_RDKIT = True
except ImportError:  # pragma: no cover
    Chem = None
    HAS_RDKIT = False

_ORGANIC = ("Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I",
            "c", "n", "o", "s", "p", "b")
_TOKEN_RE = re.compile(
    r"(\[[^\]]+\]|Cl|Br|[BCNOPSFI]|[cnopsb]|[0-9]|%[0-9]{2}|[=#/\\()@+\-.])")


def _syntactic_smiles_valid(smi: str) -> bool:
    """Fallback validity check without RDKit: tokenizes the string against
    the SMILES grammar's lexicon and checks paren/ring-bond balance.  A
    superset of RDKit-valid — catches malformed strings, not bad valence."""
    if not smi:
        return False
    pos = 0
    rings: Dict[str, int] = {}
    depth = 0
    prev_atom = False
    pending_bond = False
    for m in _TOKEN_RE.finditer(smi):
        if m.start() != pos:
            return False
        tok = m.group(0)
        pos = m.end()
        if tok == "(":
            if not prev_atom or pending_bond:
                return False
            depth += 1
        elif tok == ")":
            depth -= 1
            if depth < 0 or pending_bond:
                return False
        elif tok.isdigit() or tok.startswith("%"):
            if not prev_atom:
                return False
            rings[tok] = rings.get(tok, 0) + 1
            pending_bond = False
        elif tok in ("=", "#", "/", "\\"):
            if not (prev_atom or depth > 0) or pending_bond:
                return False
            pending_bond = True
        elif tok in (".", "@", "+", "-"):
            pass
        else:
            prev_atom = True
            pending_bond = False
    if pos != len(smi) or depth != 0 or pending_bond:
        return False
    if any(v % 2 for v in rings.values()):
        return False
    return any(a in smi for a in _ORGANIC)


def smiles_is_valid(smi: str) -> bool:
    """Validity = RDKit parse succeeds (reference `generative.py:954-961`).
    When RDKit is unavailable, ``design.valence`` reproduces the chemistry
    RDKit applies at parse time (grammar + kekulization + charge-adjusted
    valences), so pentavalent carbons etc. are rejected — not just
    malformed strings (the older grammar-only `_syntactic_smiles_valid`
    remains for comparison)."""
    if HAS_RDKIT:
        mol = Chem.MolFromSmiles(smi)
        return mol is not None
    from .valence import valence_smiles_valid
    return valence_smiles_valid(smi)


def canonicalize(smi: str) -> Optional[str]:
    if HAS_RDKIT:
        mol = Chem.MolFromSmiles(smi)
        return Chem.MolToSmiles(mol) if mol is not None else None
    return smi if smiles_is_valid(smi) else None


def decode_one_hot(samples: np.ndarray, tokenizer: CharTokenizer) -> List[str]:
    """argmax over token channels -> reverse tokenize
    (reference `generative.py:1234-1247`).  ``samples`` (b, L, vocab)."""
    ids = np.argmax(np.asarray(samples), axis=-1)
    return tokenizer.decode(ids)


def evaluate_generated(smiles_list: Sequence[str],
                       training_smiles: Sequence[str]) -> Dict:
    """Validity + novelty counters (reference `generative.py:1249-1295`)."""
    valid = [s for s in smiles_list if smiles_is_valid(s)]
    novel = [s for s in valid if is_novel(training_smiles, s)]
    n = max(len(smiles_list), 1)
    return {
        "num_samples": len(smiles_list),
        "num_valid": len(valid),
        "num_novel": len(novel),
        "validity_fraction": len(valid) / n,
        "novelty_fraction": len(novel) / max(len(valid), 1),
        "valid_smiles": valid,
        "novel_smiles": novel,
    }


# ------------------------------------------------------------ forward API --

def predict_properties_from_smiles(model_forward, variables,
                                   smiles: Sequence[str],
                                   tokenizer: CharTokenizer,
                                   scaler: MinMaxScaler, key: jax.Array, *,
                                   max_length: int = 64,
                                   x_norm_factor: Optional[float] = None,
                                   timesteps: int = 100,
                                   cond_scale: float = 1.0) -> np.ndarray:
    """Forward-diffusion property prediction
    (reference `predict_properties_from_SMILES`, `generative.py:664-711`):
    tokenize -> pad(64) -> / norm factor -> 100-step sample -> first 12
    positions -> inverse scale.  Returns physical-unit properties (b, 12)."""
    from ..models.qm_diffusion import sample as qm_sample
    ids = pad_sequences(tokenizer.texts_to_sequences(smiles), max_length)
    norm = (float(tokenizer.vocab_size) if x_norm_factor is None
            else x_norm_factor)
    cond = jnp.asarray(ids, jnp.float32) / norm
    track = qm_sample(model_forward, variables, cond, key,
                      num_steps=timesteps, cond_scale=cond_scale)
    props_scaled = np.asarray(track)[:, :12, 0]
    return scaler.inverse_transform(props_scaled)


def predict_properties_from_smiles_transformer(
        model_encoder, variables, smiles: Sequence[str],
        tokenizer: CharTokenizer, scaler: MinMaxScaler, *,
        max_length: int = 64, start_char: str = "@",
        end_char: str = "$") -> np.ndarray:
    """Forward-transformer property prediction (single forward pass, no
    diffusion — reference `generative.py:1864-1913`)."""
    texts = add_start_end_char(list(smiles), start_char, end_char)
    ids = pad_sequences(tokenizer.texts_to_sequences(texts), max_length)
    logits = model_encoder.apply(variables, jnp.asarray(ids, jnp.int32))
    props_scaled = np.asarray(logits).reshape(len(smiles), -1)[:, :12]
    return scaler.inverse_transform(props_scaled)


# ------------------------------------------------------------ inverse API --

def generate_from_conditioning(model, variables, properties: np.ndarray,
                               tokenizer: CharTokenizer, key: jax.Array, *,
                               scaler: Optional[MinMaxScaler] = None,
                               training_smiles: Sequence[str] = (),
                               cond_scale: float = 7.5,
                               timesteps: int = 100,
                               mesh=None) -> Dict:
    """Single-shot inverse design from a raw property vector
    (reference `generative.py:1662-1738`): scale -> sample -> argmax ->
    decode -> validity/novelty.  ``properties`` (b, 12) in physical units
    when ``scaler`` given, else already scaled.

    ``mesh``: serve the request batch-parallel over a device mesh — the
    batch (padded to a device multiple) is sharded over the 'data' axis,
    params replicated, and GSPMD partitions the whole sampling scan.
    When the batch divides the mesh evenly (no padding) the results are
    bit-identical to single-device sampling: the noise draw depends only
    on ``key`` and the global shape.  Padding changes the global noise
    shape, so padded batches are valid samples but a different draw."""
    from ..models.qm_diffusion import sample as qm_sample
    props = np.asarray(properties, np.float32)
    if scaler is not None:
        props = scaler.transform(props)
    n = props.shape[0]
    props_j = jnp.asarray(props)
    if mesh is not None:
        from ..parallel.mesh import pad_to_multiple, replicate, shard_batch
        n_dev = mesh.devices.size
        props_j = shard_batch(mesh, pad_to_multiple(props, n_dev))
        variables = replicate(mesh, variables)
    out = qm_sample(model, variables, props_j, key,
                    num_steps=timesteps, cond_scale=cond_scale)
    out = out[:n]
    smiles = decode_one_hot(np.asarray(out), tokenizer)
    report = evaluate_generated(smiles, training_smiles)
    report["smiles"] = smiles
    report["raw_samples"] = np.asarray(out)
    return report


def inpaint_from_draft_and_conditioning(
        model, variables, draft_smiles: str, properties: np.ndarray,
        fixed_positions: Sequence[int], tokenizer: CharTokenizer,
        key: jax.Array, *, scaler: Optional[MinMaxScaler] = None,
        num_resamples: int = 1, cond_scale: float = 7.5,
        timesteps: int = 100, num_candidates: int = 4,
        training_smiles: Sequence[str] = ()) -> Dict:
    """Constrained design: freeze ``fixed_positions`` of a draft molecule,
    regenerate the rest under property conditioning
    (reference `generative.py:1574-1660`)."""
    from ..models.qm_diffusion import inpaint as qm_inpaint
    props = np.asarray(properties, np.float32).reshape(1, -1)
    if scaler is not None:
        props = scaler.transform(props)
    props = np.repeat(props, num_candidates, axis=0)

    ids = pad_sequences(tokenizer.texts_to_sequences([draft_smiles]),
                        model.max_length)
    source = one_hot_signed(ids, model.pred_dim)          # (1, L, vocab)
    source = np.repeat(source, num_candidates, axis=0)
    mask = np.zeros((num_candidates, model.max_length, model.pred_dim), bool)
    mask[:, list(fixed_positions), :] = True              # True = keep

    out = qm_inpaint(model, variables, jnp.asarray(props),
                     jnp.asarray(source), jnp.asarray(mask), key,
                     num_steps=timesteps, num_resamples=num_resamples,
                     cond_scale=cond_scale)
    smiles = decode_one_hot(np.asarray(out), tokenizer)
    report = evaluate_generated(smiles, training_smiles)
    report["smiles"] = smiles
    return report


def generate_from_conditioning_transformer(
        model, variables, properties: np.ndarray, tokenizer: CharTokenizer,
        key: jax.Array, *, scaler: Optional[MinMaxScaler] = None,
        tokens_to_generate: int = 63, cond_scale: float = 1.5,
        temperature: float = 1.0, filter_thres: float = 0.9,
        start_char: str = "@", end_char: str = "$",
        start_sequence: Optional[str] = None,
        training_smiles: Sequence[str] = ()) -> Dict:
    """Inverse design with the AR transformer (reference
    `generative.py:1775-1860`): start from '@' (or a prompt), KV-cached
    CFG generation, strip delimiters, validity/novelty."""
    from ..models.transformers import generate_sequence
    props = np.asarray(properties, np.float32)
    if scaler is not None:
        props = scaler.transform(props)
    b = props.shape[0]
    start_text = start_char + (start_sequence or "")
    start_ids = np.asarray(
        tokenizer.texts_to_sequences([start_text] * b), np.int32)
    out = generate_sequence(model, variables, jnp.asarray(props),
                            jnp.asarray(start_ids), key,
                            tokens_to_generate=tokens_to_generate,
                            cond_scale=cond_scale, temperature=temperature,
                            filter_thres=filter_thres)
    decoded = tokenizer.decode(np.asarray(out))
    smiles = [remove_start_end_token_first(s, start_char, end_char)
              for s in decoded]
    report = evaluate_generated(smiles, training_smiles)
    report["smiles"] = smiles
    return report


def rescore_generated(model_forward, variables_forward, smiles: Sequence[str],
                      target_properties: np.ndarray,
                      tokenizer: CharTokenizer, scaler: MinMaxScaler,
                      key: jax.Array, *, transformer_encoder=None,
                      variables_encoder=None) -> Dict:
    """Close the loop: re-predict properties of generated molecules with a
    forward model and compare to the conditioning targets — per-molecule R²
    and MAE (reference `generative.py:1249-1284,1505-1529`)."""
    if transformer_encoder is not None:
        preds = predict_properties_from_smiles_transformer(
            transformer_encoder, variables_encoder, smiles, tokenizer, scaler)
    else:
        preds = predict_properties_from_smiles(
            model_forward, variables_forward, smiles, tokenizer, scaler, key)
    target = np.asarray(target_properties, np.float32)
    per_mol_r2 = [r2_score(target[i], preds[i]) for i in range(len(smiles))]
    return {
        "predicted_properties": preds,
        "per_molecule_r2": per_mol_r2,
        "overall_r2": r2_score(target[:len(preds)].ravel(), preds.ravel()),
        "mae": mean_absolute_error(target[:len(preds)], preds),
    }
