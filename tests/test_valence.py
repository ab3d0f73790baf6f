"""Valence-aware SMILES validity (design/valence.py) — the no-RDKit
approximation of RDKit's parse-time chemistry (reference
`generative.py:954-961` defines validity as 'RDKit parses it').

Truth corpus: tests/rdkit_corpus.py — every entry annotated with RDKit's
verdict (grammar, over-valence, kekulization cases).  The checker must
agree on all of them; the deliberate approximations live in
KNOWN_DIVERGENT and are pinned individually below.  When RDKit exists in
the environment, tests/test_rdkit_gated.py re-validates the corpus
annotations against the real library.
"""
import pytest

from moleculediffusiontransformer_tpu.design.valence import (
    valence_smiles_valid)

from rdkit_corpus import KNOWN_DIVERGENT, RDKIT_INVALID, RDKIT_VALID


@pytest.mark.parametrize("smi", RDKIT_VALID)
def test_accepts_rdkit_valid(smi):
    assert valence_smiles_valid(smi), smi


@pytest.mark.parametrize("smi", RDKIT_INVALID)
def test_rejects_rdkit_invalid(smi):
    assert not valence_smiles_valid(smi), smi


@pytest.mark.parametrize("smi,ours,theirs", KNOWN_DIVERGENT)
def test_known_divergences_pinned(smi, ours, theirs):
    """Each deliberate approximation is pinned so a future improvement
    (Hückel electron count, a metal valence table) flips its row in
    rdkit_corpus.KNOWN_DIVERGENT deliberately, not silently."""
    assert ours != theirs, "not a divergence — move to the main corpus"
    assert valence_smiles_valid(smi) is ours, smi


def test_smiles_is_valid_routes_to_valence_checker():
    """Without RDKit the public API must reject valence-impossible
    molecules the old grammar-only fallback passed."""
    from moleculediffusiontransformer_tpu.design import (HAS_RDKIT,
                                                         smiles_is_valid)
    if HAS_RDKIT:
        pytest.skip("RDKit present: it wins by design")
    assert smiles_is_valid("CC(=O)O")
    assert not smiles_is_valid("C(C)(C)(C)(C)C")
    assert not smiles_is_valid("F=F")


def test_evaluate_generated_uses_valence_semantics():
    from moleculediffusiontransformer_tpu.design import evaluate_generated
    report = evaluate_generated(["CCO", "F=F", "C(C)(C)(C)(C)C", "CCN"],
                                ["CCO"])
    assert report["num_valid"] == 2       # CCO + CCN
    assert report["novel_smiles"] == ["CCN"]
