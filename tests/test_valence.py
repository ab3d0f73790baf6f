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


@pytest.mark.parametrize("n", range(3, 17))
def test_aromatic_carbocycle_huckel(n):
    """Pure-carbon aromatic ring of size n is RDKit-parseable iff the pi
    count (= n) is 4k+2: benzene 6, [10]/[14]annulene; odd rings fail
    kekulization, 4k rings (cyclobutadiene, COT) fail Hückel."""
    smi = "c1" + "c" * (n - 2) + "c1"
    assert valence_smiles_valid(smi) is (n % 4 == 2), smi


def test_oversized_aromatic_component_guard_accepts():
    """Components above the cycle-enumeration guard (24 atoms) are
    accepted permissively, never rejected — [26]annulene (26 pi = 4k+2,
    RDKit-valid) exercises that path and happens to be correct too."""
    assert valence_smiles_valid("c1" + "c" * 24 + "c1")


def test_kekule_spellings_unaffected_by_huckel():
    """Uppercase (kekulé) antiaromatics are plain valence chemistry —
    RDKit parses C1=CC=C1 even though it rejects c1ccc1."""
    assert valence_smiles_valid("C1=CC=C1")          # cyclobutadiene
    assert valence_smiles_valid("C1=CC=CC=CC=C1")    # cyclooctatetraene


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
