"""Native C++ tokenizer kernel: exact agreement with the numpy reference
implementations, plus a throughput sanity check."""
import time

import numpy as np
import pytest

from moleculediffusiontransformer_tpu.data import native
from moleculediffusiontransformer_tpu.data.qm9 import synthetic_qm9
from moleculediffusiontransformer_tpu.data.tokenizer import (CharTokenizer,
                                                             one_hot_signed,
                                                             pad_sequences)


@pytest.fixture(scope="module")
def corpus():
    smiles, _ = synthetic_qm9(n=512, seed=3)
    tok = CharTokenizer().fit_on_texts(smiles)
    return smiles, tok


def test_native_builds(corpus):
    if not native.available():
        pytest.skip("no g++ toolchain available")


def test_tokenize_pad_matches_numpy(corpus):
    smiles, tok = corpus
    if not native.available():
        pytest.skip("native unavailable")
    got = native.tokenize_pad(smiles, tok.word_index, 24)
    ref = pad_sequences(tok.texts_to_sequences(smiles), 24)
    assert np.array_equal(got, ref)


def test_tokenize_one_hot_matches_numpy(corpus):
    smiles, tok = corpus
    if not native.available():
        pytest.skip("native unavailable")
    got = native.tokenize_one_hot(smiles, tok.word_index, 16,
                                  tok.num_tokens)
    ref = one_hot_signed(pad_sequences(tok.texts_to_sequences(smiles), 16),
                         tok.num_tokens)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_unknown_chars_dropped(corpus):
    _, tok = corpus
    if not native.available():
        pytest.skip("native unavailable")
    got = native.tokenize_pad(["C@@C", ""], tok.word_index, 6)
    ref = pad_sequences(tok.texts_to_sequences(["C@@C", ""]), 6)
    assert np.array_equal(got, ref)


def test_native_throughput(corpus):
    """The native path should beat numpy on the full QM9-scale encode."""
    if not native.available():
        pytest.skip("native unavailable")
    smiles, _ = synthetic_qm9(n=20000, seed=5)
    tok = CharTokenizer().fit_on_texts(smiles)
    t0 = time.perf_counter()
    a = native.tokenize_one_hot(smiles, tok.word_index, 32, tok.num_tokens)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = one_hot_signed(pad_sequences(tok.texts_to_sequences(smiles), 32),
                       tok.num_tokens)
    t_numpy = time.perf_counter() - t0
    assert np.array_equal(a, b)
    # informational; assert only a loose bound so CI variance can't flake it
    assert t_native < t_numpy * 2, (t_native, t_numpy)


def test_native_fuzz_matches_numpy(corpus):
    """Property fuzz: arbitrary strings (unknown ASCII, multi-byte UTF-8,
    empty, longer than max_length) must agree with the numpy path exactly.
    UTF-8 bytes of a non-vocab char are all >= 0x80 and can never collide
    with the (ASCII) vocab, so byte-wise C++ and char-wise python drop the
    same things."""
    _, tok = corpus
    if not native.available():
        pytest.skip("native unavailable")
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    text = st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(text, min_size=1, max_size=8),
           st.integers(min_value=1, max_value=48))
    def check(texts, max_length):
        got = native.tokenize_pad(texts, tok.word_index, max_length)
        ref = pad_sequences(tok.texts_to_sequences(texts), max_length)
        assert np.array_equal(got, ref)
        goth = native.tokenize_one_hot(texts, tok.word_index, max_length,
                                       tok.num_tokens)
        refh = one_hot_signed(ref, tok.num_tokens)
        assert np.array_equal(goth, refh)

    check()
