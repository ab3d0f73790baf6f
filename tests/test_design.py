"""Design/eval layer tests: SMILES validity fallback, decode, novelty,
metrics — host-side, no jit."""
import numpy as np

from moleculediffusiontransformer_tpu.data.preprocess import (
    MinMaxScaler, r2_score)
from moleculediffusiontransformer_tpu.data.tokenizer import (CharTokenizer,
                                                             one_hot_signed)
from moleculediffusiontransformer_tpu.design import (decode_one_hot,
                                                     evaluate_generated,
                                                     smiles_is_valid)


def test_smiles_validity_accepts_qm9_style():
    for s in ["C", "CCO", "C1CC1", "CC(=O)O", "c1ccccc1", "N#C", "CC(N)C=O",
              "O=C1CC1", "FC(F)(F)C"]:
        assert smiles_is_valid(s), s


def test_smiles_validity_rejects_malformed():
    for s in ["", "1CC", "C((C", "C)C", "C1CC", "CC=", "((", "=C", "11",
              "C1CC2"]:
        assert not smiles_is_valid(s), s


def test_decode_one_hot_roundtrip():
    tok = CharTokenizer().fit_on_texts(["CCO", "C1CC1", "CC(=O)O"])
    ids = np.array(tok.texts_to_sequences(["CCO", "C1CC1"]), dtype=object)
    from moleculediffusiontransformer_tpu.data.tokenizer import pad_sequences
    padded = pad_sequences(tok.texts_to_sequences(["CCO", "C1CC1"]), 8)
    onehot = one_hot_signed(padded, tok.num_tokens)
    decoded = decode_one_hot(onehot, tok)
    assert decoded[0].startswith("CCO")
    assert decoded[1].startswith("C1CC1")


def test_evaluate_generated_counts():
    train = ["CCO", "CCC"]
    report = evaluate_generated(["CCO", "CCN", "((bad", ""], train)
    assert report["num_samples"] == 4
    assert report["num_valid"] == 2
    assert report["num_novel"] == 1            # CCN valid+novel; CCO known
    assert report["novel_smiles"] == ["CCN"]


def test_r2_and_scaler_roundtrip():
    rng = np.random.RandomState(0)
    y = rng.randn(50, 12).astype(np.float32)
    sc = MinMaxScaler((-1, 1))
    z = sc.fit_transform(y)
    assert z.min() >= -1 - 1e-6 and z.max() <= 1 + 1e-6
    back = sc.inverse_transform(z)
    assert np.allclose(back, y, atol=1e-5)
    assert abs(r2_score(y.ravel(), y.ravel()) - 1.0) < 1e-9
