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


def _write_csv(path, text):
    with open(path, "w", newline="") as f:
        f.write(text)
    return str(path)


def _python_load_qm9(monkeypatch, path, **kw):
    """The pure-Python csv.DictReader oracle (native path disabled)."""
    from moleculediffusiontransformer_tpu.data import qm9
    with monkeypatch.context() as m:
        m.setattr(native, "load_csv", lambda *a, **k: None)
        return qm9.load_qm9(path, **kw)


def test_csv_loader_matches_python(tmp_path, monkeypatch):
    """Native CSV parse must equal csv.DictReader + Python float()
    bit-for-bit (both are correctly-rounded double parses narrowed to
    f32), across int/negative/exponent formats, CRLF endings, shuffled
    columns, and an extra ignored column."""
    from moleculediffusiontransformer_tpu.data.qm9 import (PROPERTY_NAMES,
                                                           load_qm9)
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.RandomState(0)
    cols = list(PROPERTY_NAMES)
    rng.shuffle(cols)
    header = cols[:5] + ["extra", "smiles"] + cols[5:]
    fmts = ["{:.17g}", "{:.3e}", "{:.0f}", "{:g}", " {:.9g}"]
    lines = [",".join(header)]
    for i in range(200):
        vals = {c: fmts[(i + j) % len(fmts)].format(rng.randn() * 10 ** (j % 5 - 2))
                for j, c in enumerate(cols)}
        vals["extra"] = str(i)
        vals["smiles"] = "C" * (1 + i % 9) + ("O" if i % 2 else "N")
        lines.append(",".join(vals[c] for c in header))
    path = _write_csv(tmp_path / "q.csv", "\r\n".join(lines) + "\r\n")

    got = native.load_csv(path, PROPERTY_NAMES)
    assert got is not None, "native loader unexpectedly fell back"
    ref_smiles, ref_props = _python_load_qm9(monkeypatch, path)
    assert got[0] == ref_smiles
    assert got[1].dtype == np.float32
    assert np.array_equal(got[1], ref_props)

    # the wired-in path gives the same result as the direct native call
    smiles2, props2 = load_qm9(path)
    assert smiles2 == ref_smiles and np.array_equal(props2, ref_props)

    # max_rows cap agrees
    got5 = native.load_csv(path, PROPERTY_NAMES, max_rows=5)
    assert got5[0] == ref_smiles[:5]
    assert np.array_equal(got5[1], ref_props[:5])


def test_csv_loader_declines_quoted_and_malformed(tmp_path, monkeypatch):
    """Quoting and malformed floats are Python-csv territory: the native
    loader must return None (fall back), not guess."""
    from moleculediffusiontransformer_tpu.data.qm9 import (PROPERTY_NAMES,
                                                           load_qm9)
    if not native.available():
        pytest.skip("native unavailable")
    head = "smiles," + ",".join(PROPERTY_NAMES)
    row = ",".join(["1.5"] * 12)
    quoted = _write_csv(tmp_path / "quoted.csv",
                        f'{head}\n"CCO",{row}\n')
    assert native.load_csv(quoted, PROPERTY_NAMES) is None
    smiles, props = load_qm9(quoted)   # python path handles the quotes
    assert smiles == ["CCO"] and props.shape == (1, 12)

    bad = _write_csv(tmp_path / "bad.csv",
                     f"{head}\nCCO,{row}\nCCN,oops," + row[4:] + "\n")
    assert native.load_csv(bad, PROPERTY_NAMES) is None
    with pytest.raises(ValueError):
        _python_load_qm9(monkeypatch, bad)
    with pytest.raises(ValueError):
        load_qm9(bad)                  # wired path surfaces the same error

    missing = _write_csv(tmp_path / "m.csv", "smiles,alpha\nCCO,1.0\n")
    assert native.load_csv(missing, PROPERTY_NAMES) is None
    with pytest.raises(ValueError):
        load_qm9(missing)


def test_csv_loader_throughput(tmp_path):
    """QM9-scale load (130k rows): native should not lose to Python csv
    (it is typically several times faster; loose bound to avoid flakes)."""
    from moleculediffusiontransformer_tpu.data.qm9 import PROPERTY_NAMES
    if not native.available():
        pytest.skip("native unavailable")
    import csv as _csv
    n = 130000
    head = "smiles," + ",".join(PROPERTY_NAMES)
    rng = np.random.RandomState(1)
    block = rng.randn(256, 12)
    rows = [f"C{i % 97}N," + ",".join(f"{v:.9g}" for v in block[i % 256])
            for i in range(n)]
    path = _write_csv(tmp_path / "big.csv", head + "\n" + "\n".join(rows))

    t0 = time.perf_counter()
    got = native.load_csv(path, PROPERTY_NAMES)
    t_native = time.perf_counter() - t0
    assert got is not None and len(got[0]) == n

    t0 = time.perf_counter()
    with open(path, newline="") as f:
        reader = _csv.DictReader(f)
        ref = [(r["smiles"], [float(r[c]) for c in PROPERTY_NAMES])
               for r in reader]
    t_python = time.perf_counter() - t0
    assert got[0][:3] == [r[0] for r in ref[:3]]
    assert np.allclose(got[1][:64],
                       np.asarray([r[1] for r in ref[:64]], np.float32))
    assert t_native < t_python * 2, (t_native, t_python)


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
