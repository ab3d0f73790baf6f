"""ctypes loader for the native tokenizer kernel (tokenizer.cpp).

Compiles on first use with g++ into a per-user cache dir and falls back to
the numpy implementations when no toolchain is available.  The public
entry points mirror `data/tokenizer.py` semantics exactly (tested against
them in tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Dict, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "tokenizer.cpp"),
         os.path.join(_DIR, "csv_loader.cpp")]
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        h = hashlib.sha256()
        for src in _SRCS:
            with open(src, "rb") as f:
                h.update(f.read())
        digest = h.hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 f"mdt_native_{os.getuid()}")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"mdt_native_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 *_SRCS, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        i64 = ctypes.c_int64
        lib.tokenize_pad.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(i64), i64,
            ctypes.POINTER(ctypes.c_uint8), i64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.one_hot_signed.argtypes = [
            ctypes.POINTER(ctypes.c_int32), i64, i64, i64,
            ctypes.POINTER(ctypes.c_float)]
        lib.tokenize_one_hot.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(i64), i64,
            ctypes.POINTER(ctypes.c_uint8), i64, i64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        lib.csv_count_rows.argtypes = [ctypes.c_char_p, i64]
        lib.csv_count_rows.restype = i64
        lib.csv_parse_rows.argtypes = [
            ctypes.c_char_p, i64, i64, i64, ctypes.POINTER(i64), i64,
            ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_float)]
        lib.csv_parse_rows.restype = i64
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def _char_map(word_index: Dict[str, int]) -> np.ndarray:
    cmap = np.zeros(256, np.uint8)
    for ch, idx in word_index.items():
        b = ch.encode("utf-8")
        if len(b) == 1 and 0 < idx < 256:
            cmap[b[0]] = idx
    return cmap


def _pack(texts: Sequence[str]):
    data = "".join(texts).encode("utf-8")
    lengths = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          np.int64, count=len(texts))
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return data, offsets


def tokenize_pad(texts: Sequence[str], word_index: Dict[str, int],
                 max_length: int) -> Optional[np.ndarray]:
    """texts -> (n, max_length) int32 padded ids; None if lib unavailable
    or the vocabulary isn't single-byte (fallback path handles those)."""
    lib = _build_and_load()
    if lib is None or any(len(ch.encode("utf-8")) != 1 or idx >= 256
                          for ch, idx in word_index.items()):
        return None
    data, offsets = _pack(texts)
    out = np.empty((len(texts), max_length), np.int32)
    cmap = _char_map(word_index)
    lib.tokenize_pad(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), cmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_length, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def load_csv(csv_path: str, property_names: Sequence[str],
             smiles_column: str = "smiles",
             max_rows: Optional[int] = None):
    """Native plain-CSV loader (csv_loader.cpp): returns
    ``(smiles list, (n, len(property_names)) float32)`` or None whenever
    the Python ``csv`` path must decide instead — lib unavailable, quoted
    CSV (DictReader quoting semantics), missing columns (user-facing
    ValueError), or a malformed row (user-facing float() error)."""
    lib = _build_and_load()
    if lib is None:
        return None
    with open(csv_path, "rb") as f:
        data = f.read()
    if b'"' in data:
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    try:
        header = data[:nl].decode("utf-8").rstrip("\r").split(",")
    except UnicodeDecodeError:
        return None
    col_index = {name: i for i, name in enumerate(header)}
    if any(name not in col_index for name in property_names):
        return None
    smi_col = None
    for cand in (smiles_column, "smiles", "SMILES", "canonical_smiles"):
        if cand in col_index:
            smi_col = col_index[cand]
            break
    if smi_col is None:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    n = int(lib.csv_count_rows(data, len(data)))
    if max_rows is not None:
        n = min(n, max_rows)
    prop_cols = np.asarray([col_index[c] for c in property_names], np.int64)
    spans = np.empty((n, 2), np.int64)
    props = np.empty((n, len(property_names)), np.float32)
    rc = int(lib.csv_parse_rows(
        data, len(data), n, smi_col, prop_cols.ctypes.data_as(i64p),
        len(property_names), spans.ctypes.data_as(i64p),
        props.ctypes.data_as(ctypes.POINTER(ctypes.c_float))))
    if rc != 0:
        return None
    smiles = [data[b:e].decode("utf-8") for b, e in spans.tolist()]
    return smiles, props


def tokenize_one_hot(texts: Sequence[str], word_index: Dict[str, int],
                     max_length: int,
                     num_classes: int) -> Optional[np.ndarray]:
    """Fused texts -> (n, max_length, num_classes) signed one-hot."""
    lib = _build_and_load()
    if lib is None or any(len(ch.encode("utf-8")) != 1 or idx >= 256
                          for ch, idx in word_index.items()):
        return None
    data, offsets = _pack(texts)
    n = len(texts)
    ids = np.empty((n, max_length), np.int32)
    out = np.empty((n, max_length, num_classes), np.float32)
    cmap = _char_map(word_index)
    lib.tokenize_one_hot(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        cmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_length, num_classes,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
