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

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "tokenizer.cpp")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 f"mdt_native_{os.getuid()}")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"tokenizer_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", tmp],
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
