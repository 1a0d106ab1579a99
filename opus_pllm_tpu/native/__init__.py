"""Native (C++) host-side data plumbing with transparent Python fallback.

Builds `tokenizer.cc` into a shared library with g++ on first use (cached
next to the source) and binds it via ctypes — no pybind11 dependency. All
entry points degrade to the pure-Python implementations when a compiler is
unavailable, so the package works everywhere and the native path is a
strictly-faster drop-in (identical outputs, covered by parity tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tokenizer.cc")
_LIB_PATH = os.path.join(_HERE, "libopus_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            if lib.opus_native_abi_version() != 1:
                return None
            lib.esm_tokenize_batch.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.pad_id_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def esm_tokenize_batch(seqs: Sequence[str],
                       max_len: Optional[int] = None
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native fair-esm-style tokenization -> (tokens (B, L), lengths (B,)).

    Returns None when the native library is unavailable (caller falls back
    to the Python path in models/esm2.tokenize).
    """
    lib = _load()
    if lib is None:
        return None
    blob = "".join(seqs).encode("ascii", errors="replace")
    offs = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    longest = max((len(s) for s in seqs), default=0) + 2
    pad_to = max_len if max_len is not None else longest
    out = np.empty((len(seqs), pad_to), np.int32)
    lens = np.empty((len(seqs),), np.int32)
    lib.esm_tokenize_batch(
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), pad_to,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, lens


def pad_id_batch(seqs: Sequence[Sequence[int]], pad_id: int, *, left: bool,
                 pad_to: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    flat = np.concatenate([np.asarray(s, np.int32) for s in seqs]) \
        if seqs else np.zeros((0,), np.int32)
    offs = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    out = np.empty((len(seqs), pad_to), np.int32)
    mask = np.empty((len(seqs), pad_to), np.uint8)
    lib.pad_id_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), pad_to, pad_id, int(left),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, mask.astype(bool)
