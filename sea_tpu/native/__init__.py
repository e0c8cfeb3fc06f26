"""Native (C++) host runtime: build-on-demand + ctypes bindings.

The TPU compute path is JAX/XLA/Pallas; host-side hot loops (batch
assembly, synthetic corpus generation) are C++ with std::thread parallelism
(the analogue of the reference's mp.Pool data plumbing). The library is
compiled once with g++ and cached next to the source; everything degrades
to numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataio.cpp")
_SO = os.path.join(_HERE, "_dataio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC,
             "-pthread"],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(_SO)
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
            if _lib is not None:
                _lib.window_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int64),
                ]
                _lib.window_batch.restype = None
                _lib.zipf_corpus.argtypes = [
                    ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
                    ctypes.c_double, ctypes.c_double,
                    ctypes.POINTER(ctypes.c_int32),
                ]
                _lib.zipf_corpus.restype = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def window_batch_native(
    tokens: np.ndarray,
    window_idx: np.ndarray,
    max_length: int,
    stride: int,
    pad_id: int = 1,
):
    """Assemble a strided-window batch in C++. Returns (ids, mask, labels)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(tokens, np.int32)
    window_idx = np.ascontiguousarray(window_idx, np.int64)
    B = len(window_idx)
    ids = np.empty((B, max_length), np.int32)
    mask = np.empty((B, max_length), np.int32)
    labels = np.empty((B, max_length), np.int64)
    lib.window_batch(
        _ptr(tokens, ctypes.c_int32), tokens.size,
        _ptr(window_idx, ctypes.c_int64), B,
        max_length, stride, pad_id,
        _ptr(ids, ctypes.c_int32), _ptr(mask, ctypes.c_int32),
        _ptr(labels, ctypes.c_int64),
    )
    return ids, mask, labels


def zipf_corpus_native(
    total: int, vocab_size: int, seed: int = 0,
    alpha: float = 1.1, repeat_p: float = 0.15,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(total, np.int32)
    lib.zipf_corpus(total, vocab_size, seed, alpha, repeat_p,
                    _ptr(out, ctypes.c_int32))
    return out
