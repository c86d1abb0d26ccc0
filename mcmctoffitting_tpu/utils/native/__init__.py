"""ctypes bindings for the native chain codec (self-building).

Compiles ``chaincodec.cpp`` with g++ on first use (cached as a .so next to
the source; pybind11 is unavailable in the target image so the ABI is plain
C + ctypes).  All entry points degrade gracefully: importing this package
raises only when the codec is actually called and the toolchain is missing,
and ``chain_io`` falls back to the pure-Python parser.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "chaincodec.cpp")
_SO = os.path.join(_DIR, "_chaincodec.so")

_lib = None


class _ParseResult(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.POINTER(ctypes.c_double)),
        ("probs", ctypes.POINTER(ctypes.c_double)),
        ("walkers", ctypes.POINTER(ctypes.c_int64)),
        ("n_rows", ctypes.c_int64),
        ("n_params", ctypes.c_int64),
    ]


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.parse_chain_text.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.POINTER(_ParseResult)]
    lib.parse_chain_text.restype = ctypes.c_int
    lib.free_parse_result.argtypes = [ctypes.POINTER(_ParseResult)]
    lib.format_chain_text.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.format_chain_text.restype = ctypes.POINTER(ctypes.c_char)
    lib.free_text.argtypes = [ctypes.POINTER(ctypes.c_char)]
    _lib = lib
    return lib


def parse_chain_text_native(text: str):
    """Parse the emcee text chain format. Returns (rows, probs, walker_ids)."""
    lib = _load()
    raw = text.encode()
    res = _ParseResult()
    rc = lib.parse_chain_text(raw, len(raw), ctypes.byref(res))
    if rc != 0:
        raise ValueError(f"native chain parse failed with code {rc}")
    try:
        n, d = res.n_rows, res.n_params
        rows = np.ctypeslib.as_array(res.rows, shape=(n, d)).copy() \
            if n else np.zeros((0, 0))
        probs = np.ctypeslib.as_array(res.probs, shape=(n,)).copy() \
            if n else np.zeros(0)
        walkers = np.ctypeslib.as_array(res.walkers, shape=(n,)).copy() \
            if n else np.zeros(0, np.int64)
    finally:
        lib.free_parse_result(ctypes.byref(res))
    return rows, probs, walkers


def format_chain_text_native(positions: np.ndarray,
                             probs: np.ndarray) -> str:
    """Format (S, W, D) positions + (S, W) probs as chain text."""
    lib = _load()
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    lp = np.ascontiguousarray(probs, dtype=np.float64)
    s, w, d = pos.shape
    out_len = ctypes.c_int64()
    ptr = lib.format_chain_text(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s, w, d, ctypes.byref(out_len))
    if not ptr:
        raise MemoryError("native chain format failed")
    try:
        return ctypes.string_at(ptr, out_len.value).decode()
    finally:
        lib.free_text(ptr)
