"""ctypes loader + marshaling for the C++ BM25 full-text index.

Same build/load pattern as tokenizer_native.py (g++ on demand, mtime
rebuild). `NativeBM25` owns one immutable index handle; searches are
thread-safe (read-only native state).
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "bm25.cpp"
_LIB = _HERE / "libbm25.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB), str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    logger.info("built %s", _LIB)


def _load() -> ctypes.CDLL:
    global _lib  # noqa: PLW0603 — process-wide singleton
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.bm25_create.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.bm25_create.restype = ctypes.c_void_p
        lib.bm25_destroy.argtypes = [ctypes.c_void_p]
        lib.bm25_destroy.restype = None
        lib.bm25_search.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.bm25_search.restype = ctypes.c_int32
        assert lib.bm25_abi_version() == 1
        _lib = lib
        return lib


class NativeBM25:
    """Immutable native BM25 index over a list of document strings."""

    def __init__(self, docs: list[str]) -> None:
        self._lib = _load()
        # Pre-lowercase with Python's UNICODE str.lower() before
        # marshaling: the C++ tokenizer lowercases byte-wise ASCII only,
        # so text whose Unicode lowercase maps into ASCII (Kelvin sign
        # -> 'k', 'İ' -> 'i'+combining dot) would otherwise tokenize
        # differently from the Python oracle, making search results
        # host-dependent (round-4 advisor finding).
        encoded = [doc.lower().encode("utf-8") for doc in docs]
        blob = b"".join(encoded)
        offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in encoded], out=offsets[1:])
        self._handle = self._lib.bm25_create(blob, offsets, len(encoded))
        if not self._handle:
            msg = "bm25_create returned NULL"
            raise RuntimeError(msg)

    def search(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        rows = np.zeros(max(top_k, 1), dtype=np.int32)
        scores = np.zeros(max(top_k, 1), dtype=np.float32)
        raw = query.lower().encode("utf-8")  # Unicode lower, see __init__
        count = self._lib.bm25_search(
            self._handle, raw, len(raw), top_k, rows, scores
        )
        return [(int(rows[i]), float(scores[i])) for i in range(count)]

    def __del__(self) -> None:
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.bm25_destroy(handle)
            self._handle = None


def available() -> bool:
    """True when the native library builds/loads on this host."""
    try:
        _load()
    except Exception:  # noqa: BLE001 — fall back to the Python path
        logger.warning("native BM25 unavailable; using the Python path")
        return False
    return True
