"""ctypes loader + marshaling for the C++ batch tokenizer."""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "tokenizer.cpp"
_LIB = _HERE / "libtokenizer.so"
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
        lib.encode_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.encode_batch.restype = None
        lib.vocab_create.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.vocab_create.restype = ctypes.c_void_p
        lib.vocab_destroy.argtypes = [ctypes.c_void_p]
        lib.vocab_destroy.restype = None
        lib.vocab_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.vocab_encode_batch.restype = None
        assert lib.tokenizer_abi_version() == 2
        _lib = lib
        return lib


class VocabHandle:
    """Owns a native vocab map; freed when garbage-collected."""

    def __init__(self, lib: ctypes.CDLL, ptr: int) -> None:
        self._lib = lib
        self._ptr = ptr

    def __del__(self) -> None:  # noqa: D105
        if getattr(self, "_ptr", None):
            self._lib.vocab_destroy(self._ptr)
            self._ptr = None


def _pack(strings: list[str]) -> tuple[bytes, np.ndarray]:
    encoded = [s.encode("utf-8") for s in strings]
    blob = b"".join(encoded)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return blob, offsets


def vocab_create(vocab: list[str]) -> VocabHandle:
    """Build the native token->id map once (rank order = id order)."""
    lib = _load()
    blob, offsets = _pack(vocab)
    ptr = lib.vocab_create(blob, offsets, len(vocab))
    return VocabHandle(lib, ptr)


def vocab_encode_batch(
    handle: VocabHandle,
    texts: list[str],
    *,
    max_length: int,
    oov_start: int,
    oov_buckets: int,
    lowercase: bool,
    add_cls: bool,
) -> np.ndarray:
    """Texts -> (n, max_length) int32, 0-padded, vocab-id encoded."""
    lib = _load()
    blob, offsets = _pack(texts)
    out = np.zeros((len(texts), max_length), dtype=np.int32)
    lib.vocab_encode_batch(
        handle._ptr,
        blob,
        offsets,
        len(texts),
        max_length,
        oov_start,
        oov_buckets,
        int(lowercase),
        int(add_cls),
        out,
    )
    return out


def encode_batch(
    texts: list[str],
    *,
    max_length: int,
    num_hashes: int,
    vocab_size: int,
    lowercase: bool,
    add_cls: bool,
) -> np.ndarray:
    """Texts -> (n, max_length, num_hashes) int32, 0-padded."""
    lib = _load()
    encoded = [t.encode("utf-8") for t in texts]
    blob = b"".join(encoded)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    out = np.zeros((len(texts), max_length, num_hashes), dtype=np.int32)
    lib.encode_batch(
        blob,
        offsets,
        len(texts),
        max_length,
        num_hashes,
        vocab_size,
        int(lowercase),
        int(add_cls),
        out,
    )
    return out
