"""Hashing-trick tokenizer: text -> fixed-shape token-id arrays.

The reference tokenizes with a pretrained WordPiece vocab
(bert-base-uncased, /root/reference/xfmr_rec/models.py:23) and re-pads
every batch to length 512 inside the train step
(/root/reference/xfmr_rec/lightning.py:60-74) — a per-step host hot spot.

The TPU-first redesign differs in two ways:

1. **Feature hashing instead of a downloaded vocab** (the "hashing trick",
   Weinberger et al. 2009 — a capability the reference README promises but
   never implements). Tokens are signed 64-bit FNV-1a hashed into the id
   space; no vocab file, no OOV, deterministic across runs and hosts.
   Optionally emits `num_hashes` independent ids per token for hash/Bloom
   embedding tables (models/encoder.py).

2. **Tokenize once, at data-prep time, to a short static length.** The
   model consumes fixed-shape int32 arrays; no per-step host tokenization
   or pad-to-512. The JSON feature texts are short, so `max_length=64`
   default (configurable up to the reference's 512).

A C++ fast path (native/tokenizer.cpp, loaded via ctypes) accelerates
batch encoding; this module is the always-available pure-python/numpy
reference implementation and the fallback.
"""

from __future__ import annotations

import re

import numpy as np
import pydantic

# Reserved token ids. PAD must be 0: attention masks and pooling treat
# id 0 as padding, and 0-padded pos_idx arrays rely on real indices >= 1.
PAD_ID = 0
CLS_ID = 1
NUM_RESERVED = 2

_TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?")

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
# Distinct per-hash-function seeds (arbitrary odd 64-bit constants).
_HASH_SEEDS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
    0x85EBCA77C2B2AE63,
    0x2545F4914F6CDD1D,
    0xFF51AFD7ED558CCD,
    0xC4CEB9FE1A85EC53,
)


def fnv1a_64(token: str, seed: int = 0) -> int:
    """64-bit FNV-1a over the UTF-8 bytes, xor-folded with a seed."""
    h = _FNV_OFFSET ^ np.uint64(seed)
    for byte in token.encode("utf-8"):
        h = np.uint64((int(h) ^ byte) * int(_FNV_PRIME) % (1 << 64))
    return int(h)


class TokenizerConfig(pydantic.BaseModel):
    vocab_size: int = 30522
    max_length: int = 64
    num_hashes: int = 1
    lowercase: bool = True
    add_cls: bool = True


def build_vocab(
    texts: list[str],
    *,
    vocab_size: int,
    oov_buckets: int,
    lowercase: bool = True,
) -> list[str]:
    """Corpus-frequency vocab: the top tokens by count, deterministic.

    The learned-vocab capability of the reference (a trained WordPiece
    vocab, /root/reference/xfmr_rec/models.py:23, lightning.py:60-74)
    without the blocked download: rank all corpus tokens by frequency
    (ties broken lexicographically) and keep the top
    `vocab_size - NUM_RESERVED - oov_buckets`. Built once at prep time —
    idiomatic for the tokenize-once pipeline.
    """
    from collections import Counter

    pattern = _TOKEN_RE
    counts: Counter[str] = Counter()
    for text in texts:
        if lowercase:
            text = text.lower()
        counts.update(pattern.findall(text))
    keep = max(vocab_size - NUM_RESERVED - oov_buckets, 0)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [token for token, _ in ranked[:keep]]


class VocabTokenizer:
    """Corpus-trained vocab tokenizer with hashed OOV buckets.

    Same fixed-shape batch surface as `HashingTokenizer`. Ids:
    PAD=0, CLS=1, vocab tokens at NUM_RESERVED + rank, and
    out-of-vocab tokens FNV-hashed into the trailing `oov_buckets` ids —
    OOV words stay (probabilistically) distinguishable instead of
    collapsing to one UNK, and encoding stays deterministic across
    runs/hosts. num_hashes > 1 (Bloom embedding ids) is a
    hashing-tokenizer feature; this class rejects it.

    A C++ fast path (native/tokenizer.cpp vocab_* ABI) accelerates batch
    encoding; this Python implementation is the reference and fallback.
    """

    def __init__(
        self,
        vocab: list[str],
        config: TokenizerConfig | None = None,
        **kwargs,
    ) -> None:
        if config is None:
            config = TokenizerConfig(**kwargs)
        self.config = TokenizerConfig.model_validate(config)
        if self.config.num_hashes != 1:
            msg = "VocabTokenizer supports num_hashes=1 only"
            raise ValueError(msg)
        if NUM_RESERVED + len(vocab) >= self.config.vocab_size:
            msg = (
                f"vocab of {len(vocab)} tokens leaves no OOV buckets in "
                f"vocab_size={self.config.vocab_size}"
            )
            raise ValueError(msg)
        self.vocab = list(vocab)
        self._ids = {
            token: NUM_RESERVED + rank for rank, token in enumerate(vocab)
        }
        self.oov_start = NUM_RESERVED + len(vocab)
        self.oov_buckets = self.config.vocab_size - self.oov_start
        self._native = None
        self._native_checked = False
        self._native_handle = None

    # -- persistence -----------------------------------------------------
    def save(self, path) -> None:
        import json
        import pathlib

        pathlib.Path(path).write_text(
            json.dumps({"vocab": self.vocab, "config": self.config.model_dump()})
        )

    @classmethod
    def load(cls, path) -> VocabTokenizer:
        import json
        import pathlib

        payload = json.loads(pathlib.Path(path).read_text())
        return cls(payload["vocab"], TokenizerConfig(**payload["config"]))

    # -- pure-python reference path ---------------------------------------
    def tokenize(self, text: str) -> list[str]:
        if self.config.lowercase:
            text = text.lower()
        return _TOKEN_RE.findall(text)

    def token_id(self, token: str) -> int:
        known = self._ids.get(token)
        if known is not None:
            return known
        return self.oov_start + fnv1a_64(token, _HASH_SEEDS[0]) % self.oov_buckets

    def encode(self, text: str, max_length: int | None = None) -> np.ndarray:
        max_length = max_length or self.config.max_length
        out = np.zeros(max_length, dtype=np.int32)
        pos = 0
        if self.config.add_cls:
            out[0] = CLS_ID
            pos = 1
        for token in self.tokenize(text):
            if pos >= max_length:
                break
            out[pos] = self.token_id(token)
            pos += 1
        return out

    # -- native fast path --------------------------------------------------
    def _get_native(self):
        if not self._native_checked:
            self._native_checked = True
            try:
                from xfmr_rec_tpu.native import tokenizer_native

                self._native_handle = tokenizer_native.vocab_create(self.vocab)
                self._native = tokenizer_native
            except Exception:  # noqa: BLE001 — fall back to python path
                self._native = None
        return self._native

    def encode_batch(
        self, texts: list[str], max_length: int | None = None
    ) -> np.ndarray:
        """Texts -> (batch, max_length) int32, 0-padded."""
        max_length = max_length or self.config.max_length
        native = self._get_native()
        if native is not None:
            return native.vocab_encode_batch(
                self._native_handle,
                texts,
                max_length=max_length,
                oov_start=self.oov_start,
                oov_buckets=self.oov_buckets,
                lowercase=self.config.lowercase,
                add_cls=self.config.add_cls,
            )
        out = np.zeros((len(texts), max_length), dtype=np.int32)
        for i, text in enumerate(texts):
            out[i] = self.encode(text, max_length)
        return out

    def __call__(self, texts: list[str]) -> np.ndarray:
        return self.encode_batch(texts)


class HashingTokenizer:
    """Stateless feature-hashing tokenizer producing fixed-shape batches."""

    def __init__(self, config: TokenizerConfig | None = None, **kwargs) -> None:
        if config is None:
            config = TokenizerConfig(**kwargs)
        self.config = TokenizerConfig.model_validate(config)
        if self.config.num_hashes > len(_HASH_SEEDS):
            msg = f"num_hashes must be <= {len(_HASH_SEEDS)}"
            raise ValueError(msg)
        self._native = None
        self._native_checked = False

    # -- pure-python reference path ------------------------------------
    def tokenize(self, text: str) -> list[str]:
        if self.config.lowercase:
            text = text.lower()
        return _TOKEN_RE.findall(text)

    def token_ids(self, token: str) -> list[int]:
        """`num_hashes` independent ids in [NUM_RESERVED, vocab_size)."""
        space = self.config.vocab_size - NUM_RESERVED
        return [
            NUM_RESERVED + fnv1a_64(token, _HASH_SEEDS[i]) % space
            for i in range(self.config.num_hashes)
        ]

    def encode(self, text: str, max_length: int | None = None) -> np.ndarray:
        """One text -> (max_length, num_hashes) int32, 0-padded."""
        max_length = max_length or self.config.max_length
        nh = self.config.num_hashes
        out = np.zeros((max_length, nh), dtype=np.int32)
        pos = 0
        if self.config.add_cls:
            out[0, :] = CLS_ID
            pos = 1
        for token in self.tokenize(text):
            if pos >= max_length:
                break
            out[pos, :] = self.token_ids(token)
            pos += 1
        return out

    def _encode_batch_python(
        self, texts: list[str], max_length: int
    ) -> np.ndarray:
        out = np.zeros(
            (len(texts), max_length, self.config.num_hashes), dtype=np.int32
        )
        for i, text in enumerate(texts):
            out[i] = self.encode(text, max_length)
        return out

    # -- native fast path ------------------------------------------------
    def _get_native(self):
        if not self._native_checked:
            self._native_checked = True
            try:
                from xfmr_rec_tpu.native import tokenizer_native

                self._native = tokenizer_native
            except Exception:  # noqa: BLE001 — fall back to python path
                self._native = None
        return self._native

    def encode_batch(
        self, texts: list[str], max_length: int | None = None
    ) -> np.ndarray:
        """Texts -> (batch, max_length, num_hashes) int32 (squeezed to
        (batch, max_length) when num_hashes == 1)."""
        max_length = max_length or self.config.max_length
        native = self._get_native()
        if native is not None:
            out = native.encode_batch(
                texts,
                max_length=max_length,
                num_hashes=self.config.num_hashes,
                vocab_size=self.config.vocab_size,
                lowercase=self.config.lowercase,
                add_cls=self.config.add_cls,
            )
        else:
            out = self._encode_batch_python(texts, max_length)
        if self.config.num_hashes == 1:
            return out[..., 0]
        return out

    def __call__(self, texts: list[str]) -> np.ndarray:
        return self.encode_batch(texts)
