"""Native C++ tokenizer: byte-exact parity with the Python reference path."""

import numpy as np
import pytest

from xfmr_rec_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig

native = pytest.importorskip("xfmr_rec_tpu.native.tokenizer_native")

CASES = [
    "",
    "hello world",
    '{"title":"Toy Story (1995)","genres":["Animation","Children\'s","Comedy"]}',
    '{"gender":"F","age":1,"occupation":10,"zipcode":"48067"}',
    "don't stop CAN'T won't a'b'c x'9 'lead trail'",
    "UPPER lower MiXeD 123 4you",
    "unicode: café straße 日本語 emoji \U0001f600 end",
    "a" * 500 + " tail",
    "  !!! ??? ###   ",
    "apostrophe' at'end o'",
]


def python_path(tok, texts, max_length):
    return tok._encode_batch_python(texts, max_length)


class TestNativeParity:
    @pytest.mark.parametrize("num_hashes", [1, 2, 4])
    def test_byte_exact_vs_python(self, num_hashes):
        tok = HashingTokenizer(
            TokenizerConfig(
                vocab_size=30522, max_length=32, num_hashes=num_hashes
            )
        )
        want = python_path(tok, CASES, 32)
        got = native.encode_batch(
            CASES,
            max_length=32,
            num_hashes=num_hashes,
            vocab_size=30522,
            lowercase=True,
            add_cls=True,
        )
        np.testing.assert_array_equal(got, want)

    def test_no_cls_no_lowercase(self):
        tok = HashingTokenizer(
            TokenizerConfig(
                vocab_size=1000, max_length=16, add_cls=False, lowercase=False
            )
        )
        texts = ["lower only TOKENS here", "don't"]
        want = python_path(tok, texts, 16)
        got = native.encode_batch(
            texts,
            max_length=16,
            num_hashes=1,
            vocab_size=1000,
            lowercase=False,
            add_cls=False,
        )
        np.testing.assert_array_equal(got, want)

    def test_tokenizer_uses_native_when_available(self):
        tok = HashingTokenizer(TokenizerConfig(vocab_size=500, max_length=16))
        assert tok._get_native() is not None
        out = tok.encode_batch(CASES)
        want = python_path(tok, CASES, 16)[..., 0]
        np.testing.assert_array_equal(out, want)

    def test_native_is_faster(self):
        import time

        tok = HashingTokenizer(TokenizerConfig(vocab_size=30522, max_length=64))
        texts = CASES * 200
        t0 = time.perf_counter()
        native.encode_batch(
            texts, max_length=64, num_hashes=1, vocab_size=30522,
            lowercase=True, add_cls=True,
        )
        native_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        python_path(tok, texts, 64)
        python_time = time.perf_counter() - t0
        assert native_time < python_time
