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


class TestVocabTokenizer:
    """Corpus-vocab tokenizer: python/native parity + persistence."""

    def _tok(self, **kwargs):
        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        vocab = ["the", "story", "toy", "comedy", "animation", "1995",
                 "children's", "f", "m", "age"]
        return VocabTokenizer(
            vocab,
            TokenizerConfig(vocab_size=64, max_length=16, **kwargs),
        )

    def test_known_tokens_get_rank_ids(self):
        tok = self._tok()
        ids = tok.encode("the toy story")
        # CLS, then rank ids (NUM_RESERVED + rank)
        assert ids[0] == 1
        assert list(ids[1:4]) == [2, 2 + 2, 2 + 1]

    def test_oov_tokens_hash_into_tail_buckets(self):
        tok = self._tok()
        ids = tok.encode("zzzzz qqqqq")
        assert (ids[1:3] >= tok.oov_start).all()
        assert (ids[1:3] < tok.config.vocab_size).all()
        # deterministic
        np.testing.assert_array_equal(ids, tok.encode("zzzzz qqqqq"))

    def test_native_matches_python(self):
        tok = self._tok()
        texts = [
            "The Toy Story (1995) comedy",
            "unknown wørds éverywhere",
            "don't can't o' age AGE",
            "",
            "a" * 200,
        ]
        want = np.stack([tok.encode(t, 16) for t in texts])
        assert tok._get_native() is not None, "native path must load"
        got = tok.encode_batch(texts, 16)
        np.testing.assert_array_equal(got, want)

    def test_save_load_round_trip(self, tmp_path):
        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        tok = self._tok()
        tok.save(tmp_path / "vocab.json")
        tok2 = VocabTokenizer.load(tmp_path / "vocab.json")
        texts = ["the story of a toy", "novel words"]
        np.testing.assert_array_equal(
            tok.encode_batch(texts), tok2.encode_batch(texts)
        )

    def test_build_vocab_frequency_ranked(self):
        from xfmr_rec_tpu.models.tokenizer import build_vocab

        vocab = build_vocab(
            ["b b b a a c", "a d", "b"], vocab_size=8, oov_buckets=2
        )
        # top (8 - 2 reserved - 2 oov) = 4 by count desc, ties lexicographic
        assert vocab == ["b", "a", "c", "d"]

    def test_rejects_num_hashes(self):
        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        with pytest.raises(ValueError, match="num_hashes"):
            VocabTokenizer(
                ["a"], TokenizerConfig(vocab_size=8, num_hashes=2)
            )

    def test_rejects_vocab_larger_than_id_space(self):
        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        with pytest.raises(ValueError, match="OOV"):
            VocabTokenizer(
                [f"t{i}" for i in range(7)], TokenizerConfig(vocab_size=8)
            )


class TestNativeBM25:
    """C++ BM25 (native/bm25.cpp) vs the Python oracle (index/mips.py).

    The reference's FTS is LanceDB's native Rust engine
    (data/lightning.py:221,298); here the native/Python pair must agree
    on tokenization, scoring (to float rounding) and ranking."""

    DOCS = [
        {"text": '{"title": "Toy Story (1995)", "genres": ["Animation"]}'},
        {"text": '{"title": "Heat (1995)", "genres": ["Action", "Crime"]}'},
        {"text": '{"title": "Toy Story 2 (1999)", "genres": ["Animation"]}'},
        {"text": "CASE insensitive MiXeD 42 tokens-with punct!!"},
        {"text": ""},
        {"text": "story story story story"},
    ]

    @pytest.fixture(scope="class")
    def pair(self):
        from xfmr_rec_tpu.index.mips import BM25Index

        py = BM25Index(list(self.DOCS), text_col="text", native=False)
        native = BM25Index(list(self.DOCS), text_col="text", native=True)
        assert native._native is not None
        return py, native

    @pytest.mark.parametrize(
        "query",
        [
            "toy story",
            "heat",
            "animation 1995",
            "STORY",
            "nonexistent token",
            "42 punct",
            "",
            "story toy story heat",
        ],
    )
    def test_matches_python_oracle(self, pair, query):
        py, native = pair
        want = py.search(query, top_k=6)
        got = native.search(query, top_k=6)
        assert [r for r, _ in got] == [r for r, _ in want], (query, got, want)
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-5, atol=1e-6
        )

    def test_randomized_corpus_agrees(self):
        from xfmr_rec_tpu.index.mips import BM25Index

        rng = np.random.default_rng(0)
        vocab = [f"w{i}" for i in range(50)]
        docs = [
            {"t": " ".join(rng.choice(vocab, size=rng.integers(1, 30)))}
            for _ in range(200)
        ]
        py = BM25Index(docs, text_col="t", native=False)
        native = BM25Index(docs, text_col="t", native=True)
        for seed in range(20):
            q_rng = np.random.default_rng(seed)
            query = " ".join(q_rng.choice(vocab, size=3))
            want = py.search(query, top_k=10)
            got = native.search(query, top_k=10)
            # identical rows except where adjacent scores collide at
            # float rounding; scores must agree everywhere
            np.testing.assert_allclose(
                [s for _, s in got],
                [s for _, s in want],
                rtol=1e-5,
                atol=1e-6,
            )
            assert {r for r, _ in got} == {r for r, _ in want}, query

    def test_topk_truncation_and_positive_only(self, pair):
        _, native = pair
        out = native.search("story", top_k=2)
        assert len(out) == 2
        assert all(s > 0 for _, s in out)
        # doc 5 repeats "story" 4x but is short; ranking must be BM25's,
        # not raw tf: saturation keeps it comparable to title docs
        everything = native.search("story", top_k=10)
        assert {r for r, _ in everything} == {0, 2, 5}

    def test_explicit_native_unavailable_raises(self, monkeypatch):
        from xfmr_rec_tpu.index.mips import BM25Index
        from xfmr_rec_tpu.native import bm25_native

        monkeypatch.setattr(bm25_native, "available", lambda: False)
        with pytest.raises(RuntimeError, match="native BM25"):
            BM25Index(list(self.DOCS), text_col="text", native=True)
        # default silently falls back
        idx = BM25Index(list(self.DOCS), text_col="text")
        assert idx._native is None
        assert idx.search("toy", top_k=2)
