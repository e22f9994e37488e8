"""Tokenizer + encoder behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmr_rec_tpu.models import (
    HashingTokenizer,
    ModelConfig,
    TextEncoder,
    init_encoder,
)
from xfmr_rec_tpu.models.tokenizer import CLS_ID, NUM_RESERVED

TINY = dict(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=32,
    max_position_embeddings=64,
    max_length=16,
    vocab_size=1000,
    compute_dtype="float32",
)

ITEM_TEXT = '{"title":"Toy Story (1995)","genres":["Animation","Children\'s","Comedy"]}'
USER_TEXT = '{"gender":"F","age":1,"occupation":10,"zipcode":"48067"}'


class TestTokenizer:
    def test_deterministic(self):
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        a = tok.encode_batch([ITEM_TEXT, USER_TEXT])
        b = tok.encode_batch([ITEM_TEXT, USER_TEXT])
        np.testing.assert_array_equal(a, b)

    def test_shapes_and_padding(self):
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        ids = tok.encode_batch(["", "hello world"])
        assert ids.shape == (2, 16)
        assert ids[0, 0] == CLS_ID
        assert (ids[0, 1:] == 0).all()  # empty text: only CLS
        assert ids[1, 1] != 0 and ids[1, 2] != 0
        assert (ids[1, 3:] == 0).all()

    def test_ids_in_range(self):
        tok = HashingTokenizer(vocab_size=50, max_length=32)
        ids = tok.encode_batch([ITEM_TEXT])
        assert ids.max() < 50
        real = ids[ids >= NUM_RESERVED]
        assert len(real) > 0

    def test_same_token_same_id(self):
        tok = HashingTokenizer(vocab_size=1000, max_length=8)
        a = tok.encode_batch(["comedy"])
        b = tok.encode_batch(["drama comedy"])
        assert a[0, 1] == b[0, 2]

    def test_truncation(self):
        tok = HashingTokenizer(vocab_size=1000, max_length=4)
        ids = tok.encode_batch(["a b c d e f g h"])
        assert ids.shape == (1, 4)
        assert (ids != 0).all()

    def test_multi_hash(self):
        tok = HashingTokenizer(vocab_size=1000, max_length=8, num_hashes=2)
        ids = tok.encode_batch(["comedy drama"])
        assert ids.shape == (1, 8, 2)
        # different hash functions give (almost surely) different ids
        assert ids[0, 1, 0] != ids[0, 1, 1]


class TestEncoder:
    @pytest.fixture(scope="class")
    def setup(self):
        config = ModelConfig(**TINY)
        model, params = init_encoder(config, rng=0)
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        return config, model, params, tok

    def test_output_shape_and_unit_norm(self, setup):
        config, model, params, tok = setup
        ids = tok.encode_batch([ITEM_TEXT, USER_TEXT, ""])
        out = model.apply({"params": params}, ids)
        assert out.shape == (3, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5
        )

    def test_padding_invariance(self, setup):
        """Extra padding must not change the embedding (mask correctness)."""
        config, model, params, tok = setup
        short = tok.encode_batch(["toy story"], max_length=8)
        long = tok.encode_batch(["toy story"], max_length=16)
        a = model.apply({"params": params}, short)
        b = model.apply({"params": params}, long)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_different_texts_different_embeddings(self, setup):
        config, model, params, tok = setup
        ids = tok.encode_batch([ITEM_TEXT, USER_TEXT])
        out = np.asarray(model.apply({"params": params}, ids))
        assert np.abs(out[0] - out[1]).max() > 1e-3

    def test_jit_and_grad(self, setup):
        config, model, params, tok = setup
        ids = tok.encode_batch([ITEM_TEXT, USER_TEXT])

        @jax.jit
        def loss_fn(p):
            out = model.apply({"params": p}, ids)
            return jnp.sum(out**2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)

    def test_dropout_stochastic_in_training(self, setup):
        config, model, params, tok = setup
        ids = tok.encode_batch([ITEM_TEXT])
        a = model.apply(
            {"params": params}, ids, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        b = model.apply(
            {"params": params}, ids, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6

    @pytest.mark.parametrize("pooling", ["mean", "max", "cls", "pooler"])
    def test_pooling_modes(self, pooling):
        config = ModelConfig(**{**TINY, "pooling_mode": pooling})
        model, params = init_encoder(config, rng=0)
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        ids = tok.encode_batch([ITEM_TEXT, USER_TEXT])
        out = model.apply({"params": params}, ids)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("etype", ["hash", "bloom"])
    def test_compressed_embeddings(self, etype):
        config = ModelConfig(
            **{**TINY, "embedding_type": etype, "num_buckets": 128,
               "num_hashes": 2}
        )
        model, params = init_encoder(config, rng=0)
        # compressed table: num_buckets x hidden instead of vocab x hidden
        assert params["word_embed"]["buckets"]["embedding"].shape == (128, 32)
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        ids = tok.encode_batch([ITEM_TEXT, USER_TEXT])
        out = model.apply({"params": params}, ids)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_remat_matches_plain(self):
        """remat=True recomputes layers (and dropout masks, same RNG
        replay) in the backward pass; loss and grads must match the
        stored-activation path up to XLA reassociation."""
        from xfmr_rec_tpu.models.tokenizer import HashingTokenizer

        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        ids = jnp.asarray(tok.encode_batch([ITEM_TEXT, USER_TEXT]))
        results = []
        for remat in (False, True):
            config = ModelConfig(**{**TINY, "remat": remat})
            model, params = init_encoder(config, rng=0)

            def loss_fn(p, model=model):
                emb = model.apply(
                    {"params": p},
                    ids,
                    deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)},
                )
                return jnp.sum(emb * emb[::-1])

            results.append(jax.jit(jax.value_and_grad(loss_fn))(params))
        (l0, g0), (l1, g1) = results
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_compressed_hashes_are_independent(self):
        """The two Bloom hashes over a power-of-two bucket count must
        induce DIFFERENT partitions of the token space. A bare
        `(id * m) % 2^k` keeps only the low k product bits, so every odd
        multiplier collides the same id pairs (id1-id2 divisible by 2^k)
        and the Bloom sum degrades to a single hash; the xor-fold of the
        high product bits breaks that (encoder.py CompressedEmbed,
        mirroring IdEmbed / tests/test_item_ids.py)."""
        from xfmr_rec_tpu.models.encoder import CompressedEmbed

        num_buckets = 2**13  # the default (8192), where the bug bites
        table = CompressedEmbed(
            vocab_size=2**20,
            num_buckets=num_buckets,
            num_hashes=2,
            features=8,
            mode="bloom",
        )
        # ids separated by exact multiples of num_buckets: the broken
        # hash maps each pair to ONE shared bucket pair -> identical rows
        base = jnp.asarray([7, 11, 13, 29], dtype=jnp.int32)
        ids = jnp.concatenate([base, base + num_buckets, base + 2 * num_buckets])
        params = table.init(jax.random.PRNGKey(0), ids)
        out = np.asarray(table.apply(params, ids))
        uniq = len({row.tobytes() for row in out})
        assert uniq == out.shape[0]

    def test_bloom_smaller_than_dense(self):
        dense = init_encoder(ModelConfig(**TINY), rng=0)[1]
        bloom = init_encoder(
            ModelConfig(**{**TINY, "embedding_type": "bloom",
                           "num_buckets": 64}),
            rng=0,
        )[1]
        n_dense = sum(x.size for x in jax.tree.leaves(dense))
        n_bloom = sum(x.size for x in jax.tree.leaves(bloom))
        assert n_bloom < n_dense

    def test_bf16_compute(self):
        config = ModelConfig(**{**TINY, "compute_dtype": "bfloat16"})
        model, params = init_encoder(config, rng=0)
        tok = HashingTokenizer(vocab_size=1000, max_length=16)
        ids = tok.encode_batch([ITEM_TEXT])
        out = model.apply({"params": params}, ids)
        assert out.dtype == jnp.float32  # output back in f32
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-2
        )
