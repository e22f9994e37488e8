"""Item-identity channels: ID embeddings, popularity bias, CF bag.

The reference README promises hashing-trick / hash / Bloom embeddings
(README.md:33-36) but its model layer has no ID tables at all — its
"matrix factorization" is a dual encoder over feature text (SURVEY §0).
These tests pin the contracts of the TPU-native realization
(models/history.py IdEmbed / TwoTowerModel item channels):

- IdEmbed: rn == 0 (padding / unknown item) contributes exactly zero,
  in every mode
- item_bias: item vectors grow a bias column, user/query vectors a
  constant-1 column, so every dot-product scorer computes dot + b_i
- CF bag: a train row's own positive is masked out of its bag (the
  bag otherwise = the user's full train history = the serving input)
- train/eval parity: token-path encode_user == corpus-gather fuse_user
  with ID embeddings and bag in play
- end-to-end: fit -> finite metrics -> recommend on the full stack
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xfmr_rec_tpu.data import DataConfig, RecDataModule
from xfmr_rec_tpu.data.prepare import prepare_movielens
from xfmr_rec_tpu.data.synthetic import generate_movielens
from xfmr_rec_tpu.models.encoder import ModelConfig
from xfmr_rec_tpu.models.history import (
    IdEmbed,
    TwoTowerModel,
    init_two_tower,
    needs_two_tower,
    uses_item_ids,
)
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

TINY = dict(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=32,
    vocab_size=500,
    max_position_embeddings=32,
    max_length=16,
    compute_dtype="float32",
)
FULL_STACK = dict(
    user_tower="history",
    max_history=4,
    item_id_embedding="bloom",
    item_id_buckets=256,
    item_bias=True,
    max_bag=16,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("iddata")
    generate_movielens(
        path, num_users=40, num_movies=100, num_ratings=1000, seed=5
    )
    prepare_movielens(str(path), overwrite=True)
    return str(path)


@pytest.fixture(scope="module")
def dm(data_dir):
    dm = RecDataModule(
        DataConfig(
            data_dir=data_dir,
            batch_size=8,
            max_length=16,
            vocab_size=500,
            max_history=4,
            max_bag=16,
        )
    )
    dm.prepare_data()
    dm.setup()
    return dm


class TestIdEmbed:
    @pytest.mark.parametrize("mode", ["bloom", "hash", "dense"])
    def test_rn_zero_is_exactly_zero(self, mode):
        import jax

        table = IdEmbed(
            mode=mode, num_buckets=64, num_hashes=2, features=8
        )
        rns = jnp.asarray([0, 1, 5, 0, 63])
        params = table.init(jax.random.PRNGKey(0), rns)
        out = np.asarray(table.apply(params, rns))
        np.testing.assert_array_equal(out[0], 0.0)
        np.testing.assert_array_equal(out[3], 0.0)
        assert np.abs(out[1]).sum() > 0  # real ids embed to something

    @pytest.mark.parametrize("mode", ["bloom", "hash", "dense"])
    def test_deterministic_per_id(self, mode):
        import jax

        table = IdEmbed(
            mode=mode, num_buckets=64, num_hashes=2, features=8
        )
        rns = jnp.asarray([7, 7, 9])
        params = table.init(jax.random.PRNGKey(1), rns)
        out = np.asarray(table.apply(params, rns))
        np.testing.assert_array_equal(out[0], out[1])
        assert np.abs(out[0] - out[2]).sum() > 0


class TestCompressedTableAtLargeVocab:
    """Pins the compressed-table contract in the regime it exists for
    (BASELINE config 4: 10M-item corpora): parameter memory scales
    with BUCKETS, not vocab, and multi-million rns embed correctly."""

    @pytest.mark.parametrize("mode", ["bloom", "hash"])
    def test_param_bytes_independent_of_vocab(self, mode):
        import jax

        table = IdEmbed(
            mode=mode, num_buckets=2**14, num_hashes=2, features=32
        )
        rns = jnp.asarray([1, 9_999_999, 5_000_000, 0])
        params = table.init(jax.random.PRNGKey(0), rns)
        leaves = jax.tree_util.tree_leaves(params)
        total = sum(leaf.size * leaf.dtype.itemsize for leaf in leaves)
        table_bytes = 2**14 * 32 * 4  # buckets x dim x f32 — no 10M row
        assert table_bytes <= total <= int(1.1 * table_bytes)
        # and byte-identical params for a tiny-vocab init: size depends
        # on buckets only, never on the id range
        params_small = table.init(
            jax.random.PRNGKey(0), jnp.asarray([1, 2, 3, 0])
        )
        small_total = sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(params_small)
        )
        assert small_total == total
        out = np.asarray(table.apply(params, rns))
        np.testing.assert_array_equal(out[3], 0.0)  # rn 0 stays zero
        # distinct huge rns map to distinct embeddings (whp)
        assert np.abs(out[0] - out[1]).max() > 1e-6
        assert np.abs(out[1] - out[2]).max() > 1e-6

    def test_bloom_collision_rate_at_scale(self):
        """2 hashes over 2^18 buckets: full bucket-pair collisions for
        distinct ids must be rare (the Bloom premise) — measured over
        20k ids spread across a 10M-id space."""
        import jax

        table = IdEmbed(
            mode="bloom", num_buckets=2**18, num_hashes=2, features=8
        )
        rns = jnp.asarray(
            np.random.default_rng(0).choice(
                10_000_000, size=20_000, replace=False
            )
            + 1
        )
        params = table.init(jax.random.PRNGKey(0), rns)
        out = np.asarray(table.apply(params, rns))
        # identical embeddings == full collision (exact bytes: distinct
        # bucket pairs give bit-distinct sums almost surely)
        uniq = len({row.tobytes() for row in out})
        assert uniq > 19_500  # <2.5% full-collision rate at 20k/10M ids


    def test_train_step_grads_at_10m_vocab(self):
        """End-to-end training contract at BASELINE-config-4 scale: a
        two-tower model with a bloom ID table over 2^18 buckets takes a
        gradient step against item rns drawn from a 10M-id space —
        finite loss, gradients land in the bucket table (only at the
        touched buckets), and the text tower still trains."""
        import jax

        config = ModelConfig(
            **{
                **TINY,
                "item_id_embedding": "bloom",
                "item_id_buckets": 2**18,
            }
        )
        model, params = init_two_tower(config, rng=0)
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(
            rng.integers(2, TINY["vocab_size"], size=(4, TINY["max_length"])),
            jnp.int32,
        )
        rns = jnp.asarray(
            rng.choice(10_000_000, size=4, replace=False) + 1
        )

        def loss_fn(p):
            emb = model.apply(
                {"params": p}, tokens, rns, method=model.encode_items
            )
            return jnp.sum(emb * jnp.roll(emb, 1, axis=0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        bucket_grad = np.asarray(grads["item_id"]["buckets"]["embedding"])
        touched = np.flatnonzero(np.abs(bucket_grad).max(axis=1) > 0)
        # 4 items x 2 hashes = at most 8 touched bucket rows, >= 1
        assert 1 <= len(touched) <= 8
        text_grads = jax.tree_util.tree_leaves(grads["text"])
        assert any(np.abs(np.asarray(g)).max() > 0 for g in text_grads)


class TestConfigGates:
    def test_bag_requires_history_tower(self):
        with pytest.raises(ValueError, match="user_tower"):
            ModelConfig(max_bag=8, item_id_embedding="bloom")

    def test_bag_requires_id_table(self):
        with pytest.raises(ValueError, match="item_id_embedding"):
            ModelConfig(max_bag=8, user_tower="history")

    def test_needs_two_tower_dispatch(self):
        assert not needs_two_tower(ModelConfig())
        assert needs_two_tower(ModelConfig(item_bias=True))
        assert needs_two_tower(ModelConfig(item_id_embedding="hash"))
        assert needs_two_tower(ModelConfig(user_tower="history"))
        assert uses_item_ids(ModelConfig(item_bias=True))
        assert not uses_item_ids(ModelConfig(user_tower="history"))

    def test_dense_bounds_checked_against_corpus(self, data_dir, tmp_path):
        trainer = Trainer(
            TrainConfig(
                **TINY, item_id_embedding="dense", item_id_buckets=10
            ),
            data=RecDataModule(
                DataConfig(
                    data_dir=data_dir,
                    batch_size=8,
                    max_length=16,
                    vocab_size=500,
                )
            ),
            trainer_config=TrainerConfig(
                max_steps=1, log_dir=str(tmp_path), mesh=False
            ),
        )
        with pytest.raises(ValueError, match="item_id_buckets"):
            trainer.setup()


class TestBiasColumn:
    def _model(self, **extra):
        cfg = TrainConfig(**TINY, item_bias=True, **extra)
        return init_two_tower(cfg, rng=0)

    def test_item_vectors_gain_bias_column(self):
        model, params = self._model(item_id_embedding="bloom")
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(1, 400, size=(5, 16)),
            dtype=jnp.int32,
        )
        rns = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
        out = np.asarray(
            model.apply(
                {"params": params}, tokens, rns, method="encode_items"
            )
        )
        assert out.shape == (5, 33)
        # the d-dim part stays unit-norm; the bias column is separate
        np.testing.assert_allclose(
            np.linalg.norm(out[:, :32], axis=1), 1.0, atol=1e-5
        )

    def test_bias_starts_at_zero(self):
        model, params = self._model(item_id_embedding="bloom")
        tokens = jnp.ones((3, 16), jnp.int32)
        rns = jnp.asarray([1, 2, 3], jnp.int32)
        out = np.asarray(
            model.apply(
                {"params": params}, tokens, rns, method="encode_items"
            )
        )
        np.testing.assert_array_equal(out[:, 32], 0.0)

    def test_score_is_dot_plus_bias(self):
        """With a hand-planted bias column, index search must rank by
        dot + b_i — the constant-1 user column turns every dot-product
        scorer into a biased scorer with zero kernel changes."""
        from xfmr_rec_tpu.index.mips import RetrievalIndex

        rng = np.random.default_rng(7)
        d = 16
        items_d = rng.normal(size=(50, d)).astype(np.float32)
        items_d /= np.linalg.norm(items_d, axis=1, keepdims=True)
        bias = rng.normal(scale=0.3, size=(50, 1)).astype(np.float32)
        corpus = np.concatenate([items_d, bias], axis=1)
        idx = RetrievalIndex(
            corpus, np.arange(1, 51), dtype="float32", method="dense"
        )
        q = rng.normal(size=(4, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q1 = np.concatenate([q, np.ones((4, 1), np.float32)], axis=1)
        scores, ids = idx.search(q1, top_k=5)
        manual = q @ items_d.T + bias[:, 0][None, :]
        for b in range(4):
            expect = np.argsort(-manual[b])[:5] + 1
            np.testing.assert_array_equal(ids[b], expect)
            np.testing.assert_allclose(
                scores[b], np.sort(manual[b])[::-1][:5], atol=1e-5
            )


class TestBagSemantics:
    def test_train_bag_masks_own_positive(self, dm):
        """The row's positive must never appear in its own bag (FISM
        convention: the bag would otherwise contain the answer)."""
        checked = 0
        for batch in dm.train_batches(epoch=0):
            ipos = batch["item_idx"][: len(batch["user_tokens"])] - 1
            bag_rns = batch["bag_rns"]
            bag_mask = batch["bag_mask"]
            for row in range(len(ipos)):
                own_rn = int(ipos[row]) + 1
                live = bag_rns[row][bag_mask[row]]
                assert own_rn not in live
                checked += 1
            if checked > 200:
                break
        assert checked > 0

    def test_eval_bag_is_full_train_history(self, dm):
        batch = next(dm.eval_batches("val"))
        upos = batch["user_pos"]
        for row in range(4):
            u = int(upos[row])
            train_items = dm._train_items_by_user.get(u, [])
            expect = {p + 1 for p in train_items[-dm.config.max_bag :]}
            live = set(
                batch["bag_rns"][row][batch["bag_mask"][row]].tolist()
            )
            assert live == expect

    def test_bag_changes_user_embedding(self):
        cfg = TrainConfig(**TINY, **FULL_STACK)
        model, params = init_two_tower(cfg, rng=0)
        rng = np.random.default_rng(3)
        text = rng.normal(size=(2, 32)).astype(np.float32)
        text /= np.linalg.norm(text, axis=1, keepdims=True)
        hist = rng.normal(size=(2, 4, 32)).astype(np.float32)
        hmask = np.ones((2, 4), bool)
        hrat = np.ones((2, 4), np.int32)
        bag_a = np.arange(1, 33, dtype=np.int32).reshape(2, 16)
        bag_b = np.arange(33, 65, dtype=np.int32).reshape(2, 16)
        bmask = np.ones((2, 16), bool)
        brat = np.full((2, 16), 4, np.int32)

        def fuse(bag):
            return np.asarray(
                model.apply(
                    {"params": params},
                    jnp.asarray(text),
                    jnp.asarray(hist),
                    jnp.asarray(hmask),
                    jnp.asarray(hrat),
                    jnp.asarray(bag),
                    jnp.asarray(brat),
                    jnp.asarray(bmask),
                    method="fuse_user",
                )
            )

        assert np.abs(fuse(bag_a) - fuse(bag_b)).max() > 1e-6

    def test_empty_bag_slot_masked_no_nan(self):
        cfg = TrainConfig(**TINY, **FULL_STACK)
        model, params = init_two_tower(cfg, rng=0)
        text = np.ones((1, 32), np.float32) / np.sqrt(32)
        hist = np.zeros((1, 4, 32), np.float32)
        out = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(text),
                jnp.asarray(hist),
                jnp.zeros((1, 4), bool),
                jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 16), jnp.int32),
                jnp.zeros((1, 16), jnp.int32),
                jnp.zeros((1, 16), bool),
                method="fuse_user",
            )
        )
        assert np.isfinite(out).all()


class TestTrainEvalParity:
    def test_token_path_matches_corpus_gather_with_ids(self):
        """encode_user (token path, training) must equal fuse_user over
        corpus-gathered embeddings (eval/serving path) when the corpus
        rows are this model's own encode_items outputs — including the
        ID components and the bag."""
        cfg = TrainConfig(**TINY, **FULL_STACK)
        model, params = init_two_tower(cfg, rng=0)
        rng = np.random.default_rng(11)
        n_items = 20
        corpus_tokens = rng.integers(1, 400, size=(n_items, 16)).astype(
            np.int32
        )
        corpus_rns = np.arange(1, n_items + 1, dtype=np.int32)
        corpus = model.apply(
            {"params": params},
            jnp.asarray(corpus_tokens),
            jnp.asarray(corpus_rns),
            method="encode_items",
        )
        corpus_d = corpus[:, :32]  # fusion consumes the d-dim part

        user_tokens = rng.integers(1, 400, size=(3, 16)).astype(np.int32)
        positions = rng.integers(0, n_items, size=(3, 4)).astype(np.int32)
        mask = np.array(
            [[True] * 4, [True, True, False, False], [False] * 4]
        )
        ratings = rng.integers(1, 6, size=(3, 4)).astype(np.int32)
        hist_tokens = corpus_tokens[positions] * mask[..., None]
        hist_rns = ((positions + 1) * mask).astype(np.int32)
        bag_rns = rng.integers(1, n_items + 1, size=(3, 16)).astype(
            np.int32
        )
        bag_ratings = rng.integers(1, 6, size=(3, 16)).astype(np.int32)
        bag_mask = rng.random((3, 16)) < 0.7

        token_path = model.apply(
            {"params": params},
            jnp.asarray(user_tokens),
            jnp.asarray(hist_tokens),
            jnp.asarray(mask),
            jnp.asarray(ratings),
            jnp.asarray(hist_rns),
            jnp.asarray(bag_rns),
            jnp.asarray(bag_ratings),
            jnp.asarray(bag_mask),
            method="encode_user",
        )
        gather_path = model.apply(
            {"params": params},
            model.apply(
                {"params": params}, jnp.asarray(user_tokens)
            ),
            jnp.take(
                corpus_d, jnp.asarray(np.where(mask, positions, 0)), axis=0
            ),
            jnp.asarray(mask),
            jnp.asarray(ratings),
            jnp.asarray(bag_rns),
            jnp.asarray(bag_ratings),
            jnp.asarray(bag_mask),
            method="fuse_user",
        )
        np.testing.assert_allclose(
            np.asarray(token_path), np.asarray(gather_path), atol=1e-5
        )
        # user vectors carry the constant-1 bias-pairing column
        out = np.asarray(token_path)
        assert out.shape[1] == 33
        np.testing.assert_allclose(out[:, 32], 1.0, atol=1e-6)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, data_dir, tmp_path_factory):
        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                max_length=16,
                vocab_size=500,
            )
        )
        trainer = Trainer(
            TrainConfig(
                **TINY,
                **FULL_STACK,
                train_loss="InfomationNoiseContrastiveEstimationLoss",
            ),
            data=dm,
            trainer_config=TrainerConfig(
                max_steps=10,
                log_dir=str(tmp_path_factory.mktemp("idruns")),
                limit_val_batches=2,
                mesh=False,
            ),
        )
        metrics = trainer.fit()
        return trainer, metrics

    def test_fit_metrics_finite(self, trained):
        _, metrics = trained
        for key, value in metrics.items():
            assert np.isfinite(value), f"{key} = {value}"

    def test_corpus_has_bias_column(self, trained):
        trainer, _ = trained
        assert trainer.index.corpus.shape[1] == 33
        assert trainer._corpus_f32.shape[1] == 32

    def test_eval_user_embeddings_shape_and_one_column(self, trained):
        trainer, _ = trained
        users = trainer.eval_user_embeddings(np.arange(6))
        assert users.shape == (6, 33)
        np.testing.assert_allclose(users[:, 32], 1.0, atol=1e-6)

    def test_recommend_users(self, trained):
        trainer, _ = trained
        recs = trainer.recommend_users(np.arange(3), top_k=5)
        assert len(recs) == 3
        assert all(len(r) == 5 for r in recs)

    def test_raw_text_recommend_appends_one(self, trained):
        trainer, _ = trained
        recs = trainer.recommend(['{"title":"Movie"}'], top_k=5)
        assert len(recs[0]) == 5

    def test_serving_bag_matches_trainer_eval(
        self, trained, tmp_path_factory
    ):
        """The packaged serving path must build the CF bag from the
        user's history (round-4 advisor high finding: it silently
        dropped the trained bag slot, so serving embeddings diverged
        from the trainer's eval embeddings for max_bag>0 artifacts).
        A user query carrying the user's full train history must
        reproduce the trainer's eval embedding bit-for-bit-close."""
        from xfmr_rec_tpu.serving.engine import RecommenderEngine
        from xfmr_rec_tpu.serving.schemas import Activity, UserQuery

        trainer, _ = trained
        dm = trainer.data
        path = tmp_path_factory.mktemp("bagart") / "model"
        trainer.save(path)
        engine = RecommenderEngine(path, warmup=False)
        assert engine.model_config.max_bag > 0

        # a user whose train history fills >= max_history slots and
        # fits inside the bag (so provided-history == table contents)
        upos = next(
            u
            for u, items in sorted(dm._train_items_by_user.items())
            if trainer.config.max_history
            <= len(items)
            <= trainer.config.max_bag
        )
        bag_pos = dm.user_bag_pos[upos]
        valid = bag_pos >= 0
        # bag tables are most-recent-first; serve entries oldest-first
        # with ascending datetimes so the engine's most-recent-first
        # reconstruction visits them in the same order
        positions = bag_pos[valid][::-1]
        ratings = dm.user_bag_rating[upos][valid][::-1]
        history = [
            Activity(
                movie_id=int(dm.item_ids[p]),
                rating=int(r),
                datetime=j,
                movie_rn=int(p) + 1,
                movie_text="",
            )
            for j, (p, r) in enumerate(zip(positions, ratings))
        ]
        served = np.asarray(
            engine.embed_user_query(
                UserQuery(
                    user_id=int(dm.user_ids[upos]),
                    user_text=dm.user_texts[upos],
                    history=history,
                )
            ).embedding
        )
        expect = trainer.eval_user_embeddings(np.asarray([upos]))[0]
        assert served.shape == expect.shape
        # corpus.npz stores bf16-rounded embeddings, so the serving
        # history gather differs from the trainer's f32 corpus by up to
        # ~2^-9 relative — 2e-3 passes that and still fails hard when
        # the bag slot is dropped (the fusion topology changes)
        np.testing.assert_allclose(served, expect, atol=2e-3)

        # and the bag slot is LIVE: an empty-history query must embed
        # differently, and farther from the trainer's eval embedding
        # than the full-history one (before the fix they were equal)
        empty = np.asarray(
            engine.embed_user_query(
                UserQuery(
                    user_id=int(dm.user_ids[upos]),
                    user_text=dm.user_texts[upos],
                )
            ).embedding
        )
        assert np.abs(served - empty).max() > 1e-3
        assert (
            np.abs(served - expect).max() < np.abs(empty - expect).max()
        )


class TestDenseBagLiveAdd:
    """Live-added items must NOT reach a dense ID-table bag slot.

    add_items extends the engine's position map past the trained dense
    table; the gather's clip mode would silently alias every such rn to
    the LAST trained item's embedding (round-5 review finding). The
    guard treats beyond-table rns as unknown for the bag while the
    history slots still use the (extended) corpus embedding.
    """

    @pytest.fixture(scope="class")
    def dense_engine(self, data_dir, tmp_path_factory):
        from xfmr_rec_tpu.serving.engine import RecommenderEngine

        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                max_length=16,
                vocab_size=500,
                max_history=4,
                max_bag=16,
            )
        )
        trainer = Trainer(
            TrainConfig(
                **TINY,
                user_tower="history",
                max_history=4,
                item_id_embedding="dense",
                item_id_buckets=101,  # num_movies + 1
                max_bag=16,
            ),
            data=dm,
            trainer_config=TrainerConfig(
                max_steps=4,
                log_dir=str(tmp_path_factory.mktemp("denseruns")),
                limit_val_batches=1,
                mesh=False,
            ),
        )
        trainer.fit()
        path = tmp_path_factory.mktemp("denseart") / "model"
        trainer.save(path)
        return RecommenderEngine(path, warmup=False)

    def test_added_item_skips_dense_bag(self, dense_engine):
        from xfmr_rec_tpu.serving.schemas import Activity, ItemQuery, UserQuery

        engine = dense_engine
        user_text = '{"gender":"F","age":30,"occupation":1,"zipcode":"12345"}'
        engine.add_items(
            [ItemQuery(movie_id=900100, movie_text='{"title":"Live Item"}')]
        )
        new_pos = engine._hist_pos_of_id[900100]
        assert new_pos + 1 >= engine.model_config.item_id_buckets

        history = [
            Activity(
                movie_id=900100,
                rating=5,
                datetime=1,
                movie_rn=0,
                movie_text="",
            )
        ]
        served = np.asarray(
            engine.embed_user_query(
                UserQuery(user_id=0, user_text=user_text, history=history)
            ).embedding
        )

        # expected: hist slot uses the live-added corpus embedding, bag
        # slot fully masked — build the fuse inputs by hand
        tokens = engine.tokenizer.encode_batch([user_text])
        H = engine.model_config.max_history
        B = engine.model_config.max_bag
        hist_pos = np.zeros((1, H), np.int32)
        hist_mask = np.zeros((1, H), bool)
        hist_rat = np.zeros((1, H), np.int32)
        hist_pos[0, 0] = new_pos
        hist_mask[0, 0] = True
        hist_rat[0, 0] = 5
        expect = np.asarray(
            engine._fuse_user(
                engine.params,
                tokens,
                engine._hist_corpus,
                hist_pos,
                hist_mask,
                hist_rat,
                np.zeros((1, B), np.int32),
                np.zeros((1, B), np.int32),
                np.zeros((1, B), bool),
            )
        )[0]
        width = expect.shape[0]
        np.testing.assert_allclose(served[:width], expect, atol=1e-5)
