"""History user tower: causal data tables, fusion semantics, end-to-end.

The reference ships an unwired PoolingTransformer over precomputed
embeddings (/root/reference/xfmr_rec/models.py:66-87) and a rolling
history feature its model never consumes (data/prepare.py:229-243).
models/history.py wires that seam; these tests pin its contracts:

- causal history tables: a train row's history is STRICTLY prior events,
  most-recent-first; the row's own positive never leaks into its input
- fusion mask contract: padded slots cannot affect the output
- train/eval numerics parity: token-path `encode_user` == corpus-gather
  `fuse_user` (the serving path re-uses corpus embeddings, not tokens)
- the all-PAD-history NaN regression (gradient-safe l2 normalize)
- end-to-end: fit -> artifact -> engine.embed_user_query / service
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmr_rec_tpu.data import DataConfig, RecDataModule
from xfmr_rec_tpu.data.prepare import prepare_movielens
from xfmr_rec_tpu.data.synthetic import generate_movielens
from xfmr_rec_tpu.models.encoder import ModelConfig, l2_normalize
from xfmr_rec_tpu.models.history import TwoTowerModel, init_two_tower
from xfmr_rec_tpu.training.module import (
    TrainConfig,
    compute_batch_losses,
    create_train_state,
    make_user_encode_fn,
)
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

TINY_MODEL = dict(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=32,
    vocab_size=500,
    max_position_embeddings=32,
    max_length=16,
    compute_dtype="float32",
)
HIST = dict(user_tower="history", max_history=4, history_layers=1)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("histdata")
    generate_movielens(
        path, num_users=40, num_movies=100, num_ratings=1000, seed=3
    )
    prepare_movielens(str(path), overwrite=True)
    return str(path)


@pytest.fixture(scope="module")
def dm(data_dir):
    dm = RecDataModule(
        DataConfig(
            data_dir=data_dir,
            batch_size=8,
            eval_batch_size=16,
            max_length=16,
            vocab_size=500,
            max_history=4,
        )
    )
    dm.setup()
    return dm


class TestHistoryTables:
    def test_train_history_is_strict_causal_prefix(self, dm):
        """Oracle: per-user in-order scan. Row j's history must be the
        user's items at j-1, j-2, ... (most-recent-first), -1 padded —
        independent of the vectorized block construction."""
        hist_len = dm.config.max_history
        seen: dict[int, list[int]] = {}
        seen_r: dict[int, list[int]] = {}
        for row in range(len(dm.train_user_pos)):
            u = int(dm.train_user_pos[row])
            prior = seen.get(u, [])
            prior_r = seen_r.get(u, [])
            expect = prior[::-1][:hist_len]
            expect_r = prior_r[::-1][:hist_len]
            got = dm.train_hist_pos[row]
            got_r = dm.train_hist_rating[row]
            np.testing.assert_array_equal(got[: len(expect)], expect)
            np.testing.assert_array_equal(got[len(expect) :], -1)
            np.testing.assert_array_equal(got_r[: len(expect_r)], expect_r)
            np.testing.assert_array_equal(got_r[len(expect_r) :], 0)
            seen.setdefault(u, []).append(int(dm.train_item_pos[row]))
            seen_r.setdefault(u, []).append(int(dm.train_rating[row]))

    def test_own_positive_never_in_history(self, dm):
        own = dm.train_item_pos[:, None] == dm.train_hist_pos
        assert not own.any()

    def test_user_history_is_train_tail(self, dm):
        """user_hist_pos[u] = the user's LAST max_history train items,
        most-recent-first — the causal prefix at the holdout boundary."""
        hist_len = dm.config.max_history
        for u in range(dm.num_users):
            rows = np.flatnonzero(dm.train_user_pos == u)
            expect = dm.train_item_pos[rows][::-1][:hist_len]
            got = dm.user_hist_pos[u]
            np.testing.assert_array_equal(got[: len(expect)], expect)
            np.testing.assert_array_equal(got[len(expect) :], -1)

    def test_batches_carry_history_fields(self, dm):
        hist_len = dm.config.max_history
        batch = next(dm.train_batches(0))
        assert batch["hist_tokens"].shape == (8, hist_len, 16)
        assert batch["hist_mask"].shape == (8, hist_len)
        assert batch["hist_ratings"].shape == (8, hist_len)
        # padded slots' tokens are zeroed (all-PAD rows)
        assert not batch["hist_tokens"][~batch["hist_mask"]].any()
        ebatch = next(dm.eval_interaction_batches("val"))
        assert ebatch["hist_tokens"].shape == (8, hist_len, 16)
        rbatch = next(dm.eval_batches("val"))
        assert rbatch["hist_positions"].shape[1] == hist_len
        assert (rbatch["hist_positions"] >= 0).all()
        # eval history rides user_hist (full train prefix per user)
        upos = rbatch["user_pos"]
        mask = dm.user_hist_pos[upos] >= 0
        np.testing.assert_array_equal(rbatch["hist_mask"], mask)
        np.testing.assert_array_equal(
            rbatch["hist_positions"][mask], dm.user_hist_pos[upos][mask]
        )

    def test_off_by_default(self, data_dir):
        dm = RecDataModule(
            DataConfig(data_dir=data_dir, max_length=16, vocab_size=500)
        )
        dm.setup()
        batch = next(dm.train_batches(0))
        assert "hist_tokens" not in batch
        assert not hasattr(dm, "train_hist_pos")


class TestFusionModel:
    @pytest.fixture(scope="class")
    def model_params(self):
        cfg = ModelConfig(**TINY_MODEL, **HIST)
        return init_two_tower(cfg, rng=0)

    def test_masked_slots_cannot_affect_output(self, model_params):
        model, params = model_params
        rng = np.random.default_rng(0)
        text = rng.normal(size=(3, 32)).astype(np.float32)
        hist = rng.normal(size=(3, 4, 32)).astype(np.float32)
        mask = np.array(
            [[True, True, False, False]] * 3
        )
        ratings = rng.integers(1, 6, size=(3, 4)).astype(np.int32)
        out1 = model.apply(
            {"params": params}, text, hist, mask, ratings, method="fuse_user"
        )
        hist2 = hist.copy()
        hist2[:, 2:] = 1e3 * rng.normal(size=(3, 2, 32))
        ratings2 = ratings.copy()
        ratings2[:, 2:] = 5
        out2 = model.apply(
            {"params": params},
            text,
            hist2,
            mask,
            ratings2,
            method="fuse_user",
        )
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-6
        )

    def test_history_changes_output(self, model_params):
        model, params = model_params
        rng = np.random.default_rng(1)
        text = rng.normal(size=(2, 32)).astype(np.float32)
        hist = rng.normal(size=(2, 4, 32)).astype(np.float32)
        none = np.zeros((2, 4), bool)
        some = np.array([[True, True, False, False]] * 2)
        out_none = model.apply(
            {"params": params}, text, hist, none, None, method="fuse_user"
        )
        out_some = model.apply(
            {"params": params}, text, hist, some, None, method="fuse_user"
        )
        assert float(jnp.abs(out_none - out_some).max()) > 1e-3

    def test_encode_user_matches_corpus_gather(self, model_params):
        """Token-path training tower == gather-path serving tower when the
        corpus rows are this encoder's own deterministic embeddings."""
        model, params = model_params
        rng = np.random.default_rng(2)
        corpus_tokens = rng.integers(1, 400, size=(10, 16)).astype(np.int32)
        corpus = model.apply(
            {"params": params}, jnp.asarray(corpus_tokens), deterministic=True
        )
        user_tokens = rng.integers(1, 400, size=(3, 16)).astype(np.int32)
        positions = rng.integers(0, 10, size=(3, 4)).astype(np.int32)
        mask = np.array([[True] * 4, [True, True, False, False], [False] * 4])
        ratings = rng.integers(1, 6, size=(3, 4)).astype(np.int32)
        hist_tokens = corpus_tokens[positions]
        hist_tokens = hist_tokens * mask[..., None]
        token_path = model.apply(
            {"params": params},
            jnp.asarray(user_tokens),
            jnp.asarray(hist_tokens),
            jnp.asarray(mask),
            jnp.asarray(ratings),
            method="encode_user",
        )
        gather = make_user_encode_fn(model)(
            params,
            jnp.asarray(user_tokens),
            corpus,
            jnp.asarray(np.where(mask, positions, 0)),
            jnp.asarray(mask),
            jnp.asarray(ratings),
        )
        np.testing.assert_allclose(
            np.asarray(token_path), np.asarray(gather), atol=1e-5
        )

    def test_unit_norm_output(self, model_params):
        model, params = model_params
        rng = np.random.default_rng(3)
        text = rng.normal(size=(4, 32)).astype(np.float32)
        hist = rng.normal(size=(4, 4, 32)).astype(np.float32)
        mask = rng.random((4, 4)) < 0.5
        out = model.apply(
            {"params": params}, text, hist, mask, None, method="fuse_user"
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
        )


class TestNaNRegression:
    def test_l2_normalize_zero_row_grad_is_finite(self):
        def loss(x):
            return jnp.sum(l2_normalize(x) * jnp.ones_like(x))

        g = jax.grad(loss)(jnp.zeros((2, 8)))
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_all_pad_history_grads_finite(self):
        """The round-3 NaN: a user with zero history feeds all-PAD token
        rows through the shared text encoder; the zero pooled embedding
        must not poison gradients through the normalize."""
        cfg = TrainConfig(**TINY_MODEL, **HIST)
        model, state = create_train_state(cfg, 0)
        rng = np.random.default_rng(4)
        batch_size = 4
        batch = {
            "user_tokens": rng.integers(
                1, 400, size=(batch_size, 16)
            ).astype(np.int32),
            "item_tokens": rng.integers(
                1, 400, size=(batch_size, 16)
            ).astype(np.int32),
            "neg_item_tokens": rng.integers(
                1, 400, size=(batch_size, 16)
            ).astype(np.int32),
            "hist_tokens": np.zeros((batch_size, 4, 16), np.int32),
            "hist_mask": np.zeros((batch_size, 4), bool),
            "hist_ratings": np.zeros((batch_size, 4), np.int32),
            "target": np.ones(batch_size, np.float32),
            "item_idx": np.arange(2 * batch_size, dtype=np.int64),
            "pos_idx": np.zeros((batch_size, 1), np.int64),
            "log_q": np.zeros(2 * batch_size, np.float32),
        }
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        def objective(params):
            losses = compute_batch_losses(
                state.apply_fn, params, jb, cfg, dropout_rng=None
            )
            return losses[cfg.train_loss]

        grads = jax.grad(objective)(state.params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


class TestHistoryEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, dm, tmp_path_factory):
        trainer = Trainer(
            TrainConfig(**TINY_MODEL, **HIST),
            data=dm,
            trainer_config=TrainerConfig(
                max_epochs=1,
                log_dir=str(tmp_path_factory.mktemp("histruns")),
                val_check_interval=1.0,
                limit_val_loss_batches=2,
            ),
        )
        metrics = trainer.fit()
        return trainer, metrics

    def test_fit_metrics_finite(self, trained):
        _, metrics = trained
        bad = {k: v for k, v in metrics.items() if not np.isfinite(v)}
        assert not bad, bad

    def test_recommend_users(self, trained):
        trainer, _ = trained
        recs = trainer.recommend_users([0, 1], top_k=5)
        assert len(recs) == 2 and len(recs[0]) == 5
        assert {"movie_id", "score"} <= recs[0][0].keys()

    def test_eval_user_embeddings_unit_norm(self, trained):
        trainer, _ = trained
        embeds = trainer.eval_user_embeddings(np.arange(5))
        np.testing.assert_allclose(
            np.linalg.norm(embeds, axis=-1), 1.0, atol=1e-4
        )

    def test_artifact_roundtrip_and_service(self, trained, tmp_path_factory):
        from xfmr_rec_tpu.serving.engine import RecommenderEngine
        from xfmr_rec_tpu.serving.schemas import Activity, UserQuery
        from xfmr_rec_tpu.serving.service import RecService, dispatch

        trainer, _ = trained
        path = tmp_path_factory.mktemp("histart") / "model"
        trainer.save(path)
        engine = RecommenderEngine(path)
        assert engine.model_config.user_tower == "history"

        plain = engine.embed_user_query(
            UserQuery(user_id=1, user_text="age 25 engineer")
        )
        movie_ids = [int(i) for i in list(engine._hist_pos_of_id)[:3]]
        hist = [
            Activity(
                movie_id=m, rating=4, datetime=j, movie_rn=j, movie_text=""
            )
            for j, m in enumerate(movie_ids)
        ]
        with_hist = engine.embed_user_query(
            UserQuery(user_id=1, user_text="age 25 engineer", history=hist)
        )
        a = np.asarray(plain.embedding)
        b = np.asarray(with_hist.embedding)
        np.testing.assert_allclose(np.linalg.norm(a), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(b), 1.0, atol=1e-4)
        assert np.abs(a - b).max() > 1e-4  # history moved the embedding

        # unknown movie ids are skipped, not crashed on
        unknown = engine.embed_user_query(
            UserQuery(
                user_id=1,
                user_text="age 25 engineer",
                history=[
                    Activity(
                        movie_id=10**9,
                        rating=4,
                        datetime=0,
                        movie_rn=0,
                        movie_text="",
                    )
                ],
            )
        )
        np.testing.assert_allclose(
            np.asarray(unknown.embedding), a, atol=1e-5
        )

        service = RecService(engine)
        recs = dispatch(
            service,
            "recommend_with_user",
            {
                "user": {
                    "user_id": 1,
                    "user_text": "age 25 engineer",
                    "history": [
                        {
                            "movie_id": movie_ids[0],
                            "rating": 5,
                            "datetime": 0,
                            "movie_rn": 0,
                            "movie_text": "",
                        }
                    ],
                }
            },
        )
        rec_ids = [r["movie_id"] for r in recs]
        assert movie_ids[0] not in rec_ids  # history is auto-excluded

    def test_mesh_fit_and_eval(self, data_dir, tmp_path_factory):
        """History tower over the 8-device mesh: sharded train step AND
        the sharded user-encode eval path (`_encode_user` with history
        gathers + batch padding to mesh divisibility)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        dmm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                eval_batch_size=16,
                max_length=16,
                vocab_size=500,
                max_history=4,
            )
        )
        dmm.setup()
        trainer = Trainer(
            TrainConfig(**TINY_MODEL, **HIST),
            data=dmm,
            trainer_config=TrainerConfig(
                max_steps=6,
                limit_val_batches=2,
                log_dir=str(tmp_path_factory.mktemp("histmesh")),
                encode_batch_size=64,
                mesh=True,
                model_parallel=2,
            ),
        )
        metrics = trainer.fit()
        assert trainer.mesh is not None and trainer.mesh.size == 8
        bad = {k: v for k, v in metrics.items() if not np.isfinite(v)}
        assert not bad, bad
        # odd request count forces the mesh-divisibility padding branch
        recs = trainer.recommend_users([0, 1, 2], top_k=5)
        assert len(recs) == 3 and len(recs[0]) == 5

    def test_history_width_mismatch_fails_loud(self, dm, tmp_path_factory):
        trainer = Trainer(
            TrainConfig(
                **TINY_MODEL,
                user_tower="history",
                max_history=8,
                history_layers=1,
            ),
            data=dm,  # dm was built with max_history=4
            trainer_config=TrainerConfig(
                max_steps=1, log_dir=str(tmp_path_factory.mktemp("mm"))
            ),
        )
        with pytest.raises(ValueError, match="max_history"):
            trainer.setup()
