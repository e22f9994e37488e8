"""Factorized item-CF channel (models/cf.py + trainer integration).

The channel's contract: rank-r factors of the degree-normalized train
co-occurrence ride the MIPS index as extra columns, and the composed
score is learned_dot + cf_weight * itemCF + cf_pop_weight * pop — one
dot product. Verified here against dense-eigh ground truth and a
hand-checkable planted corpus, plus the end-to-end trainer path.
"""

import numpy as np
import pytest

from xfmr_rec_tpu.models.cf import CFChannel, factorize_item_cf


def _dense_cos(train_items_by_user, n_items):
    pop = np.zeros(n_items)
    for items in train_items_by_user.values():
        for it in items:
            pop[it] += 1
    co = np.zeros((n_items, n_items))
    for items in train_items_by_user.values():
        it = np.asarray(items)
        co[np.ix_(it, it)] += 1
    np.fill_diagonal(co, 0)
    deg = np.sqrt(pop)
    deg[deg == 0] = 1
    return co / deg[:, None] / deg[None, :], pop


def _random_interactions(n_users, n_items, per_user, seed):
    rng = np.random.default_rng(seed)
    return {
        u: sorted(
            rng.choice(n_items, size=per_user, replace=False).tolist()
        )
        for u in range(n_users)
    }


class TestFactorization:
    def test_full_rank_reconstructs_cos(self):
        """At rank = n_items the factor product IS the cos matrix."""
        inter = _random_interactions(40, 12, 4, seed=0)
        cos, _ = _dense_cos(inter, 12)
        cf = factorize_item_cf(inter, 12, rank=12, iters=10)
        approx = cf.hist_factors @ cf.item_factors.T
        np.testing.assert_allclose(approx, cos, atol=1e-4)

    def test_truncated_matches_dense_eigh(self):
        """Randomized top-|lambda| eigenpairs == numpy.linalg.eigh's."""
        inter = _random_interactions(60, 20, 5, seed=1)
        cos, _ = _dense_cos(inter, 20)
        rank = 6
        cf = factorize_item_cf(inter, 20, rank=rank, iters=12)
        lam, _ = np.linalg.eigh(cos)
        want = lam[np.argsort(-np.abs(lam))[:rank]]
        # eigenvalue of factor k = sign * ||item_f_k||^2
        got = np.sign((cf.hist_factors * cf.item_factors).sum(0)) * (
            cf.item_factors**2
        ).sum(0)
        np.testing.assert_allclose(
            np.sort(np.abs(got)), np.sort(np.abs(want)), rtol=1e-3
        )

    def test_deterministic_for_seed(self):
        inter = _random_interactions(30, 10, 3, seed=2)
        a = factorize_item_cf(inter, 10, rank=4, seed=5)
        b = factorize_item_cf(inter, 10, rank=4, seed=5)
        np.testing.assert_array_equal(a.item_factors, b.item_factors)

    def test_pop_prior_normalized(self):
        inter = {0: [0, 1], 1: [0], 2: [0, 2]}
        cf = factorize_item_cf(inter, 4, rank=2)
        assert cf.pop_prior[0] == 1.0  # most popular
        assert cf.pop_prior[3] == 0.0  # never interacted
        assert cf.pop_prior[1] == pytest.approx(1 / 3)

    def test_cf_score_matches_exact_itemcf(self):
        """sum_h cos[h, i] == (sum_h hist_f[h]) . item_f[i] at full rank."""
        inter = _random_interactions(50, 15, 4, seed=3)
        cos, _ = _dense_cos(inter, 15)
        cf = factorize_item_cf(inter, 15, rank=15, iters=10)
        hist = [2, 7, 11]
        exact = cos[hist].sum(0)
        vec = cf.user_vectors(np.asarray(hist), normalize=False)
        np.testing.assert_allclose(cf.item_factors @ vec, exact, atol=1e-4)


class TestUserVectors:
    def test_masking_and_padding(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        full = cf.user_vectors(np.array([1, 3]), normalize=False)
        padded = cf.user_vectors(
            np.array([1, 3, -1, 8]), normalize=False
        )  # -1 and out-of-range are masked
        np.testing.assert_allclose(padded, full, atol=1e-6)

    def test_empty_history_is_zero(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        assert np.all(cf.user_vectors(np.array([-1, -1])) == 0)

    def test_normalize_unit(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        v = cf.user_vectors(np.array([0, 2, 5]))
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)

    def test_batched(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        batch = cf.user_vectors(np.array([[0, 2], [5, -1]]))
        assert batch.shape == (2, 4)
        np.testing.assert_allclose(
            batch[1], cf.user_vectors(np.array([5])), atol=1e-6
        )


class TestMutation:
    def test_grown_adds_cold_rows(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        grown = cf.grown(3)
        assert grown.num_items == 11
        assert np.all(grown.item_factors[8:] == 0)
        assert np.all(grown.pop_prior[8:] == 0)
        np.testing.assert_array_equal(grown.item_factors[:8], cf.item_factors)

    def test_take_filters(self):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        keep = np.array([0, 2, 5])
        sub = cf.take(keep)
        assert sub.num_items == 3
        np.testing.assert_array_equal(sub.item_factors, cf.item_factors[keep])

    def test_save_load_roundtrip(self, tmp_path):
        cf = factorize_item_cf(_random_interactions(20, 8, 3, 0), 8, rank=4)
        cf.save(tmp_path / "cf.npz")
        back = CFChannel.load(tmp_path / "cf.npz")
        np.testing.assert_array_equal(back.item_factors, cf.item_factors)
        np.testing.assert_array_equal(back.hist_factors, cf.hist_factors)
        np.testing.assert_array_equal(back.pop_prior, cf.pop_prior)


class TestTrainerIntegration:
    @pytest.fixture(scope="class")
    def trainer(self, tmp_path_factory):
        from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
        from xfmr_rec_tpu.training.module import TrainConfig
        from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

        tmp = tmp_path_factory.mktemp("cf-trainer")
        data = RecDataModule(
            DataConfig(
                data_dir=str(tmp / "data"),
                synthetic_if_missing=True,
                synthetic_users=40,
                synthetic_movies=50,
                synthetic_ratings=600,
                max_length=16,
            )
        )
        trainer = Trainer(
            TrainConfig(
                hidden_size=16,
                num_hidden_layers=1,
                num_attention_heads=2,
                intermediate_size=16,
                max_length=16,
                cf_rank=8,
                cf_weight=2.0,
                cf_pop_weight=0.5,
                index_dtype="float32",
            ),
            data=data,
            trainer_config=TrainerConfig(
                log_dir=str(tmp / "runs"),
                max_epochs=1,
                limit_train_batches=0.05,
                limit_val_batches=2,
                limit_val_loss_batches=1,
            ),
        )
        trainer.setup()
        return trainer

    def test_setup_builds_channel(self, trainer):
        assert trainer.cf is not None
        assert trainer.cf.rank == 8
        assert trainer._user_cf.shape == (len(trainer.data.user_ids), 8)

    def test_index_and_queries_carry_cf_columns(self, trainer):
        index = trainer.build_index()
        d = trainer.config.hidden_size
        assert index.corpus.shape[1] == d + 8 + 1  # emb + factors + pop
        users = trainer.eval_user_embeddings(np.array([0, 1]))
        assert users.shape[1] == d + 8 + 1

    def test_composed_score_decomposes(self, trainer):
        """index score == learned dot + w_cf * cf + w_pop * pop, exactly."""
        index = trainer.build_index()
        corpus = np.asarray(index.corpus, np.float32)
        d = trainer.config.hidden_size
        upos = np.array([0, 3])
        users = trainer.eval_user_embeddings(upos)
        got = users @ corpus.T
        learned = users[:, :d] @ corpus[:, :d].T
        cf_vec = trainer._user_cf[upos]
        cf_part = (
            trainer.config.cf_weight
            * (cf_vec @ trainer.cf.item_factors.T)
        )
        pop_part = trainer.config.cf_pop_weight * trainer.cf.pop_prior
        np.testing.assert_allclose(
            got, learned + cf_part + pop_part[None, :], rtol=1e-4, atol=1e-5
        )

    def test_validate_runs_composed(self, trainer):
        metrics = trainer.validate()
        assert np.isfinite(metrics["val/RetrievalNormalizedDCG"])

    def test_text_recommend_gets_zero_cf(self, trainer):
        recs = trainer.recommend(['{"title": "x", "genres": ["Drama"]}'])
        assert len(recs[0]) == trainer.config.top_k

    def test_artifact_includes_cf(self, trainer, tmp_path):
        trainer.save(tmp_path / "artifact")
        assert (tmp_path / "artifact" / "cf.npz").exists()
        back = CFChannel.load(tmp_path / "artifact" / "cf.npz")
        assert back.rank == 8


class TestServingCF:
    """The CF channel through the deployable artifact + engine.

    The config combines item_bias (learned popularity column) with the
    CF channel AND a text user tower — which also exercises the engine's
    needs_two_tower model selection (an item-channel artifact must load
    a TwoTowerModel even without the history tower)."""

    RANK = 8
    W_CF = 2.0
    W_POP = 0.5

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
        from xfmr_rec_tpu.training.module import TrainConfig
        from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

        tmp = tmp_path_factory.mktemp("cf-serve")
        data = RecDataModule(
            DataConfig(
                data_dir=str(tmp / "data"),
                synthetic_if_missing=True,
                synthetic_users=30,
                synthetic_movies=40,
                synthetic_ratings=500,
                max_length=16,
                batch_size=8,
            )
        )
        trainer = Trainer(
            TrainConfig(
                hidden_size=16,
                num_hidden_layers=1,
                num_attention_heads=2,
                intermediate_size=16,
                max_length=16,
                cf_rank=self.RANK,
                cf_weight=self.W_CF,
                cf_pop_weight=self.W_POP,
                item_bias=True,
                index_dtype="float32",
            ),
            data=data,
            trainer_config=TrainerConfig(
                max_steps=2,
                log_dir=str(tmp / "runs"),
                limit_val_batches=1,
                limit_val_loss_batches=1,
            ),
        )
        trainer.fit()
        path = tmp / "artifact"
        trainer.save(path)
        return path

    @pytest.fixture(scope="class")
    def engine(self, artifact):
        from xfmr_rec_tpu.serving.engine import RecommenderEngine

        return RecommenderEngine(artifact, warmup=False)

    def test_engine_loads_cf(self, engine):
        assert engine.cf is not None
        assert engine.cf.rank == self.RANK
        d = engine.model_config.hidden_size
        assert engine.index.corpus.shape[1] == d + 1 + self.RANK + 1

    def test_anonymous_text_search_composes(self, engine):
        from xfmr_rec_tpu.serving.schemas import Query

        out = engine.search_items(Query(text="anything"), top_k=5)
        assert len(out) == 5  # zero CF + pop prior, no width error

    def test_user_query_carries_cf_columns(self, engine):
        user = engine.get_user(int(next(iter(engine._users_by_id))))
        query = engine.embed_user_query(user)
        emb = np.asarray(query.embedding, np.float32)
        d = engine.model_config.hidden_size
        assert emb.shape[0] == d + 1 + self.RANK + 1
        assert emb[d] == 1.0  # bias pair
        assert emb[-1] == pytest.approx(self.W_POP)
        positions = [
            engine._cf_pos_of_id.get(int(e.movie_id), -1)
            for e in (user.history or [])
        ]
        want = self.W_CF * engine.cf.user_vectors(
            np.asarray(positions or [-1], dtype=np.int64)
        )
        np.testing.assert_allclose(
            emb[d + 1 : d + 1 + self.RANK], want, rtol=1e-5, atol=1e-6
        )
        hits = engine.search_items(query, top_k=5)
        assert len(hits) == 5

    def test_cf_artifact_serves_under_ivf_and_sharded(self, artifact):
        """The CF columns live in the corpus, so every index kind
        composes the same score — ivf (clustered over the augmented
        vectors) and sharded (mesh-split rows) included."""
        from xfmr_rec_tpu.serving.engine import RecommenderEngine
        from xfmr_rec_tpu.serving.schemas import Query

        for kind in ("ivf", "sharded"):
            engine = RecommenderEngine(
                artifact, warmup=False, index_kind=kind, nprobe=4
            )
            assert engine.cf is not None
            out = engine.search_items(Query(text="anything"), top_k=3)
            assert len(out) == 3, (kind, out)
            user = engine.get_user(int(next(iter(engine._users_by_id))))
            query = engine.embed_user_query(user)
            d = engine.model_config.hidden_size
            assert (
                np.asarray(query.embedding).shape[0]
                == d + 1 + self.RANK + 1
            )
            hits = engine.search_items(query, top_k=3)
            assert len(hits) == 3, (kind, hits)

    def test_add_items_keeps_widths_consistent(self, engine):
        from xfmr_rec_tpu.serving.schemas import ItemQuery, Query

        added = engine.add_items(
            [
                ItemQuery(
                    movie_rn=9001,
                    movie_id=999001,
                    movie_text='{"title": "New (2030)", "genres": ["Drama"]}',
                )
            ]
        )
        assert added == 1
        assert engine.get_item(999001).movie_id == 999001
        out = engine.search_items(Query(text="drama"), top_k=5)
        assert len(out) == 5


class TestCFShardedEval:
    """CF columns through the model-parallel eval path: the corpus
    shards over the model axis WITH its factor/pop columns and the
    sharded top-k must agree with a dense numpy composition."""

    def test_sharded_eval_matches_dense(self, tmp_path):
        from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
        from xfmr_rec_tpu.training.module import TrainConfig
        from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

        data = RecDataModule(
            DataConfig(
                data_dir=str(tmp_path / "data"),
                synthetic_if_missing=True,
                synthetic_users=40,
                synthetic_movies=50,
                synthetic_ratings=600,
                max_length=16,
                batch_size=16,
            )
        )
        trainer = Trainer(
            TrainConfig(
                hidden_size=16,
                num_hidden_layers=1,
                num_attention_heads=2,
                intermediate_size=16,
                max_length=16,
                cf_rank=8,
                cf_weight=1.5,
                cf_pop_weight=0.5,
                index_dtype="float32",
            ),
            data=data,
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path / "runs"),
                max_steps=2,
                limit_val_batches=1,
                limit_val_loss_batches=1,
                mesh=True,
                model_parallel=2,
            ),
        )
        trainer.fit()
        assert trainer._sharded_corpus is not None  # model axis engaged
        d = trainer.config.hidden_size
        assert trainer._sharded_corpus.shape[1] == d + 8 + 1
        # sharded top-k == dense composed top-k on real users
        index = trainer.index
        corpus = np.asarray(index.corpus, np.float32)
        batch = next(trainer.data.eval_batches("val"))
        users = trainer._eval_user_embeds(batch)
        _, got_ids = trainer._sharded_search(
            np.asarray(users), batch, top_k=5
        )
        dense = users @ corpus.T
        excl = batch["exclude_positions"]
        pos_of_id = {
            int(m): p for p, m in enumerate(trainer.data.item_ids)
        }
        for i in range(len(users)):
            e = excl[i]
            e = e[(e >= 0) & (e < trainer.data.num_items)]
            row = dense[i].copy()
            row[e] = -np.inf
            got_scores = sorted(
                row[pos_of_id[int(g)]] for g in got_ids[i]
            )
            want_scores = sorted(np.sort(row[np.isfinite(row)])[-5:])
            np.testing.assert_allclose(
                got_scores, want_scores, atol=1e-4, err_msg=f"row {i}"
            )
