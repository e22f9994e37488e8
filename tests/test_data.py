"""Data layer: synthetic generator, ETL semantics, batch pipeline."""

import numpy as np
import pandas as pd
import pytest

from xfmr_rec_tpu.data import DataConfig, RecDataModule
from xfmr_rec_tpu.data.prepare import (
    load_movies,
    load_ratings,
    load_users,
    prepare_movielens,
    rolling_history_ranges,
    train_test_split,
)
from xfmr_rec_tpu.data.synthetic import generate_movielens


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("data")
    generate_movielens(
        path, num_users=30, num_movies=120, num_ratings=900, seed=0
    )
    prepare_movielens(str(path), overwrite=True)
    return str(path)


class TestSyntheticAndLoaders:
    def test_loaders_parse_dat(self, data_dir):
        movies = load_movies(data_dir)
        users = load_users(data_dir)
        ratings = load_ratings(data_dir)
        assert list(movies.columns) == ["movie_rn", "movie_id", "movie_text"]
        assert movies["movie_rn"].iloc[0] == 1  # 1-based row numbers
        assert users["user_rn"].iloc[0] == 1
        assert '"title"' in movies["movie_text"].iloc[0]
        assert '"gender"' in users["user_text"].iloc[0]
        assert {"user_id", "movie_id", "rating", "timestamp"} <= set(
            ratings.columns
        )

    def test_no_duplicate_user_item(self, data_dir):
        ratings = load_ratings(data_dir)
        assert not ratings.duplicated(["user_id", "movie_id"]).any()


class TestSplit:
    def test_per_user_temporal_80_20(self, data_dir):
        ratings = train_test_split(load_ratings(data_dir))
        for _, group in ratings.groupby("user_id"):
            group = group.sort_values("timestamp")
            train_flags = group["is_train"].to_numpy()
            # train rows all precede holdout rows in time order
            if (~train_flags).any() and train_flags.any():
                assert train_flags[: train_flags.sum()].all()
            frac = train_flags.mean()
            # rank/n < 0.8 => at least 80%; tiny users may be all-train
            assert frac >= 0.5

    def test_val_test_partition(self, data_dir):
        ratings = train_test_split(load_ratings(data_dir))
        holdout = ratings[~ratings["is_train"]]
        # every holdout row is val xor test
        assert (holdout["is_val"] ^ holdout["is_test"]).all()
        # val users are those with the largest holdout counts
        counts = holdout.groupby("user_id").size()
        val_users = set(holdout.loc[holdout["is_val"], "user_id"])
        if val_users:
            min_val = counts[list(val_users)].min()
            non_val = [u for u in counts.index if u not in val_users]
            if non_val:
                assert counts[non_val].max() <= min_val
        assert ratings["is_predict"].all()

    def test_rolling_history_open_interval(self):
        week = 7 * 24 * 3600
        ts = np.array([0, week, 2 * week, 5 * week, 5 * week])
        start, stop = rolling_history_ranges(ts)
        # event at t=2w: window (2w-4w, 2w) contains t=0? 0 > -2w yes, 0 < 2w yes
        assert (start[2], stop[2]) == (0, 2)
        # events at t=5w: window (1w, 5w) excludes t=0 and t=1w (open), has 2w
        assert (start[3], stop[3]) == (2, 3)
        # identical timestamps share history and exclude each other
        assert (start[4], stop[4]) == (2, 3)


class TestParquetOutputs:
    def test_users_parquet_activity(self, data_dir):
        users = pd.read_parquet(f"{data_dir}/ml-1m/users.parquet")
        assert {"history", "target", "is_val", "is_test"} <= set(users.columns)
        row = users.iloc[0]
        if len(row["history"]) > 0:
            activity = row["history"][0]
            assert {"datetime", "rating", "movie_rn", "movie_id", "movie_text"} <= set(
                activity.keys()
            )

    def test_movies_parquet_flags(self, data_dir):
        movies = pd.read_parquet(f"{data_dir}/ml-1m/movies.parquet")
        assert movies["is_val"].all() and movies["is_predict"].all()

    def test_ratings_parquet_history_ranges(self, data_dir):
        ratings = pd.read_parquet(f"{data_dir}/ml-1m/ratings.parquet")
        assert (ratings["hist_stop"] >= ratings["hist_start"]).all()


class TestPipeline:
    @pytest.fixture(scope="class")
    def dm(self, data_dir):
        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                eval_batch_size=4,
                max_length=16,
                vocab_size=500,
                max_positives=8,
                max_targets=16,
            )
        )
        dm.setup()
        return dm

    def test_train_batch_shapes(self, dm):
        batch = next(iter(dm.train_batches()))
        assert batch["user_tokens"].shape == (8, 16)
        assert batch["item_tokens"].shape == (8, 16)
        assert batch["neg_item_tokens"].shape == (8, 16)
        assert batch["target"].shape == (8,)
        assert batch["item_idx"].shape == (16,)
        assert batch["pos_idx"].shape == (8, 8)
        assert batch["log_q"].shape == (16,)
        assert (batch["item_idx"] >= 1).all()  # movie_rn, 1-based

    def test_pos_idx_matches_user_train_items(self, dm):
        """pos_idx rows are the user's train positives (movie_rn, 0-padded),
        truncated at max_positives. Rows whose user has few enough train
        items must contain the row's own item."""
        batch = next(iter(dm.train_batches()))
        for i in range(8):
            row = set(batch["pos_idx"][i].tolist())
            row.discard(0)
            if len(row) < dm.config.max_positives:  # untruncated user
                assert int(batch["item_idx"][i]) in row
            for rn in row:
                assert 1 <= rn <= dm.num_items

    def test_epoch_reshuffles(self, dm):
        b0 = next(iter(dm.train_batches(epoch=0)))
        b1 = next(iter(dm.train_batches(epoch=1)))
        assert not np.array_equal(b0["target"], b1["target"])

    def test_epoch_deterministic(self, dm):
        # positives are reproducible per epoch; negatives come from the
        # continuous MNS stream and advance between calls by design
        b0 = next(iter(dm.train_batches(epoch=3)))
        b1 = next(iter(dm.train_batches(epoch=3)))
        np.testing.assert_array_equal(b0["item_idx"][:8], b1["item_idx"][:8])
        np.testing.assert_array_equal(b0["target"], b1["target"])

    def test_mns_covers_corpus(self):
        """The shuffled-cycle sampler visits every item before repeating."""
        from xfmr_rec_tpu.data.module import NegativeItemSampler

        sampler = NegativeItemSampler(50, seed=1)
        draws = np.concatenate([sampler.draw(7) for _ in range(22)])
        assert set(draws[:50].tolist()) == set(range(50))
        assert set(draws[50:100].tolist()) == set(range(50))
        # consecutive cycles use different orders
        assert not np.array_equal(draws[:50], draws[50:100])

    def test_eval_batch_shapes(self, dm):
        batch = next(iter(dm.eval_batches("val")))
        assert batch["user_tokens"].shape[0] == 4
        assert batch["target_ids"].shape == (4, 16)
        assert batch["target_ratings"].shape == (4, 16)
        assert batch["valid"].dtype == bool

    def test_eval_targets_are_holdout(self, dm):
        """Eval targets must be disjoint from the exclusion (train) set."""
        for batch in dm.eval_batches("val"):
            for i in range(len(batch["valid"])):
                if not batch["valid"][i]:
                    continue
                excl = set(batch["exclude_positions"][i].tolist())
                excl.discard(dm.num_items)
                excl_ids = {int(dm.item_ids[p]) for p in excl}
                tgts = set(batch["target_ids"][i].tolist())
                tgts.discard(0)
                assert not (excl_ids & tgts)
            break

    def test_eval_interaction_batches_shapes(self, dm):
        """Held-out loss batches mirror the train-batch contract."""
        train = next(iter(dm.train_batches()))
        batch = next(iter(dm.eval_interaction_batches("val")))
        assert set(batch) == set(train)
        assert batch["user_tokens"].shape == (8, 16)
        assert batch["item_idx"].shape == (16,)
        assert (batch["item_idx"] >= 1).all()
        # deterministic across calls (fresh negative stream each pass)
        again = next(iter(dm.eval_interaction_batches("val")))
        for key in batch:
            np.testing.assert_array_equal(batch[key], again[key])

    def test_eval_interaction_pos_idx_is_holdout(self, dm):
        """Holdout rows mask the user's HOLDOUT positives (the reference
        joins the (user, is_train) target list — prepare.py:236-241), so
        the row's own holdout item is in its pos_idx."""
        batch = next(iter(dm.eval_interaction_batches("val")))
        for i in range(8):
            row = set(batch["pos_idx"][i].tolist())
            row.discard(0)
            assert int(batch["item_idx"][i]) in row

    def test_val_test_users_disjoint(self, dm):
        val = set(dm.eval_users("val").tolist())
        test = set(dm.eval_users("test").tolist())
        assert not (val & test)

    def test_steps_per_epoch(self, dm):
        batches = list(dm.train_batches())
        assert len(batches) == dm.steps_per_epoch

class TestAutoWidths:
    """Default (None) widths are corpus-derived: no user is ever truncated.

    Guards the reference semantics that the accidental-hit mask covers the
    user's ENTIRE train-positive list (data/lightning.py:274-280,
    losses.py:92-110) and that metrics see every holdout target
    (lightning.py:289-306)."""

    @pytest.fixture(scope="class")
    def dense_dm(self, tmp_path_factory):
        # 10 users x ~60 ratings => heavy users hold >32 train positives
        path = tmp_path_factory.mktemp("dense")
        generate_movielens(
            path, num_users=10, num_movies=120, num_ratings=600, seed=3
        )
        prepare_movielens(str(path), overwrite=True)
        dm = RecDataModule(
            DataConfig(
                data_dir=str(path),
                batch_size=8,
                max_length=16,
                vocab_size=500,
            )
        )
        dm.setup()
        return dm

    def test_auto_widths_cover_corpus_max(self, dense_dm):
        dm = dense_dm
        heaviest = max(len(v) for v in dm._train_items_by_user.values())
        assert heaviest > 32  # the round-1 truncation regime
        assert dm.max_positives == heaviest
        assert dm.max_targets == int(dm.target_counts.max())
        # every user's full positive set is present, none dropped
        for u, items in dm._train_items_by_user.items():
            row = set(dm.user_pos_idx[u].tolist())
            row.discard(0)
            assert row == {i + 1 for i in items}

    def test_no_positive_survives_as_negative(self, dense_dm):
        """A user with >32 train positives: every one of their positives is
        an accidental hit, including those past the old 32-wide cap."""
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.masking import negative_masks

        dm = dense_dm
        u, items = max(
            dm._train_items_by_user.items(), key=lambda kv: len(kv[1])
        )
        pos_rns = np.asarray(sorted(items), dtype=np.int64) + 1
        assert len(pos_rns) > 32
        # candidates = the row's own positive + the user's positives beyond
        # the old cap, posing as sampled negatives
        item_idx = np.concatenate([pos_rns[:1], pos_rns[32:]])
        logits = jnp.zeros((1, len(item_idx)))
        masks = negative_masks(
            logits,
            item_idx=jnp.asarray(item_idx),
            pos_idx=jnp.asarray(dm.user_pos_idx[[u]]),
        )
        assert not bool(masks.any())

    def test_explicit_cap_still_truncates(self, dense_dm, tmp_path):
        dm = RecDataModule(
            DataConfig(
                data_dir=dense_dm.config.data_dir,
                max_positives=4,
                max_targets=4,
                max_length=16,
                vocab_size=500,
            )
        )
        dm.setup()
        assert dm.user_pos_idx.shape[1] == 4
        batch = next(iter(dm.eval_batches("val")))
        assert batch["target_ids"].shape[1] == 4


class TestOffline:
    def test_offline_prepare_falls_back_to_synthetic(self, tmp_path):
        dm = RecDataModule(
            DataConfig(
                data_dir=str(tmp_path / "fresh"),
                synthetic_users=10,
                synthetic_movies=20,
                synthetic_ratings=100,
                vocab_size=200,
                max_length=8,
            )
        )
        dm.prepare_data()
        dm.setup()
        assert dm.num_items == 20
        assert dm.num_users == 10


class TestProvenance:
    def test_synthetic_corpus_is_not_labeled_real(self, data_dir):
        from xfmr_rec_tpu.data.prepare import (
            load_provenance,
            record_provenance,
        )

        record = record_provenance(data_dir, source="synthetic")
        assert record["source"] == "synthetic"
        assert record["matches_real_ml1m"] is False
        assert record["dataset_label"].startswith("synthetic-ML1M")
        assert record["num_users"] == 30
        # round-trips from disk
        assert load_provenance(data_dir) == record

    def test_prepare_data_records_provenance(self, tmp_path):
        dm = RecDataModule(
            DataConfig(
                data_dir=str(tmp_path / "d"),
                synthetic_users=12,
                synthetic_movies=30,
                synthetic_ratings=200,
            )
        )
        dm.prepare_data()
        assert dm.provenance is not None
        assert dm.provenance["source"] == "synthetic"
        assert dm.provenance["matches_real_ml1m"] is False
        assert (tmp_path / "d" / "ml-1m" / "provenance.json").exists()

    def test_real_fingerprint_matches_constants(self, tmp_path):
        """A corpus forged to the real ML-1M fingerprint is detected."""
        from xfmr_rec_tpu.data.prepare import _REAL_ML1M, record_provenance

        raw = tmp_path / "ml-1m"
        raw.mkdir(parents=True)
        lines = [_REAL_ML1M["first_rating_line"]] + [
            f"1::{i}::5::978300760" for i in range(_REAL_ML1M["num_ratings"] - 1)
        ]
        (raw / "ratings.dat").write_text("\n".join(lines) + "\n")
        (raw / "users.dat").write_text(
            "\n".join("u" for _ in range(_REAL_ML1M["num_users"])) + "\n"
        )
        (raw / "movies.dat").write_text(
            "\n".join("m" for _ in range(_REAL_ML1M["num_movies"])) + "\n"
        )
        record = record_provenance(tmp_path, source="downloaded")
        assert record["matches_real_ml1m"] is True
        assert record["dataset_label"] == "MovieLens-1M"


class TestVocabTokenizerPipeline:
    """tokenizer="vocab" end-to-end: setup, caching, batch shapes."""

    @pytest.fixture(scope="class")
    def dm(self, data_dir):
        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                max_length=16,
                vocab_size=512,
                oov_buckets=32,
                tokenizer="vocab",
            )
        )
        dm.setup()
        return dm

    def test_vocab_built_and_cached(self, dm, data_dir):
        import pathlib

        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        assert isinstance(dm.tokenizer, VocabTokenizer)
        cache = pathlib.Path(data_dir, "ml-1m", "vocab-512-32-16.json")
        assert cache.exists()
        # a second module reloads the cached vocab with identical ids
        dm2 = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                max_length=16,
                vocab_size=512,
                oov_buckets=32,
                tokenizer="vocab",
            )
        )
        dm2.setup()
        np.testing.assert_array_equal(dm.item_tokens, dm2.item_tokens)

    def test_common_corpus_tokens_in_vocab(self, dm):
        # frequent corpus tokens must encode below the OOV range
        ids = dm.tokenizer.encode_batch(dm.item_texts[:20])
        known = (ids > 1) & (ids < dm.tokenizer.oov_start)
        assert known.any()

    def test_train_batches_shaped_like_hashing(self, dm):
        batch = next(dm.train_batches(0))
        assert batch["user_tokens"].shape == (8, 16)
        assert batch["item_tokens"].dtype == np.int32
        assert int(batch["item_tokens"].max()) < 512

    def test_unknown_tokenizer_rejected(self, data_dir):
        with pytest.raises(ValueError, match="tokenizer"):
            RecDataModule(DataConfig(data_dir=data_dir, tokenizer="wordpiece"))
