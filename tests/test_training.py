"""End-to-end training slice: train step, eval, checkpointing, artifact."""

import numpy as np
import pytest

from xfmr_rec_tpu.data import DataConfig, RecDataModule
from xfmr_rec_tpu.data.prepare import prepare_movielens
from xfmr_rec_tpu.data.synthetic import generate_movielens
from xfmr_rec_tpu.training.module import (
    TrainConfig,
    create_train_state,
    make_train_step,
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


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("traindata")
    generate_movielens(
        path, num_users=40, num_movies=120, num_ratings=1200, seed=1
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
            max_positives=16,
            max_targets=32,
        )
    )
    dm.setup()
    return dm


class TestTrainStep:
    def test_losses_decrease_on_overfit(self, dm):
        """A few steps on one repeated batch must reduce the train loss."""
        import jax

        config = TrainConfig(**TINY_MODEL, learning_rate=0.01)
        _, state = create_train_state(config, rng=0)
        step = jax.jit(make_train_step(config))
        batch = next(iter(dm.train_batches()))
        first = None
        for _ in range(15):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["train/PairwiseHingeLoss"])
        last = float(metrics["train/PairwiseHingeLoss"])
        assert last < first

    def test_all_losses_logged(self, dm):
        import jax

        config = TrainConfig(**TINY_MODEL)
        _, state = create_train_state(config, rng=0)
        step = jax.jit(make_train_step(config))
        _, metrics = step(state, next(iter(dm.train_batches())))
        for name in (
            "AlignmentLoss", "ContrastiveLoss", "AlignmentContrastiveLoss",
            "InfomationNoiseContrastiveEstimationLoss",
            "MutualInformationNeuralEstimationLoss",
            "PairwiseHingeLoss", "PairwiseLogisticLoss",
        ):
            assert np.isfinite(float(metrics[f"train/{name}"]))
        assert float(metrics["train/grad_norm"]) > 0

    @pytest.mark.parametrize(
        "loss_name",
        ["InfomationNoiseContrastiveEstimationLoss", "PairwiseLogisticLoss"],
    )
    def test_alternate_train_losses(self, dm, loss_name):
        import jax

        config = TrainConfig(**TINY_MODEL, train_loss=loss_name)
        _, state = create_train_state(config, rng=0)
        step = jax.jit(make_train_step(config))
        new_state, metrics = step(state, next(iter(dm.train_batches())))
        assert np.isfinite(float(metrics[f"train/{loss_name}"]))

    def test_logq_correction_train_step(self, dm):
        import jax

        config = TrainConfig(
            **TINY_MODEL,
            train_loss="InfomationNoiseContrastiveEstimationLoss",
            use_logq_correction=True,
        )
        _, state = create_train_state(config, rng=0)
        step = jax.jit(make_train_step(config))
        _, metrics = step(state, next(iter(dm.train_batches())))
        assert np.isfinite(
            float(metrics["train/InfomationNoiseContrastiveEstimationLoss"])
        )


class TestTrainerLoop:
    @pytest.fixture(scope="class")
    def trained(self, dm, tmp_path_factory):
        log_dir = tmp_path_factory.mktemp("runs")
        trainer = Trainer(
            TrainConfig(**TINY_MODEL, learning_rate=0.003),
            data=dm,
            trainer_config=TrainerConfig(
                max_epochs=2,
                log_dir=str(log_dir),
                run_name="t1",
                log_every_steps=10,
                encode_batch_size=64,
            ),
        )
        final = trainer.fit()
        return trainer, final

    def test_fit_produces_val_metrics(self, trained):
        _, final = trained
        assert "val/RetrievalNormalizedDCG" in final
        assert 0.0 <= final["val/RetrievalNormalizedDCG"] <= 1.0
        assert final["val/RetrievalHitRate"] >= 0.0

    def test_learns_above_chance(self, trained):
        """Synthetic data has archetype structure; hit rate must beat the
        ~uniform-random baseline (k/num_items ~ 17%)."""
        trainer, final = trained
        assert final["val/RetrievalHitRate"] > 0.25

    def test_metrics_jsonl_written(self, trained):
        trainer, _ = trained
        jsonl = trainer.logger.log_dir / "metrics.jsonl"
        assert jsonl.exists()
        assert len(jsonl.read_text().strip().splitlines()) > 1

    def test_test_split_eval(self, trained):
        trainer, _ = trained
        metrics = trainer.test()
        assert "test/RetrievalNormalizedDCG" in metrics

    def test_val_losses_logged(self, trained):
        """The full loss family is logged on held-out interactions at every
        validation (reference lightning.py:194-206)."""
        trainer, final = trained
        for name in (
            "AlignmentLoss", "ContrastiveLoss", "AlignmentContrastiveLoss",
            "InfomationNoiseContrastiveEstimationLoss",
            "MutualInformationNeuralEstimationLoss",
            "PairwiseHingeLoss", "PairwiseLogisticLoss",
        ):
            assert f"val/{name}" in final
            assert np.isfinite(final[f"val/{name}"])
        jsonl = trainer.logger.log_dir / "metrics.jsonl"
        assert "val/PairwiseHingeLoss" in jsonl.read_text()

    def test_test_losses_logged(self, trained):
        trainer, _ = trained
        metrics = trainer.test()
        assert "test/PairwiseHingeLoss" in metrics
        assert np.isfinite(metrics["test/PairwiseHingeLoss"])

    def test_recommend_excludes(self, trained):
        trainer, _ = trained
        text = trainer.data.user_texts[0]
        recs = trainer.recommend([text], top_k=5)[0]
        assert len(recs) == 5
        assert all("movie_id" in r and "score" in r for r in recs)
        exclude = [r["movie_id"] for r in recs[:3]]
        recs2 = trainer.recommend([text], top_k=5, exclude_ids=[exclude])[0]
        assert not set(exclude) & {r["movie_id"] for r in recs2}

    def test_checkpoint_roundtrip(self, trained, dm, tmp_path_factory):
        trainer, _ = trained
        trainer.save_checkpoint("roundtrip")
        fresh = Trainer(
            TrainConfig(**TINY_MODEL, learning_rate=0.003),
            data=dm,
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path_factory.mktemp("runs2")),
                run_name="t2",
                ckpt_dir=str(trainer._ckpt_path("roundtrip").parent),
            ),
        )
        fresh.restore_checkpoint("roundtrip")
        assert fresh.global_step == trainer.global_step
        import jax

        a = jax.tree.leaves(trainer.state.params)
        b = jax.tree.leaves(fresh.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_resume_continues_training(self, trained, dm, tmp_path_factory):
        """Elastic recovery: restore (params + opt_state + step) and keep
        fitting — the reference's Ray checkpoint-restart path
        (ray.py:60-64) redesigned as orbax restore + continued fit."""
        trainer, _ = trained
        trainer.save_checkpoint("resume")
        fresh = Trainer(
            TrainConfig(**TINY_MODEL, learning_rate=0.003),
            data=dm,
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path_factory.mktemp("runs3")),
                run_name="t3",
                ckpt_dir=str(trainer._ckpt_path("resume").parent),
                max_steps=trainer.global_step + 2,
                limit_val_batches=1,
            ),
        )
        fresh.restore_checkpoint("resume")
        start = fresh.global_step
        metrics = fresh.fit()
        assert fresh.global_step == start + 2
        assert np.isfinite(metrics.get("val/RetrievalNormalizedDCG", 0.0))

    def test_artifact_save(self, trained, tmp_path_factory):
        trainer, _ = trained
        path = tmp_path_factory.mktemp("artifact") / "model"
        trainer.save(path)
        assert (path / "encoder.msgpack").exists()
        assert (path / "processors.json").exists()
        assert (path / "index" / "corpus.npz").exists()
        assert (path / "users.parquet").exists()


class TestMeshTraining:
    """The Trainer actually uses the mesh (VERDICT r1 item 3): fit on the
    8-device CPU mesh must reproduce single-device metrics, and
    model_parallel > 1 must shard the eval corpus."""

    def _fit(self, data_dir, tmp, *, mesh, model_parallel=1):
        # fresh data module per run: the MNS sampler is stateful, and
        # identical batches are required for an exact comparison
        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir,
                batch_size=8,
                eval_batch_size=16,
                max_length=16,
                vocab_size=500,
            )
        )
        dm.setup()
        trainer = Trainer(
            TrainConfig(**TINY_MODEL, learning_rate=0.003),
            data=dm,
            trainer_config=TrainerConfig(
                max_steps=6,
                limit_val_batches=2,
                log_dir=str(tmp),
                run_name=f"mesh-{mesh}-{model_parallel}",
                encode_batch_size=64,
                mesh=mesh,
                model_parallel=model_parallel,
            ),
        )
        final = trainer.fit()
        return trainer, final

    def test_mesh_fit_matches_single_device(self, data_dir, tmp_path_factory):
        t1, m1 = self._fit(
            data_dir, tmp_path_factory.mktemp("m1"), mesh=False
        )
        t8, m8 = self._fit(data_dir, tmp_path_factory.mktemp("m8"), mesh=True)
        assert t1.mesh is None
        assert t8.mesh is not None
        assert t8.mesh.size == 8
        assert set(m1) == set(m8)
        for key in m1:
            np.testing.assert_allclose(
                m1[key], m8[key], rtol=1e-3, atol=1e-4, err_msg=key
            )

    def test_corpus_parallel_eval_matches_dense(
        self, data_dir, tmp_path_factory
    ):
        trainer, final = self._fit(
            data_dir,
            tmp_path_factory.mktemp("mp"),
            mesh=True,
            model_parallel=2,
        )
        assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
        assert trainer._sharded_corpus is not None
        sharded = trainer.validate()
        # same trained state, single-device dense retrieval path
        trainer._sharded_corpus = None
        dense = trainer.validate()
        for key in sharded:
            np.testing.assert_allclose(
                sharded[key], dense[key], rtol=1e-5, atol=1e-6, err_msg=key
            )

    def test_mesh_batch_divisibility_error(self, data_dir, tmp_path_factory):
        dm = RecDataModule(
            DataConfig(
                data_dir=data_dir, batch_size=6, max_length=16, vocab_size=500
            )
        )
        dm.setup()
        trainer = Trainer(
            TrainConfig(**TINY_MODEL),
            data=dm,
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path_factory.mktemp("bad")), mesh=True
            ),
        )
        with pytest.raises(ValueError, match="divisible by the mesh"):
            trainer.setup()


class TestTrainerKnobs:
    def test_max_time_stops_early(self, dm, tmp_path_factory):
        import time

        trainer = Trainer(
            TrainConfig(**TINY_MODEL),
            data=dm,
            trainer_config=TrainerConfig(
                max_epochs=50,
                max_time_s=1.0,
                log_dir=str(tmp_path_factory.mktemp("runs_time")),
                limit_val_batches=1,
            ),
        )
        start = time.time()
        trainer.fit()
        assert time.time() - start < 120
        assert trainer.global_step < 50 * dm.steps_per_epoch

    def test_step_timer(self):
        from xfmr_rec_tpu.utils.profiling import StepTimer

        timer = StepTimer(window=10)
        for _ in range(25):
            timer.tick()
        assert timer.summary()["steps"] == 25
        assert timer.steps_per_second > 0


class TestFullCohortPredict:
    def test_predict_writes_all_users(self, dm, tmp_path_factory):
        out = tmp_path_factory.mktemp("pred") / "predictions.parquet"
        trainer = Trainer(
            TrainConfig(**TINY_MODEL),
            data=dm,
            trainer_config=TrainerConfig(
                log_dir=str(tmp_path_factory.mktemp("runs")),
                encode_batch_size=64,
            ),
        )
        trainer.setup()
        frame = trainer.predict(out, top_k=5)
        import pandas as pd

        assert out.exists()
        on_disk = pd.read_parquet(out)
        # every is_predict user gets exactly one row of k recommendations
        expected = dm.eval_users("predict")
        assert len(frame) == len(on_disk) == len(expected)
        assert set(frame["user_id"]) == {
            int(dm.user_ids[u]) for u in expected
        }
        assert all(len(r) == 5 for r in frame["rec_item_ids"])
        # train-history exclusions hold
        upos_of_id = {int(u): p for p, u in enumerate(dm.user_ids)}
        for _, row in frame.head(20).iterrows():
            upos = upos_of_id[row["user_id"]]
            hist_ids = {
                int(dm.item_ids[p])
                for p in dm._train_items_by_user.get(upos, [])
            }
            assert not (set(row["rec_item_ids"]) & hist_ids)


class TestLRSchedule:
    def test_cosine_schedule_trains_and_decays(self, dm, tmp_path_factory):
        import jax.numpy as jnp
        import optax

        cfg = TrainConfig(
            **TINY_MODEL,
            learning_rate=1e-3,
            lr_schedule="cosine",
            warmup_steps=2,
        )
        trainer = Trainer(
            cfg,
            data=dm,
            trainer_config=TrainerConfig(
                max_steps=6,
                limit_val_batches=1,
                log_dir=str(tmp_path_factory.mktemp("lrruns")),
                run_name="cosine",
            ),
        )
        metrics = trainer.fit()
        assert np.isfinite(metrics["val/RetrievalNormalizedDCG"])
        # Trainer filled total_steps from max_steps
        assert trainer.config.total_steps == 6
        # the schedule itself: 0 at step 0, peak at warmup, decayed after
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, 2, 6, end_value=1e-5
        )
        assert float(sched(0)) == 0.0
        assert float(sched(2)) == pytest.approx(1e-3)
        assert float(sched(6)) < 1e-3 / 10

    def test_constant_schedule_unchanged_default(self):
        cfg = TrainConfig(**TINY_MODEL)
        assert cfg.lr_schedule == "constant"
        assert cfg.total_steps is None


class TestLogAllLossesKnob:
    """log_all_losses=False computes only the train loss — IDENTICAL
    updates (the other losses were forward-only aux), fewer metrics,
    measurably faster steps (BENCH_NOTES round 4 MFU section)."""

    def test_updates_identical_and_metrics_reduced(self):
        import jax

        from xfmr_rec_tpu.training.module import (
            TrainConfig,
            create_train_state,
            make_train_step,
        )

        config = TrainConfig(
            vocab_size=300,
            max_position_embeddings=16,
            max_length=8,
            compute_dtype="float32",
        )
        rng = np.random.default_rng(0)
        batch = {
            "user_tokens": rng.integers(1, 300, (8, 8)).astype(np.int32),
            "item_tokens": rng.integers(1, 300, (8, 8)).astype(np.int32),
            "neg_item_tokens": rng.integers(1, 300, (8, 8)).astype(
                np.int32
            ),
            "target": rng.integers(1, 6, 8).astype(np.float32),
            "item_idx": rng.integers(1, 100, 16).astype(np.int64),
            "pos_idx": rng.integers(0, 100, (8, 4)).astype(np.int64),
            "log_q": rng.normal(size=16).astype(np.float32),
        }
        _, state_a = create_train_state(config, rng=0)
        _, state_b = create_train_state(config, rng=0)
        full = jax.jit(make_train_step(config))
        lean = jax.jit(make_train_step(config, log_all_losses=False))
        new_a, m_full = full(state_a, batch)
        new_b, m_lean = lean(state_b, batch)
        assert set(m_lean) == {
            f"train/{config.train_loss}",
            "train/grad_norm",
        }
        assert len(m_full) > len(m_lean)
        np.testing.assert_allclose(
            float(m_full[f"train/{config.train_loss}"]),
            float(m_lean[f"train/{config.train_loss}"]),
            rtol=1e-6,
        )
        for a, b in zip(
            jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
