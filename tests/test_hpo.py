"""HPO: search space sampling, successive halving promotion, budgets."""

import numpy as np

from xfmr_rec_tpu.tuning import SearchSpace, tune


class TestSearchSpace:
    def test_samples_in_bounds(self):
        space = SearchSpace()
        rng = np.random.default_rng(0)
        for _ in range(50):
            cfg = space.sample(rng)
            assert cfg["train_loss"] in space.train_losses
            assert cfg["num_negatives"] in {1, 2, 4, 8, 16, 32, 64}
            assert 1.0 <= cfg["sigma"] <= 1000.0
            assert -1.0 <= cfg["margin"] <= 1.0
            assert 1e-4 <= cfg["learning_rate"] <= 1e-2
            # margin quantized to 0.01
            assert abs(cfg["margin"] * 100 - round(cfg["margin"] * 100)) < 1e-6

    def test_default_point_is_reference(self):
        point = SearchSpace().default_point()
        assert point["train_loss"] == "PairwiseHingeLoss"
        assert point["num_negatives"] == 1


class TestSuccessiveHalving:
    def test_promotes_best_config(self):
        """A config whose metric grows with resource must win."""
        calls = []

        def evaluate(config, resource):
            calls.append((config["learning_rate"], resource))
            # quality = closeness of lr to 1e-3, scaled by resource
            quality = 1.0 / (1 + abs(np.log10(config["learning_rate"]) + 3))
            return {"val/RetrievalNormalizedDCG": quality * resource}

        result = tune(
            evaluate, num_samples=8, min_resource=0.25, max_resource=1.0,
            reduction_factor=2, seed=1,
        )
        resources = sorted({r for _, r in calls})
        assert resources == [0.25, 0.5, 1.0]
        # rung sizes shrink 8 -> 4 -> 2
        assert sum(1 for _, r in calls if r == 0.25) == 8
        assert sum(1 for _, r in calls if r == 0.5) == 4
        assert sum(1 for _, r in calls if r == 1.0) == 2
        # the winner is the best full-resource trial
        full = [t for t in result.trials if t.resource == 1.0]
        assert result.best_trial.metric == max(t.metric for t in full)

    def test_failed_trials_dont_crash(self):
        def evaluate(config, resource):
            if config["train_loss"] == "PairwiseLogisticLoss":
                raise RuntimeError("boom")
            return {"val/RetrievalNormalizedDCG": resource}

        result = tune(evaluate, num_samples=6, min_resource=0.5, seed=2)
        assert len(result.trials) > 0
        assert np.isfinite(result.best_trial.metric)

    def test_time_budget_stops(self):
        import time

        def evaluate(config, resource):
            time.sleep(0.05)
            return {"val/RetrievalNormalizedDCG": 0.5}

        result = tune(
            evaluate, num_samples=100, min_resource=0.25,
            time_budget_s=0.3, seed=3,
        )
        assert len(result.trials) < 100

    def test_trial_log_written(self, tmp_path):
        def evaluate(config, resource):
            return {"val/RetrievalNormalizedDCG": resource}

        log = tmp_path / "trials.jsonl"
        tune(evaluate, num_samples=4, min_resource=1.0, log_path=log)
        lines = log.read_text().strip().splitlines()
        assert len(lines) == 4

    def test_real_trainer_smoke(self, tmp_path):
        """One real trial through make_trainer_evaluator."""
        from xfmr_rec_tpu.data.prepare import prepare_movielens
        from xfmr_rec_tpu.data.synthetic import generate_movielens
        from xfmr_rec_tpu.tuning.hpo import make_trainer_evaluator

        generate_movielens(
            tmp_path, num_users=25, num_movies=60, num_ratings=500, seed=4
        )
        prepare_movielens(str(tmp_path), overwrite=True)
        evaluate = make_trainer_evaluator(
            base_model=dict(
                hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                intermediate_size=32, vocab_size=300,
                max_position_embeddings=32, max_length=8,
                compute_dtype="float32",
            ),
            base_data=dict(
                data_dir=str(tmp_path), batch_size=8, vocab_size=300,
                max_length=8,
            ),
            base_trainer=dict(
                log_dir=str(tmp_path / "runs"), limit_val_batches=1,
                max_steps=2,
            ),
        )
        result = tune(
            evaluate, num_samples=2, min_resource=1.0, max_resource=1.0,
            seed=5,
        )
        assert len(result.trials) == 2
        assert result.best_trial.metric > -np.inf
