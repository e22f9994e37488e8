"""HPO: search space sampling, successive halving promotion, budgets."""

import numpy as np

from xfmr_rec_tpu.tuning import (
    AdaptiveSampler,
    PlateauStopper,
    SearchSpace,
    tune,
    tune_adaptive,
)


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

    def test_explicit_configs_bypass_sampling(self):
        seen = []

        def evaluate(config, resource):
            seen.append(config["learning_rate"])
            return {"val/RetrievalNormalizedDCG": 0.1}

        cfgs = [
            {**SearchSpace().default_point(), "learning_rate": lr}
            for lr in (1e-4, 2e-4, 3e-4)
        ]
        result = tune(
            evaluate, configs=cfgs, min_resource=1.0, max_resource=1.0,
        )
        assert sorted(seen) == [1e-4, 2e-4, 3e-4]
        assert len(result.trials) == 3


def _objective(config, resource):
    """Smooth peak at lr=1e-3, sigma=10, margin=0.5, PairwiseHingeLoss."""
    score = 1.0
    score *= 1.0 / (1.0 + abs(np.log10(config["learning_rate"]) + 3))
    score *= 1.0 / (1.0 + abs(np.log10(config["sigma"]) - 1))
    score *= 1.0 / (1.0 + abs(config["margin"] - 0.5))
    if config["train_loss"] != "PairwiseHingeLoss":
        score *= 0.5
    return {"val/RetrievalNormalizedDCG": score * resource}


class TestAdaptiveSampler:
    def test_proposals_stay_in_bounds(self):
        space = SearchSpace()
        sampler = AdaptiveSampler(space, seed=0, n_startup=4)
        rng = np.random.default_rng(1)
        # seed with observations so the perturbation path is exercised
        for _ in range(10):
            cfg = space.sample(rng)
            sampler.observe(cfg, float(rng.random()))
        for _ in range(100):
            cfg = sampler.propose()
            assert cfg["train_loss"] in space.train_losses
            assert cfg["num_negatives"] in {1, 2, 4, 8, 16, 32, 64}
            assert 1.0 <= cfg["sigma"] <= 1000.0
            assert -1.0 <= cfg["margin"] <= 1.0
            assert abs(cfg["margin"] * 100 - round(cfg["margin"] * 100)) < 1e-6
            assert 1e-4 <= cfg["learning_rate"] <= 1e-2

    def test_nonfinite_observations_ignored(self):
        sampler = AdaptiveSampler(SearchSpace(), seed=0)
        sampler.observe(SearchSpace().default_point(), -np.inf)
        assert sampler.observations == []

    def test_beats_random_on_smooth_objective(self):
        """Same trial budget: adaptive must find a better optimum than
        random sampling (averaged over seeds to avoid a lucky draw)."""

        def best_of(sample_fn, seed, n=48):
            space = SearchSpace()
            rng = np.random.default_rng(seed)
            sampler = AdaptiveSampler(space, seed=seed, n_startup=8)
            best = -np.inf
            for _ in range(n):
                cfg = (
                    sampler.propose() if sample_fn == "adaptive"
                    else space.sample(rng)
                )
                metric = _objective(cfg, 1.0)["val/RetrievalNormalizedDCG"]
                sampler.observe(cfg, metric)
                best = max(best, metric)
            return best

        adaptive = np.mean([best_of("adaptive", s) for s in range(5)])
        random = np.mean([best_of("random", s) for s in range(5)])
        assert adaptive > random


class TestPlateauStopper:
    def test_stops_after_patience(self):
        stopper = PlateauStopper(patience=3, min_delta=0.01)
        assert not stopper.update(0.5)
        assert not stopper.update(0.505)  # below min_delta: stale
        assert not stopper.update(0.5)
        assert stopper.update(0.49)
        assert stopper.stopped

    def test_improvement_resets(self):
        stopper = PlateauStopper(patience=2, min_delta=0.0)
        stopper.update(0.1)
        stopper.update(0.05)
        assert not stopper.update(0.2)  # improvement resets stale count
        assert not stopper.update(0.1)
        assert stopper.update(0.1)


class TestTuneAdaptive:
    def test_plateau_stops_experiment(self):
        def evaluate(config, resource):
            return {"val/RetrievalNormalizedDCG": 0.5}  # never improves

        result = tune_adaptive(
            evaluate, total_samples=64, bracket_size=4,
            min_resource=1.0, max_resource=1.0,
            plateau=PlateauStopper(patience=5), seed=0,
        )
        # stops after ~patience trials, far short of 64 proposals
        assert len(result.trials) < 20

    def test_reaches_optimum_with_fewer_trials_than_random(self):
        """VERDICT item 8's shape: adaptive reaches random's best in
        fewer trials on the smooth objective."""
        random_result = tune(
            _objective, num_samples=24, min_resource=1.0,
            max_resource=1.0, seed=7,
        )
        target = random_result.best_trial.metric

        adaptive_result = tune_adaptive(
            _objective, total_samples=24, bracket_size=6,
            min_resource=1.0, max_resource=1.0, seed=7,
            plateau=PlateauStopper(patience=100),
        )
        metrics = [t.metric for t in adaptive_result.trials]
        reached = next(
            (i for i, m in enumerate(metrics) if m >= target), None
        )
        assert reached is not None and reached + 1 <= len(
            random_result.trials
        )

    def test_bracket_resources_follow_sha(self):
        calls = []

        def evaluate(config, resource):
            calls.append(resource)
            return _objective(config, resource)

        tune_adaptive(
            evaluate, total_samples=8, bracket_size=4,
            min_resource=0.25, max_resource=1.0, reduction_factor=2,
            seed=1, plateau=PlateauStopper(patience=100),
        )
        assert sorted(set(calls)) == [0.25, 0.5, 1.0]

    def test_warm_start_proposes_near_prior_elite(self, tmp_path):
        """warm_start_sampler: seeded observations skip the random
        startup phase; proposals perturb the prior run's elite."""
        import json

        from xfmr_rec_tpu.tuning.hpo import (
            AdaptiveSampler,
            SearchSpace,
            warm_start_sampler,
        )

        space = SearchSpace()
        elite = {
            "train_loss": "PairwiseHingeLoss",
            "num_negatives": 8,
            "sigma": 7.9,
            "margin": 0.73,
            "learning_rate": 7e-4,
        }
        log = tmp_path / "trials.jsonl"
        rows = [{"config": elite, "metric": 0.05}]
        rng = np.random.default_rng(0)
        for _ in range(15):
            rows.append({"config": space.sample(rng), "metric": 0.01})
        rows.append({"config": space.sample(rng), "metric": None})  # failed
        log.write_text("".join(json.dumps(r) + "\n" for r in rows))

        # elite_frac tiny -> n_elite=1: every proposal perturbs the
        # prior run's best config (no random startup phase re-paid)
        sampler = AdaptiveSampler(
            space, seed=3, explore=0.0, elite_frac=0.01
        )
        loaded = warm_start_sampler(sampler, log)
        assert loaded == 16  # the null-metric row is skipped
        for _ in range(8):
            prop = sampler.propose()
            # lr/sigma jitter lognormally around the elite; num_negatives
            # moves at most one power of two
            assert abs(np.log(prop["learning_rate"] / 7e-4)) < 2.5
            assert prop["num_negatives"] in (4, 8, 16)

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


class TestTPESampler:
    """Surrogate-model proposals (VERDICT r4 #7): same interface as
    AdaptiveSampler, global density-ratio model over observations."""

    def _space(self):
        from xfmr_rec_tpu.tuning.hpo import SearchSpace

        return SearchSpace()

    def test_startup_is_random_then_model_based(self):
        from xfmr_rec_tpu.tuning.hpo import TPESampler

        space = self._space()
        sampler = TPESampler(space, seed=0, n_startup=4)
        rng = np.random.default_rng(0)
        for _ in range(4):
            cfg = sampler.propose()
            sampler.observe(cfg, float(rng.random()))
        # after startup, proposals remain valid members of the space
        for _ in range(6):
            cfg = sampler.propose()
            sampler.observe(cfg, float(rng.random()))
            assert cfg["train_loss"] in space.train_losses
            assert 1 <= cfg["num_negatives"] <= 2 ** space.log_num_negatives[1]
            assert space.sigma[0] <= cfg["sigma"] <= space.sigma[1]
            assert space.margin[0] <= cfg["margin"] <= space.margin[1]
            lr_lo, lr_hi = space.learning_rate
            assert lr_lo <= cfg["learning_rate"] <= lr_hi

    def test_seeded_determinism(self):
        from xfmr_rec_tpu.tuning.hpo import TPESampler

        def run(seed):
            sampler = TPESampler(self._space(), seed=seed, n_startup=3)
            out = []
            for i in range(8):
                cfg = sampler.propose()
                sampler.observe(cfg, float(i % 3))
                out.append(cfg)
            return out

        assert run(7) == run(7)
        assert run(7) != run(8)

    def test_concentrates_on_good_region(self):
        """Feed observations where one loss + high lr dominates: the
        model-based proposals must prefer that region vs the prior."""
        from xfmr_rec_tpu.tuning.hpo import TPESampler

        space = self._space()
        sampler = TPESampler(space, seed=1, n_startup=4, n_candidates=32)
        rng = np.random.default_rng(1)
        for _ in range(40):
            cfg = space.sample(rng)
            good = (
                cfg["train_loss"] == "AlignmentContrastiveLoss"
                and cfg["learning_rate"] > 1e-3
            )
            sampler.observe(cfg, 1.0 if good else 0.0)
        hits = 0
        for _ in range(20):
            cfg = sampler.propose()
            hits += cfg["train_loss"] == "AlignmentContrastiveLoss"
        assert hits >= 12  # prior rate would be ~5/20

    def test_composes_with_tune_adaptive(self, tmp_path):
        from xfmr_rec_tpu.tuning.hpo import TPESampler, tune_adaptive

        space = self._space()

        def evaluate(cfg, resource):
            val = 1.0 - abs(np.log10(cfg["learning_rate"]) + 3.0)
            return {"val/RetrievalNormalizedDCG": val * resource}

        result = tune_adaptive(
            evaluate,
            space=space,
            total_samples=8,
            bracket_size=4,
            sampler=TPESampler(space, seed=0, n_startup=2),
            log_path=tmp_path / "trials.jsonl",
        )
        assert len(result.trials) >= 8
        assert np.isfinite(result.best_trial.metric)

    def test_warm_start_feeds_tpe(self, tmp_path):
        import json

        from xfmr_rec_tpu.tuning.hpo import TPESampler, warm_start_sampler

        space = self._space()
        rows = [
            {"config": space.sample(np.random.default_rng(i)), "metric": i}
            for i in range(5)
        ]
        path = tmp_path / "prev.jsonl"
        path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        sampler = TPESampler(space, seed=0)
        loaded = warm_start_sampler(sampler, path)
        assert loaded == 5
        assert len(sampler.observations) == 5
