"""Parallel HPO trial execution (tuning/executor.py).

Capability parity with the reference's Ray Tune trial parallelism
(/root/reference/xfmr_rec/ray.py:105-191): N worker processes, each
pinned to a disjoint device subset, evaluating one SHA rung
concurrently. The rung barrier makes results at fixed seeds identical
to the sequential loop — asserted here — and the trainer-spec test
runs the real Trainer in 2 CPU-pinned workers end-to-end.

Module-level eval functions below are imported *by the worker
processes* via the {"kind": "import"} spec (closures don't pickle).
"""

import math
import os
import time

from xfmr_rec_tpu.tuning import (
    SearchSpace,
    TrialExecutor,
    tune,
    worker_device_env,
)

_HERE = "tests.test_hpo_executor"


def eval_deterministic(config, resource):
    """Pure function of (config, resource) — same answer in any process."""
    quality = 1.0 / (1 + abs(math.log10(config["learning_rate"]) + 3))
    return {"val/RetrievalNormalizedDCG": quality * resource}


def eval_sleepy(config, resource):
    """Records its own wall-clock window so the parent can prove overlap."""
    t0 = time.time()
    time.sleep(1.5)
    out = eval_deterministic(config, resource)
    out["t_start"] = t0
    out["t_end"] = time.time()
    out["pid"] = float(os.getpid())
    return out


def eval_flaky(config, resource):
    """Fails for half the space — a failing trial must stay a data point."""
    if config["learning_rate"] > 1e-3:
        msg = "synthetic trial failure"
        raise ValueError(msg)
    return eval_deterministic(config, resource)


class TestWorkerDeviceEnv:
    def test_cpu_env(self):
        env = worker_device_env(1, 4, platform="cpu", devices_per_worker=2)
        assert env["JAX_PLATFORMS"] == "cpu"
        assert "device_count=2" in env["XLA_FLAGS"]

    def test_tpu_subsets_are_disjoint(self):
        seen = set()
        for wid in range(4):
            env = worker_device_env(
                wid, 4, platform="tpu", devices_per_worker=2
            )
            chips = set(env["TPU_VISIBLE_DEVICES"].split(","))
            assert len(chips) == 2
            assert not chips & seen
            seen |= chips
        assert seen == {str(c) for c in range(8)}

    def test_tpu_workers_clamp_to_present_chips(self):
        """A 1-chip host (or the CPU test env, where jax.devices() is
        the virtual mesh) must clamp tpu workers so no worker pins a
        chip that doesn't exist — half-failing rungs are worse than
        serializing."""
        import jax

        n = len(jax.devices())
        ex = TrialExecutor(
            {"kind": "import", "path": f"{_HERE}:eval_deterministic"},
            workers=n + 5,
            platform="tpu",
        )
        try:
            assert ex.workers == n
        finally:
            ex.shutdown()

    def test_unknown_platform_raises(self):
        try:
            worker_device_env(0, 1, platform="gpu")
        except ValueError as e:
            assert "gpu" in str(e)
        else:  # pragma: no cover
            raise AssertionError("expected ValueError")


class TestExecutorMatchesSequential:
    def test_same_trials_same_winner(self, tmp_path):
        """Fixed seed ⇒ the executor reproduces the sequential loop."""
        kw = dict(
            num_samples=6, min_resource=0.25, max_resource=1.0,
            reduction_factor=2, seed=7,
        )
        seq = tune(eval_deterministic, **kw)
        with TrialExecutor(
            {"kind": "import", "path": f"{_HERE}:eval_deterministic"},
            workers=3,
        ) as ex:
            par = tune(None, executor=ex, **kw)
        assert [(t.trial_id, t.resource) for t in seq.trials] == [
            (t.trial_id, t.resource) for t in par.trials
        ]
        for s, p in zip(seq.trials, par.trials):
            assert s.config == p.config
            assert s.metric == p.metric
        assert seq.best_trial.config == par.best_trial.config

    def test_failed_trials_are_data_points(self):
        with TrialExecutor(
            {"kind": "import", "path": f"{_HERE}:eval_flaky"}, workers=2
        ) as ex:
            result = tune(
                None, executor=ex, num_samples=6,
                min_resource=0.5, max_resource=1.0, seed=0,
            )
        failed = [t for t in result.trials if not t.metrics]
        ok = [t for t in result.trials if t.metrics]
        assert failed and ok  # the sampled space straddles lr=1e-3
        assert all(t.metric == -math.inf for t in failed)
        assert math.isfinite(result.best_trial.metric)


class TestExecutorConcurrency:
    def test_trials_overlap_across_processes(self):
        """One rung of 4 sleepy trials on 4 workers: windows must overlap
        and at least two distinct worker pids must have run them."""
        space = SearchSpace()
        with TrialExecutor(
            {"kind": "import", "path": f"{_HERE}:eval_sleepy"}, workers=4
        ) as ex:
            result = tune(
                None, executor=ex, space=space, num_samples=4,
                min_resource=1.0, max_resource=1.0, seed=1,
            )
        windows = [
            (t.metrics["t_start"], t.metrics["t_end"]) for t in result.trials
        ]
        assert len(windows) == 4
        overlaps = sum(
            1
            for i in range(4)
            for j in range(i + 1, 4)
            if windows[i][0] < windows[j][1] and windows[j][0] < windows[i][1]
        )
        assert overlaps >= 1, f"no concurrent trials: {windows}"
        pids = {t.metrics["pid"] for t in result.trials}
        assert len(pids) >= 2, f"all trials ran in one process: {pids}"


class TestTrainerSpecEndToEnd:
    def test_real_trainer_in_cpu_pinned_workers(self, tmp_path):
        """2 workers × 1 CPU device each run the real Trainer on synthetic
        data; both trials return a finite val metric."""
        data_dir = str(tmp_path / "data")
        spec = {
            "kind": "trainer",
            "base_model": {
                "hidden_size": 16, "num_hidden_layers": 1,
                "num_attention_heads": 2, "intermediate_size": 16,
                "max_length": 16,
            },
            "base_data": {
                "data_dir": data_dir, "synthetic_if_missing": True,
                "synthetic_users": 30, "synthetic_movies": 40,
                "synthetic_ratings": 400, "max_length": 16,
            },
            "base_trainer": {
                "log_dir": str(tmp_path / "runs"), "max_epochs": 1,
                "limit_val_batches": 2, "limit_val_loss_batches": 1,
            },
        }
        # materialize the synthetic dataset once in the parent so the two
        # workers don't race the ETL (prepare is FileLock'd anyway, but a
        # warm dir keeps the test fast and deterministic)
        from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

        RecDataModule(
            DataConfig.model_validate(spec["base_data"])
        ).prepare_data()
        with TrialExecutor(spec, workers=2, devices_per_worker=1) as ex:
            result = tune(
                None, executor=ex, num_samples=2,
                min_resource=0.25, max_resource=0.25, seed=0,
            )
        assert len(result.trials) == 2
        for t in result.trials:
            assert math.isfinite(t.metric), t.metrics
            assert t.metric > 0
        assert all(t.seconds > 0 for t in result.trials)
