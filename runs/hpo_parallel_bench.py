"""Parallel-HPO wall-clock measurement (VERDICT r3 #3 'done' criterion).

Runs the SAME fixed-seed SHA bracket (real Trainer evaluator, tiny
synthetic corpus, reference search space) sequentially and with
--workers N device-pinned worker processes on this host, asserting the
trial configs/metrics structure matches and reporting the wall-clock
ratio. CPU host: each worker pins 1 virtual CPU device; on a pod slice
the same executor pins disjoint chip subsets (tuning/executor.py).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/hpo_parallel_bench.py [workers]
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from xfmr_rec_tpu.tuning import TrialExecutor, tune
from xfmr_rec_tpu.tuning.hpo import make_trainer_evaluator

NUM_SAMPLES = 4
SEED = 11


def main(workers: int = 4) -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="hpo-bench-"))
    base_model = {
        "hidden_size": 16, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 16,
        "max_length": 16,
    }
    base_data = {
        "data_dir": str(tmp / "data"), "synthetic_if_missing": True,
        "synthetic_users": 60, "synthetic_movies": 80,
        "synthetic_ratings": 1200, "max_length": 16,
    }
    base_trainer = {
        "log_dir": str(tmp / "runs"), "max_epochs": 1,
        "limit_val_batches": 2, "limit_val_loss_batches": 1,
    }
    # materialize the dataset once so neither timing pays the ETL
    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

    RecDataModule(DataConfig.model_validate(base_data)).prepare_data()

    kw = dict(
        num_samples=NUM_SAMPLES, min_resource=0.25, max_resource=0.5,
        reduction_factor=2, seed=SEED,
    )

    evaluate = make_trainer_evaluator(
        base_model=base_model, base_data=base_data,
        base_trainer=base_trainer,
    )
    t0 = time.perf_counter()
    seq = tune(evaluate, **kw)
    t_seq = time.perf_counter() - t0

    spec = {
        "kind": "trainer", "base_model": base_model,
        "base_data": base_data, "base_trainer": base_trainer,
    }
    t0 = time.perf_counter()
    with TrialExecutor(spec, workers=workers, devices_per_worker=1) as ex:
        par = tune(None, executor=ex, **kw)
    t_par = time.perf_counter() - t0

    assert [t.trial_id for t in seq.trials] == [
        t.trial_id for t in par.trials
    ]
    assert [t.config for t in seq.trials] == [t.config for t in par.trials]
    print(
        f"trials={len(seq.trials)} workers={workers}\n"
        f"sequential  : {t_seq:7.1f} s\n"
        f"parallel    : {t_par:7.1f} s  (speedup {t_seq / t_par:.2f}x; "
        "parallel pays per-worker jax import + compile once per process)"
    )
    print(
        "best (seq)  :",
        seq.best_trial.config,
        f"{seq.best_trial.metric:.4f}",
    )
    print(
        "best (par)  :",
        par.best_trial.config,
        f"{par.best_trial.metric:.4f}",
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
