"""Hyperparameter search: random sampling + synchronous successive halving.

Capability parity with the reference's two HPO drivers
(/root/reference/xfmr_rec/flaml.py and ray.py):
- same search space: train_loss in {PairwiseHinge, PairwiseLogistic,
  AlignmentContrastive, MINE}, num_negatives = 2^lograndint(0..6),
  sigma lograndint 1..1000, margin quniform(-1, 1, 0.01), learning_rate
  loguniform (flaml.py:59-79).
- same resource schedule: limit_train_batches as the halving resource,
  1/16 -> 1.0 with reduction factor 2 (flaml.py:96-99).
- same objective: val/RetrievalNormalizedDCG, max (params.py METRIC).

The driver is a single-process successive-halving loop (the TPU is one
device; trial parallelism buys nothing) with a wall-clock budget, JSONL
trial log, and best-trial summary — replacing the FLAML BlendSearch / Ray
Tune machinery with ~150 transparent lines.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
import pathlib
import time
from collections.abc import Callable
from typing import Any

import numpy as np

from xfmr_rec_tpu.params import METRIC

logger = logging.getLogger(__name__)

TRAIN_LOSSES = (
    "PairwiseHingeLoss",
    "PairwiseLogisticLoss",
    "AlignmentContrastiveLoss",
    "MutualInformationNeuralEstimationLoss",
)


@dataclasses.dataclass
class SearchSpace:
    """Samples reference-compatible configs (flaml.py:59-79)."""

    train_losses: tuple[str, ...] = TRAIN_LOSSES
    log_num_negatives: tuple[int, int] = (0, 6)
    sigma: tuple[float, float] = (1.0, 1000.0)
    margin: tuple[float, float, float] = (-1.0, 1.0, 0.01)
    learning_rate: tuple[float, float] = (1e-4, 1e-2)

    def sample(self, rng: np.random.Generator) -> dict[str, Any]:
        lo, hi = self.log_num_negatives
        m_lo, m_hi, m_step = self.margin
        margin = round(
            rng.uniform(m_lo, m_hi) / m_step
        ) * m_step
        return {
            "train_loss": str(rng.choice(self.train_losses)),
            "num_negatives": int(2 ** rng.integers(lo, hi + 1)),
            "sigma": float(
                np.exp(rng.uniform(np.log(self.sigma[0]), np.log(self.sigma[1])))
            ),
            "margin": float(margin),
            "learning_rate": float(
                np.exp(
                    rng.uniform(
                        np.log(self.learning_rate[0]),
                        np.log(self.learning_rate[1]),
                    )
                )
            ),
        }

    def default_point(self) -> dict[str, Any]:
        """The reference's point_to_evaluate (flaml.py:65-72)."""
        return {
            "train_loss": "PairwiseHingeLoss",
            "num_negatives": 1,
            "sigma": 1.0,
            "margin": 1.0,
            "learning_rate": 0.001,
        }


@dataclasses.dataclass
class Trial:
    trial_id: int
    config: dict[str, Any]
    resource: float
    metric: float = -math.inf
    metrics: dict[str, float] = dataclasses.field(default_factory=dict)
    seconds: float = 0.0


@dataclasses.dataclass
class TuneResult:
    trials: list[Trial]
    metric_name: str

    @property
    def best_trial(self) -> Trial:
        return max(self.trials, key=lambda t: t.metric)

    @property
    def best_config(self) -> dict[str, Any]:
        return self.best_trial.config


def tune(
    evaluate: Callable[[dict[str, Any], float], dict[str, float]],
    *,
    space: SearchSpace | None = None,
    num_samples: int = 16,
    min_resource: float = 1 / 16,
    max_resource: float = 1.0,
    reduction_factor: int = 2,
    time_budget_s: float | None = None,
    metric_name: str = METRIC["name"],
    seed: int = 0,
    log_path: str | pathlib.Path | None = None,
    include_default_point: bool = True,
) -> TuneResult:
    """Successive halving over randomly sampled configs.

    `evaluate(config, resource)` runs one training with
    limit_train_batches=resource and returns the val metric dict.
    """
    space = space or SearchSpace()
    rng = np.random.default_rng(seed)
    start = time.time()
    log_file = None
    if log_path is not None:
        log_path = pathlib.Path(log_path)
        log_path.parent.mkdir(parents=True, exist_ok=True)
        log_file = log_path.open("a")

    def out_of_budget() -> bool:
        return (
            time_budget_s is not None and time.time() - start > time_budget_s
        )

    configs = []
    if include_default_point:
        configs.append(space.default_point())
    while len(configs) < num_samples:
        configs.append(space.sample(rng))

    trials: list[Trial] = []
    active = [
        Trial(trial_id=i, config=config, resource=min_resource)
        for i, config in enumerate(configs)
    ]
    next_id = len(active)
    resource = min_resource
    while active:
        for trial in active:
            if out_of_budget():
                logger.info("time budget exhausted")
                break
            t0 = time.time()
            try:
                metrics = evaluate(trial.config, resource)
            except Exception:  # noqa: BLE001 — a failing trial is a data point
                logger.exception("trial %d failed", trial.trial_id)
                metrics = {}
            trial.resource = resource
            trial.metrics = metrics
            trial.metric = metrics.get(metric_name, -math.inf)
            trial.seconds = time.time() - t0
            trials.append(dataclasses.replace(trial))
            if log_file:
                log_file.write(json.dumps(dataclasses.asdict(trial)) + "\n")
                log_file.flush()
            logger.info(
                "trial %d resource=%.4f metric=%.4f config=%s",
                trial.trial_id, resource, trial.metric, trial.config,
            )
        if out_of_budget() or resource >= max_resource:
            break
        # promote the top 1/reduction_factor to the next rung
        ranked = sorted(active, key=lambda t: t.metric, reverse=True)
        keep = max(1, len(ranked) // reduction_factor)
        active = [
            Trial(trial_id=next_id + i, config=t.config, resource=resource)
            for i, t in enumerate(ranked[:keep])
        ]
        next_id += len(active)
        resource = min(max_resource, resource * reduction_factor)
    if log_file:
        log_file.close()
    return TuneResult(trials=trials, metric_name=metric_name)


def make_trainer_evaluator(
    base_model: dict[str, Any] | None = None,
    base_data: dict[str, Any] | None = None,
    base_trainer: dict[str, Any] | None = None,
):
    """evaluate(config, resource) backed by the real Trainer."""
    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
    from xfmr_rec_tpu.training.module import TrainConfig
    from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

    def evaluate(config: dict[str, Any], resource: float) -> dict[str, float]:
        model_config = TrainConfig.model_validate(
            {**(base_model or {}), **config}
        )
        trainer = Trainer(
            model_config,
            data=RecDataModule(DataConfig.model_validate(base_data or {})),
            trainer_config=TrainerConfig(
                **{
                    **(base_trainer or {}),
                    "limit_train_batches": resource,
                }
            ),
        )
        return trainer.fit()

    return evaluate


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", default="data")
    parser.add_argument("--num_samples", type=int, default=16)
    parser.add_argument("--time_budget_s", type=float, default=3600.0)
    parser.add_argument("--log_path", default="runs/tune/trials.jsonl")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    evaluate = make_trainer_evaluator(
        base_data={"data_dir": args.data_dir},
        base_trainer={"log_dir": "runs/tune"},
    )
    result = tune(
        evaluate,
        num_samples=args.num_samples,
        time_budget_s=args.time_budget_s,
        log_path=args.log_path,
        seed=args.seed,
    )
    best = result.best_trial
    if not math.isfinite(best.metric):
        msg = (
            "every trial failed (no val metric produced) — see "
            f"{args.log_path} and the logs above"
        )
        raise SystemExit(msg)
    print(
        json.dumps(
            {"best_metric": best.metric, "best_config": best.config},
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
