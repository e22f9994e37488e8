"""Hyperparameter search: adaptive sampling + successive halving."""

from xfmr_rec_tpu.tuning.hpo import (
    AdaptiveSampler,
    PlateauStopper,
    SearchSpace,
    TuneResult,
    tune,
    tune_adaptive,
)

__all__ = [
    "AdaptiveSampler",
    "PlateauStopper",
    "SearchSpace",
    "TuneResult",
    "tune",
    "tune_adaptive",
]
