"""Hyperparameter search: random sampling + successive halving (ASHA)."""

from xfmr_rec_tpu.tuning.hpo import SearchSpace, TuneResult, tune

__all__ = ["SearchSpace", "TuneResult", "tune"]
