"""Pure-functional JAX ops: similarity, masking/mining, loss family, top-k."""

from xfmr_rec_tpu.ops.losses import (
    LOSS_NAMES,
    LossConfig,
    compute_loss,
    compute_losses,
)
from xfmr_rec_tpu.ops.masking import (
    hard_mining,
    negative_masks,
    semi_hard_mining,
)
from xfmr_rec_tpu.ops.similarity import squared_distance, weighted_mean

__all__ = [
    "LOSS_NAMES",
    "LossConfig",
    "compute_loss",
    "compute_losses",
    "hard_mining",
    "negative_masks",
    "semi_hard_mining",
    "squared_distance",
    "weighted_mean",
]
