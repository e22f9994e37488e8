"""Model zoo: text tokenizer + flax dual text encoder + history tower."""

from xfmr_rec_tpu.models.encoder import ModelConfig, TextEncoder, init_encoder
from xfmr_rec_tpu.models.history import (
    HistoryFusion,
    TwoTowerModel,
    init_two_tower,
)
from xfmr_rec_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig

__all__ = [
    "HashingTokenizer",
    "HistoryFusion",
    "ModelConfig",
    "TextEncoder",
    "TokenizerConfig",
    "TwoTowerModel",
    "init_encoder",
    "init_two_tower",
]
