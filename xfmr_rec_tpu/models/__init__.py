"""Model zoo: tokenizer + dual text encoder + history tower + CF channel."""

from xfmr_rec_tpu.models.cf import CFChannel, factorize_item_cf
from xfmr_rec_tpu.models.encoder import ModelConfig, TextEncoder, init_encoder
from xfmr_rec_tpu.models.history import (
    HistoryFusion,
    TwoTowerModel,
    init_two_tower,
)
from xfmr_rec_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig

__all__ = [
    "CFChannel",
    "HashingTokenizer",
    "HistoryFusion",
    "ModelConfig",
    "TextEncoder",
    "TokenizerConfig",
    "TwoTowerModel",
    "factorize_item_cf",
    "init_encoder",
    "init_two_tower",
]
