"""Model zoo: text tokenizer + flax dual text encoder."""

from xfmr_rec_tpu.models.encoder import ModelConfig, TextEncoder, init_encoder
from xfmr_rec_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig

__all__ = [
    "HashingTokenizer",
    "ModelConfig",
    "TextEncoder",
    "TokenizerConfig",
    "init_encoder",
]
