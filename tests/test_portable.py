"""Portable (NumPy-only) encoder export: parity with the flax encoder.

The reference's portability story is an ONNX serving backend
(/root/reference/xfmr_rec/bentoml/service.py:91); here the export is
encoder.npz + portable.json consumed by a pure-NumPy forward
(serving/portable.py). These tests pin forward parity and the
artifact round trip.
"""

import json
import pathlib

import numpy as np
import pytest

from xfmr_rec_tpu.models import HashingTokenizer, ModelConfig, init_encoder
from xfmr_rec_tpu.serving.portable import (
    PortableEncoder,
    _flatten,
    export_portable,
)

TINY = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    max_length=16,
    vocab_size=1000,
    compute_dtype="float32",  # parity target is the f32 graph
)

TEXTS = [
    '{"title":"Toy Story (1995)","genres":["Animation","Comedy"]}',
    '{"gender":"F","age":1,"occupation":10,"zipcode":"48067"}',
    "",
]


def _portable_from(config: ModelConfig, params) -> PortableEncoder:
    flat = {
        key: np.asarray(value, np.float32)
        for key, value in _flatten(params).items()
    }
    cfg = config.model_dump()
    cfg["tokenizer"] = {
        "kind": "hashing",
        "vocab_size": config.vocab_size,
        "max_length": config.max_length,
    }
    return PortableEncoder(cfg, flat)


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"pooling_mode": "cls"},
        {"pooling_mode": "max"},
        {"pooling_mode": "pooler"},
        {"hidden_act": "gelu_new"},
        {"embedding_type": "bloom", "num_buckets": 128, "num_hashes": 2},
        {"embedding_type": "hash", "num_buckets": 128, "num_hashes": 3},
        {"normalize": False},
    ],
)
def test_numpy_forward_matches_flax(overrides):
    config = ModelConfig(**{**TINY, **overrides})
    model, params = init_encoder(config, rng=0)
    tok = HashingTokenizer(vocab_size=1000, max_length=16)
    ids = np.asarray(tok.encode_batch(TEXTS))

    expected = np.asarray(model.apply({"params": params}, ids))
    got = _portable_from(config, params).encode(ids)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_export_round_trip(tmp_path: pathlib.Path):
    """Artifact-shaped export: msgpack + processors.json in, npz-backed
    embeddings out, matching the flax encoder bit-for-tolerance."""
    from flax import serialization

    config = ModelConfig(**TINY)
    model, params = init_encoder(config, rng=3)
    artifact = tmp_path / "artifact"
    artifact.mkdir()
    (artifact / "encoder.msgpack").write_bytes(
        serialization.to_bytes(params)
    )
    (artifact / "processors.json").write_text(
        json.dumps(
            {
                "model": config.model_dump(),
                "data": {
                    "tokenizer": "hashing",
                    "vocab_size": config.vocab_size,
                    "max_length": config.max_length,
                },
            }
        )
    )
    npz = export_portable(artifact)
    assert npz.is_file()

    portable = PortableEncoder.load(artifact)
    got = portable.embed(TEXTS)
    tok = HashingTokenizer(
        vocab_size=config.vocab_size, max_length=config.max_length
    )
    ids = np.asarray(tok.encode_batch(TEXTS))
    expected = np.asarray(model.apply({"params": params}, ids))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
    # unit-norm rows (empty text pools to the CLS-only embedding)
    norms = np.linalg.norm(got, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_two_tower_export_ships_text_subtree(tmp_path: pathlib.Path):
    from flax import serialization

    from xfmr_rec_tpu.models.history import init_two_tower

    config = ModelConfig(
        **{
            **TINY,
            "user_tower": "history",
            "max_history": 4,
            "item_id_embedding": "bloom",
            "item_id_buckets": 64,
        }
    )
    model, params = init_two_tower(config, rng=0)
    artifact = tmp_path / "artifact"
    artifact.mkdir()
    (artifact / "encoder.msgpack").write_bytes(
        serialization.to_bytes(params)
    )
    (artifact / "processors.json").write_text(
        json.dumps(
            {
                "model": config.model_dump(),
                "data": {
                    "tokenizer": "hashing",
                    "vocab_size": config.vocab_size,
                    "max_length": config.max_length,
                },
            }
        )
    )
    export_portable(artifact)
    portable = PortableEncoder.load(artifact)
    got = portable.embed(TEXTS)

    tok = HashingTokenizer(
        vocab_size=config.vocab_size, max_length=config.max_length
    )
    ids = np.asarray(tok.encode_batch(TEXTS))
    expected = np.asarray(
        model.apply({"params": params}, ids)  # __call__ = text path
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
