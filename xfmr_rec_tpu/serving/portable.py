"""Portable (NumPy-only) inference export of the text encoder.

The reference serves its encoder through an ONNX backend so the trained
model runs outside the training framework
(/root/reference/xfmr_rec/bentoml/service.py:91). The TPU-native
equivalent of that portability story: `export_portable` converts the
serving artifact's flax params into a plain ``encoder.npz`` +
``portable.json``, and `PortableEncoder` re-implements the
TextEncoder forward (models/encoder.py) in pure NumPy — no JAX, no
flax, no TPU — so any Python process with numpy can embed queries
against a trained artifact (e.g. an edge re-ranker or a CPU-only
fallback tier). The hashing tokenizer is already numpy-only, so
`embed(texts)` is end-to-end portable.

Scope: the TEXT encode path (the reference's Embedder surface — item
text, user profile text, raw queries). History-fusion user embeddings
and identity channels stay on the serving engine; for two-tower
artifacts the export ships the shared text tower (its params live
under the ``text`` subtree).

Parity is pinned by tests/test_portable.py: NumPy forward vs the flax
encoder on the same params, and an exported-artifact round trip.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

PORTABLE_NPZ = "encoder.npz"
PORTABLE_JSON = "portable.json"

# keep in sync with models/encoder.py _REHASH_MULTIPLIERS
_REHASH_MULTIPLIERS = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
    3812015801,
    2176924009,
    2957588489,
)


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    for key, value in tree.items():
        name = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(_flatten(value, name))
        else:
            flat[name] = np.asarray(value)
    return flat


def write_portable(
    params,
    model_dump: dict,
    data_dump: dict,
    out_dir: str | pathlib.Path,
) -> pathlib.Path:
    """Write encoder.npz + portable.json from in-memory params.

    `params` is the TEXT-encoder param tree (callers with a two-tower
    tree pass its ``text`` subtree). Used by Trainer.save so every
    artifact ships portable files without re-initializing templates.
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat = {
        key: np.asarray(value, dtype=np.float32)
        for key, value in _flatten(params).items()
    }
    np.savez(out / PORTABLE_NPZ, **flat)
    (out / PORTABLE_JSON).write_text(
        json.dumps(
            {
                "model": model_dump,
                "tokenizer": {
                    "kind": data_dump.get("tokenizer", "hashing"),
                    "vocab_size": data_dump.get(
                        "vocab_size", model_dump["vocab_size"]
                    ),
                    "max_length": data_dump.get(
                        "max_length", model_dump["max_length"]
                    ),
                },
            },
            indent=2,
        )
    )
    return out / PORTABLE_NPZ


def export_portable(
    artifact_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path | None = None,
) -> pathlib.Path:
    """Convert a serving artifact's encoder into the portable format.

    Runs at packaging time (uses flax to deserialize the msgpack); the
    output is consumed by `PortableEncoder` with numpy only.
    """
    from flax import serialization

    from xfmr_rec_tpu.models.encoder import ModelConfig
    from xfmr_rec_tpu.models.history import needs_two_tower

    path = pathlib.Path(artifact_dir)
    out = pathlib.Path(out_dir) if out_dir else path

    manifest = json.loads((path / "processors.json").read_text())
    model_config = ModelConfig.model_validate(manifest["model"])
    if needs_two_tower(model_config):
        from xfmr_rec_tpu.models.history import init_two_tower

        _, template = init_two_tower(model_config, rng=0)
    else:
        from xfmr_rec_tpu.models.encoder import init_encoder

        _, template = init_encoder(model_config, rng=0)
    params = serialization.from_bytes(
        template, (path / "encoder.msgpack").read_bytes()
    )
    if needs_two_tower(model_config):
        params = params["text"]
    return write_portable(
        params, manifest["model"], manifest.get("data", {}), out
    )


def _layer_norm(x: np.ndarray, scale, bias, eps: float) -> np.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _act(name: str):
    if name == "relu":
        return lambda x: np.maximum(x, 0.0)
    if name == "silu":
        return lambda x: x / (1.0 + np.exp(-x))
    if name == "gelu_new":
        c = np.sqrt(2.0 / np.pi)
        return lambda x: 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x**3)))
    # exact gelu (models/encoder.py approximate=False)
    try:
        from scipy.special import erf
    except ImportError:  # pragma: no cover - scipy-free host
        import math

        erf = np.vectorize(math.erf)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    return lambda x: 0.5 * x * (1.0 + erf(x * inv_sqrt2))


class PortableEncoder:
    """NumPy-only mirror of models/encoder.py TextEncoder (deterministic
    path: dropout off, f32 throughout)."""

    def __init__(self, config: dict, params: dict[str, np.ndarray]):
        self.config = config
        self.params = params
        tok = config.get("tokenizer")
        self.tokenizer = None
        if tok and tok.get("kind", "hashing") == "hashing":
            from xfmr_rec_tpu.models.tokenizer import (
                HashingTokenizer,
                TokenizerConfig,
            )

            self.tokenizer = HashingTokenizer(
                TokenizerConfig(
                    vocab_size=tok["vocab_size"], max_length=tok["max_length"]
                )
            )

    @classmethod
    def load(cls, artifact_dir: str | pathlib.Path) -> "PortableEncoder":
        path = pathlib.Path(artifact_dir)
        meta = json.loads((path / PORTABLE_JSON).read_text())
        with np.load(path / PORTABLE_NPZ) as npz:
            params = {key: npz[key].astype(np.float32) for key in npz.files}
        config = dict(meta["model"])
        config["tokenizer"] = meta.get("tokenizer")
        return cls(config, params)

    # --- forward pieces -------------------------------------------------
    def _word_embed(self, ids: np.ndarray) -> np.ndarray:
        cfg, p = self.config, self.params
        etype = cfg.get("embedding_type", "dense")
        if etype == "dense":
            return p["word_embed/embedding"][ids]
        buckets = p["word_embed/buckets/embedding"]
        num_buckets = np.uint32(cfg.get("num_buckets", 4096))
        num_hashes = int(cfg.get("num_hashes", 2))
        mults = np.asarray(
            _REHASH_MULTIPLIERS[:num_hashes], dtype=np.uint32
        )
        with np.errstate(over="ignore"):
            prod = ids.astype(np.uint32)[..., None] * mults
        mixed = prod ^ (prod >> np.uint32(16))
        hashed = (mixed % num_buckets).astype(np.int64)
        vecs = buckets[hashed]  # (..., num_hashes, hidden)
        if etype == "hash":
            weights = p["word_embed/importance/embedding"][ids]
            return np.einsum("...hf,...h->...f", vecs, weights)
        return vecs.sum(axis=-2)

    def _layer(self, idx: int, hidden: np.ndarray, bias4: np.ndarray):
        cfg, p = self.config, self.params
        eps = cfg.get("layer_norm_eps", 1e-12)
        heads = cfg["num_attention_heads"]
        head_dim = cfg["hidden_size"] // heads
        pre = f"layer_{idx}"

        def dense_general(name, x):  # (b, s, h) -> (b, s, heads, hd)
            kernel = p[f"{pre}/{name}/kernel"]  # (h, heads, hd)
            bias = p[f"{pre}/{name}/bias"]  # (heads, hd)
            return np.einsum("bsh,hnd->bsnd", x, kernel) + bias

        q = dense_general("query", hidden)
        k = dense_general("key", hidden)
        v = dense_general("value", hidden)
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        probs = _softmax(scores + bias4)
        context = np.einsum("bhqk,bkhd->bqhd", probs, v)
        attn_out = (
            np.einsum(
                "bqnd,ndh->bqh", context, p[f"{pre}/attn_out/kernel"]
            )
            + p[f"{pre}/attn_out/bias"]
        )
        hidden = _layer_norm(
            hidden + attn_out,
            p[f"{pre}/attn_norm/scale"],
            p[f"{pre}/attn_norm/bias"],
            eps,
        )
        ffn = hidden @ p[f"{pre}/ffn_in/kernel"] + p[f"{pre}/ffn_in/bias"]
        ffn = _act(cfg.get("hidden_act", "gelu"))(ffn)
        ffn = ffn @ p[f"{pre}/ffn_out/kernel"] + p[f"{pre}/ffn_out/bias"]
        return _layer_norm(
            hidden + ffn,
            p[f"{pre}/ffn_norm/scale"],
            p[f"{pre}/ffn_norm/bias"],
            eps,
        )

    def encode(self, token_ids: np.ndarray) -> np.ndarray:
        """(batch, seq) int token ids -> (batch, hidden) f32 embeddings."""
        cfg, p = self.config, self.params
        ids = np.asarray(token_ids)
        mask = ids != 0  # PAD_ID == 0

        hidden = self._word_embed(ids)
        seq_len = ids.shape[-1]
        hidden = hidden + p["position_embed/embedding"][:seq_len]
        hidden = _layer_norm(
            hidden,
            p["embed_norm/scale"],
            p["embed_norm/bias"],
            cfg.get("layer_norm_eps", 1e-12),
        )
        bias4 = np.where(mask, 0.0, -1e9).astype(np.float32)[
            :, None, None, :
        ]
        for idx in range(cfg["num_hidden_layers"]):
            hidden = self._layer(idx, hidden, bias4)

        pooled = self._pool(hidden, mask)
        if cfg.get("normalize", True):
            sq = np.sum(pooled * pooled, axis=-1, keepdims=True)
            pooled = np.where(sq < 1e-24, 0.0, pooled)
            pooled = pooled / np.sqrt(np.maximum(sq, 1e-24))
        return pooled.astype(np.float32)

    def _pool(self, hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
        cfg, p = self.config, self.params
        mode = cfg.get("pooling_mode", "mean")
        if mode == "cls":
            return hidden[:, 0]
        if mode == "pooler":
            return np.tanh(
                hidden[:, 0] @ p["pooler/kernel"] + p["pooler/bias"]
            )
        if mode == "max":
            return np.max(
                np.where(mask[..., None], hidden, -1e9), axis=1
            )
        weights = mask[..., None].astype(hidden.dtype)
        total = (hidden * weights).sum(axis=1)
        count = np.maximum(weights.sum(axis=1), 1e-9)
        return total / count

    def embed(self, texts: list[str]) -> np.ndarray:
        """Raw texts -> unit embeddings (tokenize + encode, numpy only)."""
        if self.tokenizer is None:
            msg = (
                "artifact uses a corpus-trained vocab tokenizer; pass "
                "token ids to encode() instead"
            )
            raise ValueError(msg)
        return self.encode(np.asarray(self.tokenizer.encode_batch(texts)))
