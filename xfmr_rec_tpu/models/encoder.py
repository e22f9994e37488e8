"""Dual text encoder: BERT-style flax transformer + pooling + L2 normalize.

Capability parity with the reference model layer
(/root/reference/xfmr_rec/models.py):
- ModelConfig fields (vocab/hidden/layers/heads/intermediate/act/max_pos,
  pooling_mode) keep the reference names and defaults (models.py:14-24).
- The encode path is Transformer -> pooling -> L2 normalize, matching the
  sentence-transformer composition (models.py:42-63), so embeddings are
  unit-norm and `1 - dot` is the cosine distance the retrieval index uses.

TPU-first design choices:
- One flax module, jit/pjit-friendly: fixed (batch, seq) int32 token ids in,
  (batch, hidden) f32 unit embeddings out. No host tokenization in the step.
- `compute_dtype=bfloat16` runs attention/FFN matmuls on the MXU in bf16
  with f32 params and f32 final normalize.
- Compressed embedding tables ("hash" = hash embeddings with learned
  importance weights, Svenstrup et al. 2017; "bloom" = summed multi-hash
  buckets) — README-promised features the reference never implemented.
  Bucket ids are derived in-module by multiplicative rehashing of the
  token ids, so the data pipeline is identical for all table types.
"""

from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pydantic
from jax import Array

# Multiplicative-hash constants (distinct odd 32-bit) for in-module
# bucket derivation of hash/bloom embedding tables.
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


class ModelConfig(pydantic.BaseModel):
    """Encoder hyperparameters. Reference-compatible field names/defaults."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    hidden_act: Literal["gelu", "relu", "silu", "gelu_new"] = "gelu"
    max_position_embeddings: int = 512
    pooling_mode: Literal["mean", "max", "cls", "pooler"] = "mean"

    # TPU-native additions
    normalize: bool = True
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    # Parameter init: None = flax defaults (lecun_normal kernels,
    # fan-in-scaled embeddings); a float = BERT-style normal(std) for
    # every kernel/embedding (the reference's transformers init,
    # BertConfig.initializer_range default 0.02 — the scheme the
    # reference's trained lr 1e-4 was chosen for; quality comparison in
    # BENCH_NOTES round 3).
    initializer_range: float | None = 0.02
    compute_dtype: Literal["float32", "bfloat16"] = "bfloat16"
    # Rematerialize transformer layers in the backward pass
    # (jax.checkpoint): activations AND dropout masks are recomputed
    # instead of stored. At h32 the measured step cost is HBM-layout
    # bound (dropout-mask materialization ~11 ms/step at B=4096,
    # BENCH_NOTES round 5), so trading FLOPs for HBM traffic is the
    # TPU-idiomatic lever. The same RNG keys replay in the recompute,
    # so dropout masks are identical; values match up to XLA
    # reassociation (~1e-7, tests/test_models.py).
    remat: bool = False
    max_length: int = 64
    embedding_type: Literal["dense", "hash", "bloom"] = "dense"
    num_hashes: int = 2
    num_buckets: int = 4096
    # User tower: "text" = the reference's demographics-text encoder;
    # "history" = text profile fused with the user's rated-item history
    # through a small transformer (the reference's unwired
    # PoolingTransformer seam, models.py:66-87 — see models/history.py).
    user_tower: Literal["text", "history"] = "text"
    max_history: int = 16
    history_layers: int = 1
    use_history_ratings: bool = True
    # --- item identity channels (the README-promised hash/Bloom tables
    # applied at the ITEM level — reference README.md:33-36). The
    # reference's "matrix factorization" is a dual encoder over feature
    # text with no ID tables at all (SURVEY §0); these channels add the
    # collaborative-filtering signal its towers cannot express:
    # item_id_embedding: a per-item embedding keyed by movie_rn summed
    #   into the item tower pre-normalize ("bloom" = multi-hash bucket
    #   sum, "hash" = importance-weighted, "dense" = direct table; rn 0
    #   = padding/unknown contributes exactly zero).
    item_id_embedding: Literal["none", "bloom", "hash", "dense"] = "none"
    item_id_buckets: int = 8192
    item_id_hashes: int = 2
    # item_bias: a learned per-item popularity scalar appended as an
    #   extra scoring column — item vectors become (d+1) with the bias,
    #   user/query vectors append a constant 1, so every dot-product
    #   scorer (losses, MIPS index, serving) picks up score = dot + b_i
    #   with zero kernel changes.
    item_bias: bool = False
    # max_bag: >0 adds a CF "bag" fusion slot for the history user
    #   tower: the mean of item-ID embeddings over the user's full
    #   train history (up to max_bag items, most-recent-first) —
    #   FISM/SVD++-style user factors, cheap because the bag lives in
    #   the ID table (no text encode). Train rows mask the row's own
    #   positive out of its bag. Requires user_tower="history" and
    #   item_id_embedding != "none".
    max_bag: int = 0
    # learned per-rating-level weights on bag items (liked vs disliked
    # history enters the bag with different learned magnitude/sign)
    bag_rating_weights: bool = True
    # --- factorized item-CF scoring channel (models/cf.py): rank-r
    # eigenfactors of the degree-normalized train co-occurrence ride the
    # index as extra corpus columns; query vectors append the user's
    # unit-normalized history CF vector scaled by cf_weight, plus a
    # constant cf_pop_weight paired with a popularity-prior column. The
    # composed score — learned dot + cf_weight * itemCF + cf_pop_weight
    # * pop — stays ONE dot product, so every exact/Pallas/guaranteed/
    # sharded top-k path and the mutable catalog work untouched.
    # Non-learned: computed at setup from train interactions; affects
    # retrieval scoring (eval + serving) only, not the training loss.
    # cf_rank=0 disables. Measured: runs/cf_factorization_probe.py,
    # runs/score_composition_probe.py.
    cf_rank: int = 0
    cf_weight: float = 1.0
    cf_pop_weight: float = 0.0

    @pydantic.model_validator(mode="after")
    def _check_item_channels(self) -> "ModelConfig":
        if self.max_bag > 0 and self.user_tower != "history":
            msg = "max_bag > 0 requires user_tower='history' (fusion slot)"
            raise ValueError(msg)
        if self.max_bag > 0 and self.item_id_embedding == "none":
            msg = "max_bag > 0 requires item_id_embedding (the bag IS the ID table)"
            raise ValueError(msg)
        return self


def l2_normalize(x: "Array") -> "Array":
    """Gradient-safe L2 normalize: rows of exactly zero (e.g. an all-PAD
    padded-history slot mean-pools to 0) return 0 with ZERO gradient.
    `x / max(||x||, eps)` is finite forward but its backward is NaN at
    x == 0 (d||x||/dx = x/||x|| = 0/0). Two guards: clamping the SQUARED
    norm before rsqrt kills the NaN through the norm (at sq == 0 the max
    picks the constant branch), and the where() on x itself kills the
    rsqrt(eps)=1e12-scaled direct term — zero rows get gradient exactly 0
    instead of an exploding one."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    x = jnp.where(sq < 1e-24, 0.0, x)
    return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


def _kernel_init(cfg: "ModelConfig"):
    """BERT-style normal(initializer_range) or the flax default."""
    if cfg.initializer_range is None:
        return nn.linear.default_kernel_init
    return nn.initializers.normal(cfg.initializer_range)


def _embed_init(cfg: "ModelConfig"):
    if cfg.initializer_range is None:
        return nn.linear.default_embed_init
    return nn.initializers.normal(cfg.initializer_range)


def _activation(name: str):
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
    }[name]


class CompressedEmbed(nn.Module):
    """Hash / Bloom embedding table over a compressed bucket space.

    bloom: e(t) = sum_i B[h_i(t)]
    hash:  e(t) = sum_i w_i(t) * B[h_i(t)]  with learned per-token
           importance weights w (small (vocab, num_hashes) table).
    """

    vocab_size: int
    num_buckets: int
    num_hashes: int
    features: int
    mode: str  # "hash" | "bloom"
    dtype: jnp.dtype = jnp.float32
    embedding_init: object | None = None

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        kwargs = (
            {"embedding_init": self.embedding_init}
            if self.embedding_init is not None
            else {}
        )
        buckets = nn.Embed(
            self.num_buckets,
            self.features,
            dtype=self.dtype,
            name="buckets",
            **kwargs,
        )
        mults = jnp.asarray(
            _REHASH_MULTIPLIERS[: self.num_hashes], dtype=jnp.uint32
        )
        # multiplicative hash with an xor-fold of the HIGH product bits
        # before the modulus: a bare `(id * m) % 2^k` keeps only the low
        # k product bits, which collide exactly when id1 - id2 is
        # divisible by 2^k regardless of the odd multiplier — all
        # "independent" hashes then induce the SAME partition and the
        # Bloom sum degrades to a single hash. Same fix as
        # models/history.py IdEmbed (tests/test_item_ids.py pins the
        # collision rate there; tests/test_models.py pins it here).
        prod = ids.astype(jnp.uint32)[..., None] * mults
        mixed = prod ^ (prod >> jnp.uint32(16))
        hashed = mixed % jnp.uint32(self.num_buckets)
        vecs = buckets(hashed.astype(jnp.int32))  # (..., num_hashes, feat)
        if self.mode == "hash":
            importance = nn.Embed(
                self.vocab_size,
                self.num_hashes,
                dtype=self.dtype,
                embedding_init=nn.initializers.ones,
                name="importance",
            )
            weights = importance(ids)  # (..., num_hashes)
            return jnp.einsum("...hf,...h->...f", vecs, weights)
        return jnp.sum(vecs, axis=-2)


class TransformerLayer(nn.Module):
    """Post-LN BERT block: self-attention + FFN, residuals, LayerNorms."""

    config: ModelConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self, hidden: Array, mask_bias: Array, deterministic: bool = True
    ) -> Array:
        # NOTE: `deterministic` is positional (not keyword-only) so
        # nn.remat can mark it static (static_argnums counts from the
        # first non-self argument)
        cfg = self.config
        num_heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // num_heads
        kinit = _kernel_init(cfg)

        def proj(name):
            return nn.DenseGeneral(
                (num_heads, head_dim),
                dtype=self.dtype,
                kernel_init=kinit,
                name=name,
            )

        q = proj("query")(hidden)
        k = proj("key")(hidden)
        v = proj("value")(hidden)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        scores = scores + mask_bias  # (b, 1, 1, k) additive
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        probs = nn.Dropout(cfg.dropout_rate)(
            probs, deterministic=deterministic
        )
        context = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attn_out = nn.DenseGeneral(
            cfg.hidden_size,
            axis=(-2, -1),
            dtype=self.dtype,
            kernel_init=kinit,
            name="attn_out",
        )(context)
        attn_out = nn.Dropout(cfg.dropout_rate)(
            attn_out, deterministic=deterministic
        )
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attn_norm"
        )(hidden + attn_out)

        ffn = nn.Dense(
            cfg.intermediate_size,
            dtype=self.dtype,
            kernel_init=kinit,
            name="ffn_in",
        )(hidden)
        ffn = _activation(cfg.hidden_act)(ffn)
        ffn = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=kinit, name="ffn_out"
        )(ffn)
        ffn = nn.Dropout(cfg.dropout_rate)(ffn, deterministic=deterministic)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_norm"
        )(hidden + ffn)


class TextEncoder(nn.Module):
    """Token ids (batch, seq) -> unit-norm sentence embeddings (batch, hidden)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, token_ids: Array, *, deterministic: bool = True) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        mask = token_ids != 0  # PAD_ID == 0

        if cfg.embedding_type == "dense":
            embeds = nn.Embed(
                cfg.vocab_size,
                cfg.hidden_size,
                dtype=dtype,
                embedding_init=_embed_init(cfg),
                name="word_embed",
            )(token_ids)
        else:
            embeds = CompressedEmbed(
                vocab_size=cfg.vocab_size,
                num_buckets=cfg.num_buckets,
                num_hashes=cfg.num_hashes,
                features=cfg.hidden_size,
                mode=cfg.embedding_type,
                dtype=dtype,
                embedding_init=(
                    nn.initializers.normal(cfg.initializer_range)
                    if cfg.initializer_range is not None
                    else None
                ),
                name="word_embed",
            )(token_ids)

        seq_len = token_ids.shape[-1]
        positions = jnp.arange(seq_len)[None, :]
        embeds = embeds + nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=dtype,
            embedding_init=_embed_init(cfg),
            name="position_embed",
        )(positions)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="embed_norm"
        )(embeds)
        hidden = nn.Dropout(cfg.dropout_rate)(
            hidden, deterministic=deterministic
        )

        mask_bias = jnp.where(mask, 0.0, -1e9).astype(dtype)[:, None, None, :]
        layer_cls = TransformerLayer
        if cfg.remat:
            # `deterministic` is a Python bool and must stay static
            # (argnum 3 in the lifted fn: scope, hidden, mask_bias, det)
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        for layer_idx in range(cfg.num_hidden_layers):
            hidden = layer_cls(
                cfg, dtype, name=f"layer_{layer_idx}"
            )(hidden, mask_bias, deterministic)

        pooled = self._pool(hidden, mask, dtype)
        pooled = pooled.astype(jnp.float32)
        if cfg.normalize:
            pooled = l2_normalize(pooled)
        return pooled

    def _pool(self, hidden: Array, mask: Array, dtype) -> Array:
        cfg = self.config
        if cfg.pooling_mode == "cls":
            return hidden[:, 0]
        if cfg.pooling_mode == "pooler":
            return jnp.tanh(
                nn.Dense(
                    cfg.hidden_size,
                    dtype=dtype,
                    kernel_init=_kernel_init(cfg),
                    name="pooler",
                )(hidden[:, 0])
            )
        if cfg.pooling_mode == "max":
            # -1e9, not -inf: an all-PAD row (possible for padded history
            # slots) must pool to a finite value or normalize emits NaN
            masked = jnp.where(mask[..., None], hidden, -1e9)
            return jnp.max(masked, axis=1)
        # mean: mask-weighted average over real tokens
        weights = mask[..., None].astype(hidden.dtype)
        total = jnp.sum(hidden * weights, axis=1)
        count = jnp.maximum(jnp.sum(weights, axis=1), 1e-9)
        return total / count


def init_encoder(
    config: ModelConfig, rng: Array | int = 0
) -> tuple[TextEncoder, dict]:
    """Build a TextEncoder and initialize params with dummy input."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = TextEncoder(config)
    dummy = jnp.zeros((1, config.max_length), dtype=jnp.int32)
    params = model.init({"params": rng}, dummy, deterministic=True)["params"]
    return model, params
