"""History-aware user tower: text profile fused with rated-item history.

The reference ships (but never wires) a `PoolingTransformer` that encodes a
sequence of *precomputed embeddings* with a presence mask
(/root/reference/xfmr_rec/models.py:66-87 — inputs_embeds forward, mask =
any-nonzero). Its data layer likewise computes a per-interaction rolling
history window (data/prepare.py:229-243) that the model never consumes —
history is only used to exclude items at recommend time
(lightning.py:89-90). This module makes that seam real:

    user_embed = Fusion([profile_text_emb, hist_item_emb_1..H])

where the history item embeddings come from the SAME shared text encoder
that embeds items (the reference uses one sentence-transformer for both
towers), and Fusion is a small transformer over the (H+1)-slot sequence
with learned slot (recency) and rating embeddings, masked mean pooling and
L2 normalization — the PoolingTransformer contract.

Why it matters: the user profile text (demographics) carries little
preference signal; the items a user rated carry most of it. Training/eval
semantics stay two-tower — the fused user embedding is scored against the
same item-text corpus by dot product, so the retrieval index, losses,
metrics and serving surface are unchanged.

TPU-first notes:
- Train step: user/pos/neg/history token rows concatenate into ONE text
  encoder pass ((3+H)·B rows) so the MXU sees one large batch; the fusion
  transformer is a single extra (B, H+1, d) block.
- Eval/serving: history item embeddings are GATHERED from the already
  re-embedded corpus matrix (build_index keeps it on device), so the user
  tower costs one (B, L) text encode + one (B, H+1, d) fusion block —
  no per-request history re-encoding, and the serving artifact needs no
  item token matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from xfmr_rec_tpu.models.encoder import (
    ModelConfig,
    TextEncoder,
    TransformerLayer,
    _embed_init,
    l2_normalize,
)

# rating vocabulary for the fusion's rating embedding: 0 = n/a (profile
# slot / padding), 1..5 = MovieLens star ratings, 6-7 spare
_RATING_VOCAB = 8


class HistoryFusion(nn.Module):
    """Fuse a profile embedding with H history-item embeddings.

    Sequence layout: slot 0 = profile text embedding, slots 1..H = history
    item embeddings most-recent-first. Learned slot embeddings encode
    recency; optional rating embeddings encode the user's judgement of
    each history item. Padded slots are masked out of attention and
    pooling (the PoolingTransformer mask contract, reference
    models.py:81-84).
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        text_emb: Array,  # (B, d) unit-norm profile embedding
        hist_embs: Array,  # (B, H, d) history item embeddings
        hist_mask: Array,  # (B, H) bool — True = real history slot
        hist_ratings: Array | None = None,  # (B, H) int in [0, 5]
        *,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        batch, hist_len, dim = hist_embs.shape

        seq = jnp.concatenate(
            [text_emb[:, None, :], hist_embs], axis=1
        ).astype(dtype)  # (B, H+1, d)
        slots = jnp.arange(hist_len + 1)[None, :]
        seq = seq + nn.Embed(
            cfg.max_history + 1,
            dim,
            dtype=dtype,
            embedding_init=_embed_init(cfg),
            name="slot_embed",
        )(slots)
        if cfg.use_history_ratings:
            ratings = (
                jnp.zeros((batch, hist_len), jnp.int32)
                if hist_ratings is None
                else hist_ratings.astype(jnp.int32)
            )
            ratings = jnp.clip(ratings, 0, _RATING_VOCAB - 1)
            ratings = jnp.concatenate(
                [jnp.zeros((batch, 1), jnp.int32), ratings], axis=1
            )
            seq = seq + nn.Embed(
                _RATING_VOCAB,
                dim,
                dtype=dtype,
                embedding_init=_embed_init(cfg),
                name="rating_embed",
            )(ratings)

        mask = jnp.concatenate(
            [jnp.ones((batch, 1), bool), hist_mask.astype(bool)], axis=1
        )
        seq = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="fusion_embed_norm"
        )(seq)
        seq = nn.Dropout(cfg.dropout_rate)(seq, deterministic=deterministic)
        mask_bias = jnp.where(mask, 0.0, -1e9).astype(dtype)[:, None, None, :]
        for layer_idx in range(cfg.history_layers):
            seq = TransformerLayer(cfg, dtype, name=f"fusion_layer_{layer_idx}")(
                seq, mask_bias, deterministic=deterministic
            )

        weights = mask[..., None].astype(seq.dtype)
        pooled = jnp.sum(seq * weights, axis=1) / jnp.maximum(
            jnp.sum(weights, axis=1), 1e-9
        )
        pooled = pooled.astype(jnp.float32)
        if cfg.normalize:
            pooled = l2_normalize(pooled)
        return pooled


class TwoTowerModel(nn.Module):
    """Shared text encoder + history fusion user tower.

    `__call__` is the plain text path (items, corpus, raw queries) so the
    model is a drop-in for TextEncoder in every encode graph; the user
    tower rides the extra methods:

    - `encode_user(user_tokens, hist_tokens, hist_mask, hist_ratings)`:
      trains end-to-end — history items are text-encoded in the same
      batch as the profile, gradients flow through both roles of the
      shared encoder.
    - `fuse_user(text_emb, hist_embs, hist_mask, hist_ratings)`: the
      eval/serving path — history embeddings are gathered from the
      corpus matrix instead of re-encoded.
    - `train_embeds(...)`: the one-pass training layout: user + positive
      + negative + history token rows through a single text-encoder call.
    """

    config: ModelConfig

    def setup(self) -> None:
        self.text = TextEncoder(self.config)
        self.fusion = HistoryFusion(self.config)

    def __call__(self, token_ids: Array, *, deterministic: bool = True) -> Array:
        return self.text(token_ids, deterministic=deterministic)

    def fuse_user(
        self,
        text_emb: Array,
        hist_embs: Array,
        hist_mask: Array,
        hist_ratings: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        return self.fusion(
            text_emb,
            hist_embs,
            hist_mask,
            hist_ratings,
            deterministic=deterministic,
        )

    def encode_user(
        self,
        user_tokens: Array,  # (B, L)
        hist_tokens: Array,  # (B, H, L)
        hist_mask: Array,  # (B, H)
        hist_ratings: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        batch, hist_len, seq_len = hist_tokens.shape
        tokens = jnp.concatenate(
            [user_tokens, hist_tokens.reshape(batch * hist_len, seq_len)]
        )
        embs = self.text(tokens, deterministic=deterministic)
        return self.fusion(
            embs[:batch],
            embs[batch:].reshape(batch, hist_len, -1),
            hist_mask,
            hist_ratings,
            deterministic=deterministic,
        )

    def train_embeds(
        self,
        user_tokens: Array,  # (B, L)
        item_tokens: Array,  # (B, L) positives
        neg_item_tokens: Array,  # (B, L) sampled negatives
        hist_tokens: Array,  # (B, H, L)
        hist_mask: Array,  # (B, H)
        hist_ratings: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        """One text-encoder pass over every role -> (user, item) embeds.

        Returns user_embed (B, d) fused with history, and item_embed
        (2B, d) = positives then negatives — the layout compute_losses
        expects (ops/losses.py).
        """
        batch, hist_len, seq_len = hist_tokens.shape
        tokens = jnp.concatenate(
            [
                user_tokens,
                item_tokens,
                neg_item_tokens,
                hist_tokens.reshape(batch * hist_len, seq_len),
            ]
        )
        embs = self.text(tokens, deterministic=deterministic)
        user_text = embs[:batch]
        item_embed = embs[batch : 3 * batch]
        hist_embs = embs[3 * batch :].reshape(batch, hist_len, -1)
        user_embed = self.fusion(
            user_text,
            hist_embs,
            hist_mask,
            hist_ratings,
            deterministic=deterministic,
        )
        return user_embed, item_embed


def init_two_tower(
    config: ModelConfig, rng: Array | int = 0
) -> tuple[TwoTowerModel, dict]:
    """Build a TwoTowerModel and initialize params (text + fusion)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = TwoTowerModel(config)
    dummy_tokens = jnp.zeros((1, config.max_length), dtype=jnp.int32)
    dummy_hist = jnp.zeros(
        (1, config.max_history, config.max_length), dtype=jnp.int32
    )
    dummy_mask = jnp.zeros((1, config.max_history), dtype=bool)
    dummy_ratings = jnp.zeros((1, config.max_history), dtype=jnp.int32)
    params = model.init(
        {"params": rng},
        dummy_tokens,
        dummy_hist,
        dummy_mask,
        dummy_ratings,
        deterministic=True,
        method="encode_user",
    )["params"]
    return model, params
