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
    _REHASH_MULTIPLIERS,
    ModelConfig,
    TextEncoder,
    TransformerLayer,
    _embed_init,
    l2_normalize,
)

# rating vocabulary for the fusion's rating embedding: 0 = n/a (profile
# slot / padding), 1..5 = MovieLens star ratings, 6-7 spare
_RATING_VOCAB = 8


def uses_item_ids(config: ModelConfig) -> bool:
    """True when the item tower consumes item identities (movie_rn):
    either an ID embedding or a learned popularity bias is configured."""
    return config.item_id_embedding != "none" or config.item_bias


def needs_two_tower(config: ModelConfig) -> bool:
    """True when the model must be a TwoTowerModel (history user tower
    or any item-identity channel) instead of a bare TextEncoder."""
    return config.user_tower == "history" or uses_item_ids(config)


class IdEmbed(nn.Module):
    """Per-item-ID embedding table keyed by movie_rn (1-based; 0 = pad).

    The hash/Bloom modes are the README-promised compressed tables
    (reference README.md:33-36, never implemented there) applied at the
    item level: "bloom" sums `num_hashes` multiplicative-hash bucket
    rows, "hash" weights them by a learned importance vector keyed by a
    separate hash of the id (Svenstrup et al. 2017 adapted to an
    unbounded id space), "dense" is a direct table (requires
    num_buckets > max rn — the trainer validates against the corpus).
    rn == 0 returns exactly the zero vector, so padded history/bag
    slots and unknown items contribute nothing.
    """

    mode: str  # "bloom" | "hash" | "dense"
    num_buckets: int
    num_hashes: int
    features: int
    dtype: jnp.dtype = jnp.float32
    embedding_init: object | None = None

    @nn.compact
    def __call__(self, rns: Array) -> Array:
        kwargs = (
            {"embedding_init": self.embedding_init}
            if self.embedding_init is not None
            else {}
        )
        if self.mode == "dense":
            table = nn.Embed(
                self.num_buckets,
                self.features,
                dtype=self.dtype,
                name="table",
                **kwargs,
            )
            vec = table(jnp.minimum(rns, self.num_buckets - 1))
        else:
            mults = jnp.asarray(
                _REHASH_MULTIPLIERS[: self.num_hashes], dtype=jnp.uint32
            )
            # multiplicative hash with an xor-fold of the HIGH product
            # bits before the modulus. A bare `(rn * m) % 2^k` keeps
            # only the low k product bits, and those collide exactly
            # when rn1 - rn2 is divisible by 2^k REGARDLESS of the odd
            # multiplier — every "independent" hash then induces the
            # same partition, and the Bloom sum degrades to a single
            # hash (measured: 3.8% full collisions at 20k ids over 2^18
            # buckets = the single-hash birthday rate; the fold
            # restores the expected ~multiplicity-independent rate —
            # tests/test_item_ids.py pins it).
            prod = rns.astype(jnp.uint32)[..., None] * mults
            mixed = prod ^ (prod >> jnp.uint32(16))
            hashed = mixed % jnp.uint32(self.num_buckets)
            vecs = nn.Embed(
                self.num_buckets,
                self.features,
                dtype=self.dtype,
                name="buckets",
                **kwargs,
            )(hashed.astype(jnp.int32))
            if self.mode == "hash":
                # importance keyed by an independent hash of the id
                # (same high-bit fold as the bucket hashes above)
                imp_prod = rns.astype(jnp.uint32) * jnp.uint32(
                    _REHASH_MULTIPLIERS[-1]
                )
                imp_key = (imp_prod ^ (imp_prod >> jnp.uint32(16))) % (
                    jnp.uint32(self.num_buckets)
                )
                importance = nn.Embed(
                    self.num_buckets,
                    self.num_hashes,
                    dtype=self.dtype,
                    embedding_init=nn.initializers.ones,
                    name="importance",
                )(imp_key.astype(jnp.int32))
                vec = jnp.einsum("...hf,...h->...f", vecs, importance)
            else:
                vec = jnp.sum(vecs, axis=-2)
        return jnp.where((rns > 0)[..., None], vec, 0.0)


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
        bag_emb: Array | None = None,  # (B, d) CF-bag embedding slot
        bag_valid: Array | None = None,  # (B,) bool — bag non-empty
        *,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        batch, hist_len, dim = hist_embs.shape
        has_bag = bag_emb is not None

        parts = [text_emb[:, None, :], hist_embs]
        if has_bag:
            # CF bag rides as one extra slot at index max_history + 1
            parts.append(bag_emb[:, None, :])
        seq = jnp.concatenate(parts, axis=1).astype(dtype)  # (B, H+1[+1], d)
        slot_ids = jnp.arange(hist_len + 1)[None, :]
        if has_bag:
            slot_ids = jnp.concatenate(
                [
                    slot_ids,
                    jnp.full((1, 1), cfg.max_history + 1, slot_ids.dtype),
                ],
                axis=1,
            )
        seq = seq + nn.Embed(
            cfg.max_history + (2 if cfg.max_bag > 0 else 1),
            dim,
            dtype=dtype,
            embedding_init=_embed_init(cfg),
            name="slot_embed",
        )(slot_ids)
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
            if has_bag:  # bag slot carries the n/a rating (0)
                ratings = jnp.concatenate(
                    [ratings, jnp.zeros((batch, 1), jnp.int32)], axis=1
                )
            seq = seq + nn.Embed(
                _RATING_VOCAB,
                dim,
                dtype=dtype,
                embedding_init=_embed_init(cfg),
                name="rating_embed",
            )(ratings)

        mask_parts = [jnp.ones((batch, 1), bool), hist_mask.astype(bool)]
        if has_bag:
            valid = (
                jnp.ones((batch,), bool)
                if bag_valid is None
                else bag_valid.astype(bool)
            )
            mask_parts.append(valid[:, None])
        mask = jnp.concatenate(mask_parts, axis=1)
        seq = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="fusion_embed_norm"
        )(seq)
        seq = nn.Dropout(cfg.dropout_rate)(seq, deterministic=deterministic)
        mask_bias = jnp.where(mask, 0.0, -1e9).astype(dtype)[:, None, None, :]
        layer_cls = TransformerLayer
        if cfg.remat:
            # same lifting as the text encoder (encoder.py): the fusion
            # layers carry the flagship's dropout-mask HBM cost too, so
            # the remat knob must cover them (round-5 review finding)
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        for layer_idx in range(cfg.history_layers):
            seq = layer_cls(cfg, dtype, name=f"fusion_layer_{layer_idx}")(
                seq, mask_bias, deterministic
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
    """Shared text encoder + optional item-identity channels + history
    fusion user tower.

    `__call__` is the plain text path (raw queries) so the model is a
    drop-in for TextEncoder in every query-encode graph; the towers ride
    the extra methods:

    - `encode_items(item_tokens, item_rns)`: the item tower — text
      embedding, plus (configured) an ID embedding summed pre-normalize
      and a popularity-bias column appended post-normalize (item vectors
      become (d+1); user vectors append a constant 1, so score =
      dot + b_i everywhere with zero scorer changes).
    - `encode_user(user_tokens, hist_tokens, hist_mask, hist_ratings,
      bag_*)`: trains end-to-end — history items are text-encoded in
      the same batch as the profile, gradients flow through both roles
      of the shared encoder.
    - `fuse_user(text_emb, hist_embs, hist_mask, hist_ratings, bag_*)`:
      the eval/serving path — history embeddings are gathered from the
      corpus matrix (its d-dim part, bias column excluded).
    - `train_embeds(...)`: the one-pass training layout: user + positive
      + negative + history token rows through a single text-encoder call.

    The CF bag (`config.max_bag > 0`) is a fusion slot holding the
    normalized (rating-weighted) mean of item-ID embeddings over the
    user's full train history — FISM/SVD++-style user factors living
    entirely in the ID table, so the bag costs one embedding gather, no
    text encode.
    """

    config: ModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.text = TextEncoder(cfg)
        if cfg.user_tower == "history":
            self.fusion = HistoryFusion(cfg)
        if cfg.item_id_embedding != "none":
            self.item_id = IdEmbed(
                mode=cfg.item_id_embedding,
                num_buckets=cfg.item_id_buckets,
                num_hashes=cfg.item_id_hashes,
                features=cfg.hidden_size,
                dtype=jnp.float32,
                embedding_init=(
                    nn.initializers.normal(cfg.initializer_range)
                    if cfg.initializer_range is not None
                    else None
                ),
            )
        if cfg.item_bias:
            # popularity bias starts at exactly 0 for every item
            self.bias_table = IdEmbed(
                mode=(
                    cfg.item_id_embedding
                    if cfg.item_id_embedding != "none"
                    else "bloom"
                ),
                num_buckets=cfg.item_id_buckets,
                num_hashes=cfg.item_id_hashes,
                features=1,
                dtype=jnp.float32,
                embedding_init=nn.initializers.zeros,
            )
        if cfg.max_bag > 0 and cfg.bag_rating_weights:
            self.bag_rating_weight = self.param(
                "bag_rating_weight",
                nn.initializers.ones,
                (_RATING_VOCAB,),
            )

    def __call__(self, token_ids: Array, *, deterministic: bool = True) -> Array:
        """Raw-text query embedding (no item identity, no bias column)."""
        return self.text(token_ids, deterministic=deterministic)

    # -- item tower ----------------------------------------------------
    def _item_d(self, text_emb: Array, rns: Array | None) -> Array:
        """d-dim item embedding: unit text emb (+ ID emb, re-normalized)."""
        if self.config.item_id_embedding == "none" or rns is None:
            return text_emb
        return l2_normalize(text_emb + self.item_id(rns))

    def _append_bias(self, item_d: Array, rns: Array | None) -> Array:
        if not self.config.item_bias:
            return item_d
        bias = (
            self.bias_table(rns)
            if rns is not None
            else jnp.zeros((*item_d.shape[:-1], 1), item_d.dtype)
        )
        return jnp.concatenate([item_d, bias], axis=-1)

    def _append_one(self, user_emb: Array) -> Array:
        """User/query vectors pair the bias column with a constant 1."""
        if not self.config.item_bias:
            return user_emb
        ones = jnp.ones((*user_emb.shape[:-1], 1), user_emb.dtype)
        return jnp.concatenate([user_emb, ones], axis=-1)

    def encode_items(
        self,
        item_tokens: Array,  # (B, L)
        item_rns: Array | None = None,  # (B,) movie_rn, 0 = unknown
        *,
        deterministic: bool = True,
    ) -> Array:
        text_emb = self.text(item_tokens, deterministic=deterministic)
        return self._append_bias(self._item_d(text_emb, item_rns), item_rns)

    # -- CF bag ----------------------------------------------------------
    def _bag_vec(
        self,
        bag_rns: Array,  # (B, G) movie_rn, 0 = pad
        bag_ratings: Array,  # (B, G) int 0..5
        bag_mask: Array,  # (B, G) bool
    ) -> tuple[Array, Array]:
        """Normalized rating-weighted mean of bag item-ID embeddings.
        Returns (bag_emb (B, d), bag_valid (B,))."""
        cfg = self.config
        vecs = self.item_id(jnp.where(bag_mask, bag_rns, 0))
        weights = bag_mask.astype(jnp.float32)
        if cfg.bag_rating_weights:
            levels = jnp.clip(
                bag_ratings.astype(jnp.int32), 0, _RATING_VOCAB - 1
            )
            weights = weights * self.bag_rating_weight[levels]
        vec = jnp.sum(vecs * weights[..., None], axis=1)
        return l2_normalize(vec), jnp.any(bag_mask, axis=1)

    # -- user tower ------------------------------------------------------
    def fuse_user(
        self,
        text_emb: Array,
        hist_embs: Array,
        hist_mask: Array,
        hist_ratings: Array | None = None,
        bag_rns: Array | None = None,
        bag_ratings: Array | None = None,
        bag_mask: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        bag_emb = bag_valid = None
        if self.config.max_bag > 0 and bag_rns is not None:
            bag_emb, bag_valid = self._bag_vec(
                bag_rns, bag_ratings, bag_mask
            )
        fused = self.fusion(
            text_emb,
            hist_embs,
            hist_mask,
            hist_ratings,
            bag_emb,
            bag_valid,
            deterministic=deterministic,
        )
        return self._append_one(fused)

    def encode_user(
        self,
        user_tokens: Array,  # (B, L)
        hist_tokens: Array,  # (B, H, L)
        hist_mask: Array,  # (B, H)
        hist_ratings: Array | None = None,
        hist_rns: Array | None = None,  # (B, H) movie_rn of history items
        bag_rns: Array | None = None,
        bag_ratings: Array | None = None,
        bag_mask: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        if self.config.user_tower != "history":
            return self._append_one(
                self.text(user_tokens, deterministic=deterministic)
            )
        batch, hist_len, seq_len = hist_tokens.shape
        tokens = jnp.concatenate(
            [user_tokens, hist_tokens.reshape(batch * hist_len, seq_len)]
        )
        embs = self.text(tokens, deterministic=deterministic)
        hist_embs = self._item_d(
            embs[batch:],
            hist_rns.reshape(batch * hist_len)
            if hist_rns is not None
            else None,
        ).reshape(batch, hist_len, -1)
        return self.fuse_user(
            embs[:batch],
            hist_embs,
            hist_mask,
            hist_ratings,
            bag_rns,
            bag_ratings,
            bag_mask,
            deterministic=deterministic,
        )

    def train_embeds(
        self,
        user_tokens: Array,  # (B, L)
        item_tokens: Array,  # (B, L) positives
        neg_item_tokens: Array,  # (B, L) sampled negatives
        hist_tokens: Array | None = None,  # (B, H, L)
        hist_mask: Array | None = None,  # (B, H)
        hist_ratings: Array | None = None,
        item_rns: Array | None = None,  # (2B,) pos then neg movie_rn
        hist_rns: Array | None = None,  # (B, H)
        bag_rns: Array | None = None,  # (B, G)
        bag_ratings: Array | None = None,
        bag_mask: Array | None = None,
        *,
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        """One text-encoder pass over every role -> (user, item) embeds.

        Returns user_embed (B, d[+1]) and item_embed (2B, d[+1]) =
        positives then negatives — the layout compute_losses expects
        (ops/losses.py). The bag input must already mask the row's own
        positive out of its bag (the data module does this at assembly).
        """
        batch = user_tokens.shape[0]
        parts = [user_tokens, item_tokens, neg_item_tokens]
        if self.config.user_tower == "history":
            hist_len, seq_len = hist_tokens.shape[1:]
            parts.append(hist_tokens.reshape(batch * hist_len, seq_len))
        embs = self.text(
            jnp.concatenate(parts), deterministic=deterministic
        )
        item_d = self._item_d(embs[batch : 3 * batch], item_rns)
        item_embed = self._append_bias(item_d, item_rns)
        if self.config.user_tower != "history":
            return self._append_one(embs[:batch]), item_embed
        hist_embs = self._item_d(
            embs[3 * batch :],
            hist_rns.reshape(batch * hist_len)
            if hist_rns is not None
            else None,
        ).reshape(batch, hist_len, -1)
        user_embed = self.fuse_user(
            embs[:batch],
            hist_embs,
            hist_mask,
            hist_ratings,
            bag_rns,
            bag_ratings,
            bag_mask,
            deterministic=deterministic,
        )
        return user_embed, item_embed


def init_two_tower(
    config: ModelConfig, rng: Array | int = 0
) -> tuple[TwoTowerModel, dict]:
    """Build a TwoTowerModel and initialize params (every configured
    channel: text, fusion, ID table, bias table, bag weights)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = TwoTowerModel(config)
    batch = 1
    hist = max(config.max_history, 1)
    bag = max(config.max_bag, 1)
    kwargs = dict(
        user_tokens=jnp.zeros((batch, config.max_length), jnp.int32),
        item_tokens=jnp.zeros((batch, config.max_length), jnp.int32),
        neg_item_tokens=jnp.zeros((batch, config.max_length), jnp.int32),
        item_rns=jnp.zeros((2 * batch,), jnp.int32),
    )
    if config.user_tower == "history":
        kwargs.update(
            hist_tokens=jnp.zeros(
                (batch, hist, config.max_length), jnp.int32
            ),
            hist_mask=jnp.zeros((batch, hist), bool),
            hist_ratings=jnp.zeros((batch, hist), jnp.int32),
            hist_rns=jnp.zeros((batch, hist), jnp.int32),
        )
    if config.max_bag > 0:
        kwargs.update(
            bag_rns=jnp.zeros((batch, bag), jnp.int32),
            bag_ratings=jnp.zeros((batch, bag), jnp.int32),
            bag_mask=jnp.zeros((batch, bag), bool),
        )
    params = model.init(
        {"params": rng},
        deterministic=True,
        method="train_embeds",
        **kwargs,
    )["params"]
    return model, params
