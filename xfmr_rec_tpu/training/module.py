"""Training module: configs, train state, jitted train/eval steps.

Functional equivalent of the reference LightningModule
(/root/reference/xfmr_rec/lightning.py:46-328) re-designed for JAX:

- `TrainConfig` extends the encoder config with the training knobs and
  keeps the reference's trained-config defaults (hidden 32, 1 layer,
  4 heads, intermediate 32, PairwiseHingeLoss, num_negatives 4,
  sigma/margin 1.0, lr 1e-4, top_k 20 — lightning.py:32-44).
- `train_step` computes **all registered losses** for logging and differentiates
  only the configured `train_loss` (lightning.py:137-147, :189-192),
  in a single jit region. The three text towers (user/pos-item/neg-item)
  are concatenated into one (3B, L) encoder pass so the MXU sees one
  large batch instead of three small ones.
- Optimizer is AdamW (lightning.py:238-239); weight decay matches the
  torch AdamW default (0.01).

The step functions are pure and shard-agnostic: under a mesh, batches are
sharded over the 'data' axis and params replicated (see parallel/).
"""

from __future__ import annotations

from typing import Any, Literal

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax import Array

from xfmr_rec_tpu.models.encoder import ModelConfig, TextEncoder, init_encoder
from xfmr_rec_tpu.ops.losses import LossConfig, compute_losses
from xfmr_rec_tpu.params import TOP_K


class TrainConfig(ModelConfig):
    """Reference-compatible trained config + TPU extras."""

    hidden_size: int = 32
    num_hidden_layers: int = 1
    num_attention_heads: int = 4
    intermediate_size: int = 32

    train_loss: str = "PairwiseHingeLoss"
    num_negatives: int = 4
    sigma: float = 1.0
    margin: float = 1.0
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    top_k: int = TOP_K
    use_logq_correction: bool = False
    # DirectAULoss uniformity weight (paper range 0.2-10)
    gamma: float = 1.0
    # MAWULoss user-side uniformity weight; None = use gamma for both
    gamma_user: float | None = None
    # dropout mask generator: rbg = TPU hardware RNG (faster, default),
    # threefry = bit-exact replay of pre-round-5 checkpointed runs
    dropout_rng_impl: Literal["rbg", "threefry"] = "rbg"
    # retrieval index storage (int8 = per-item quantization, 2x catalog
    # capacity per chip at bf16 speed — see index/mips.py); validated at
    # config parse so a typo fails before training spends time
    index_dtype: Literal["bfloat16", "float32", "int8"] = "bfloat16"
    # LR schedule: the reference trains at constant AdamW LR
    # (lightning.py:238-239); cosine decay + linear warmup is a
    # TPU-extra. total_steps is filled in by the Trainer when a
    # schedule needs it (cosine decays to ~0 over the full run).
    lr_schedule: Literal["constant", "cosine"] = "constant"
    warmup_steps: int = 0
    total_steps: int | None = None


class TrainState(train_state.TrainState):
    """Train state with a dropout RNG folded per step."""

    dropout_rng: Array


def create_train_state(
    config: TrainConfig, rng: Array | int = 0
) -> tuple[TextEncoder, TrainState]:
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    params_rng, dropout_rng = jax.random.split(rng)
    from xfmr_rec_tpu.models.history import init_two_tower, needs_two_tower

    if needs_two_tower(config):
        model, params = init_two_tower(config, params_rng)
    else:
        model, params = init_encoder(config, params_rng)
    if config.lr_schedule == "cosine" or config.warmup_steps:
        total = config.total_steps or max(config.warmup_steps + 1, 1000)
        if config.lr_schedule == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=config.learning_rate,
                warmup_steps=config.warmup_steps,
                decay_steps=total,
                end_value=config.learning_rate * 0.01,
            )
        else:
            lr = optax.linear_schedule(
                0.0, config.learning_rate, max(config.warmup_steps, 1)
            )
    else:
        lr = config.learning_rate
    tx = optax.adamw(lr, weight_decay=config.weight_decay)
    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        dropout_rng=dropout_rng,
    )
    return model, state


def loss_config(config: TrainConfig) -> LossConfig:
    return LossConfig(
        num_negatives=config.num_negatives,
        sigma=config.sigma,
        margin=config.margin,
        gamma=config.gamma,
        gamma_user=config.gamma_user,
        use_logq_correction=config.use_logq_correction,
    )


def compute_batch_losses(
    apply_fn,
    params,
    batch: dict[str, Array],
    config: TrainConfig,
    dropout_rng: Array | None = None,
    names: tuple[str, ...] | None = None,
) -> dict[str, Array]:
    """Encode the three towers in one pass and run the full loss family."""
    from xfmr_rec_tpu.models.history import needs_two_tower, uses_item_ids

    batch_size = batch["user_tokens"].shape[0]
    deterministic = dropout_rng is None
    rngs = None if deterministic else {"dropout": dropout_rng}
    if needs_two_tower(config):
        # one text pass over user + pos + neg (+ history) rows, then the
        # identity channels / fusion block (models/history.py train_embeds)
        kwargs = {}
        if config.user_tower == "history":
            kwargs.update(
                hist_tokens=batch["hist_tokens"],
                hist_mask=batch["hist_mask"],
                hist_ratings=batch["hist_ratings"],
            )
            if uses_item_ids(config):
                kwargs["hist_rns"] = batch["hist_rns"]
        if uses_item_ids(config):
            kwargs["item_rns"] = batch["item_idx"].astype(jnp.int32)
        if config.max_bag > 0:
            kwargs.update(
                bag_rns=batch["bag_rns"],
                bag_ratings=batch["bag_ratings"],
                bag_mask=batch["bag_mask"],
            )
        user_embed, item_embed = apply_fn(
            {"params": params},
            batch["user_tokens"],
            batch["item_tokens"],
            batch["neg_item_tokens"],
            deterministic=deterministic,
            rngs=rngs,
            method="train_embeds",
            **kwargs,
        )
    else:
        tokens = jnp.concatenate(
            [
                batch["user_tokens"],
                batch["item_tokens"],
                batch["neg_item_tokens"],
            ]
        )
        embeds = apply_fn(
            {"params": params}, tokens, deterministic=deterministic, rngs=rngs
        )
        user_embed = embeds[:batch_size]
        item_embed = embeds[batch_size:]  # positives then sampled negatives
    return compute_losses(
        user_embed,
        item_embed,
        batch["target"],
        item_idx=batch["item_idx"],
        pos_idx=batch["pos_idx"],
        config=loss_config(config),
        log_q=batch.get("log_q"),
        names=names,
    )


def make_train_step(config: TrainConfig, *, log_all_losses: bool = True):
    """Build the jittable train step for a given static config.

    log_all_losses=True matches the reference (every registered loss
    computed and logged each step, lightning.py:137-147); False computes
    only the configured train loss — identical gradients/updates (the
    extra losses were forward-only aux). MEASURED: only ~2% faster at
    h32/B=4096 (65.0 -> 63.6 ms) — the loss family SHARES the
    similarity matrix and masks, so the step cost lives in that shared
    machinery + backward, not in loss multiplicity (BENCH_NOTES round 4
    MFU section). The knob's value is leaner logs, not speed."""
    train_loss = config.train_loss
    names = None if log_all_losses else (train_loss,)

    def train_step(
        state: TrainState, batch: dict[str, Array]
    ) -> tuple[TrainState, dict[str, Array]]:
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        if config.dropout_rng_impl == "rbg":
            # hardware RNG for the dropout masks: threefry bit-gen is
            # pure VPU work and measurably taxes small-hidden steps
            # (h32/B=4096: 57.0 -> 50.8 ms/step, runs probe round 5);
            # the per-step fold_in above stays threefry (one tiny
            # block), only the mask streams switch generator. Masks
            # differ from threefry's — dropout is stochastic either
            # way; set dropout_rng_impl=threefry for bit-exact replay
            # of pre-round-5 runs.
            data = (
                step_rng
                if jnp.issubdtype(step_rng.dtype, jnp.unsignedinteger)
                else jax.random.key_data(step_rng)
            )
            step_rng = jax.random.wrap_key_data(
                jnp.tile(data, 2), impl="rbg"
            )

        def objective(params):
            losses = compute_batch_losses(
                state.apply_fn, params, batch, config,
                dropout_rng=step_rng, names=names,
            )
            return losses[train_loss], losses

        grads, losses = jax.grad(objective, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {f"train/{name}": value for name, value in losses.items()}
        metrics["train/grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_loss_step(config: TrainConfig):
    """Held-out-loss step: the full loss family, deterministic encoder.

    The reference logs all losses at every val/test step
    (lightning.py:194-206 via compute_losses). Returns raw loss names;
    the caller adds the `val/` / `test/` prefix.
    """

    def eval_step(
        state: TrainState, batch: dict[str, Array]
    ) -> dict[str, Array]:
        return compute_batch_losses(
            state.apply_fn, state.params, batch, config, dropout_rng=None
        )

    return eval_step


def make_encode_fn(model: TextEncoder):
    """Deterministic batched text encoding (corpus / query embedding)."""

    def encode(params: Any, tokens: Array) -> Array:
        return model.apply({"params": params}, tokens, deterministic=True)

    return encode


def make_item_encode_fn(model):
    """Item-tower encoding with identity channels (TwoTowerModel):
    text + ID embedding (re-normalized) + appended bias column."""

    def encode_items(params: Any, tokens: Array, rns: Array) -> Array:
        return model.apply(
            {"params": params},
            tokens,
            rns,
            deterministic=True,
            method="encode_items",
        )

    return encode_items


def make_user_encode_fn(model):
    """Eval/serving user tower for the history model.

    History item embeddings are GATHERED from the corpus embedding matrix
    (already re-embedded by build_index / stored in the serving index)
    instead of re-encoding item text — the user tower then costs one text
    encode plus one (B, H+1, d) fusion block. Identical numerics to the
    training path: the corpus rows ARE this encoder's deterministic
    embeddings of the same item tokens (asserted in tests/test_history.py).
    """

    def encode_users(
        params: Any,
        user_tokens: Array,  # (B, L)
        corpus: Array,  # (N, d) f32 item embeddings (d-dim, no bias col)
        hist_positions: Array,  # (B, H) int, padded slots clipped to 0
        hist_mask: Array,  # (B, H) bool
        hist_ratings: Array,  # (B, H) int
        bag_rns: Array | None = None,  # (B, G)
        bag_ratings: Array | None = None,
        bag_mask: Array | None = None,
    ) -> Array:
        text_emb = model.apply(
            {"params": params}, user_tokens, deterministic=True
        )
        hist_embs = jnp.take(corpus, hist_positions, axis=0)
        return model.apply(
            {"params": params},
            text_emb,
            hist_embs,
            hist_mask,
            hist_ratings,
            bag_rns,
            bag_ratings,
            bag_mask,
            deterministic=True,
            method="fuse_user",
        )

    return encode_users
