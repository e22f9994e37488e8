"""Decompose the h32 train-step device time (round-5, VERDICT r4 #3).

Round-4 established the trained config (h32 L1) runs at ~1.5% MFU with
the cost attributed to "the (B, 2B) similarity/masking/mining machinery
+ its backward". This probe separates that claim into measurable parts:

  enc_only    3 tower encodes + backward + adamw, loss region replaced
              by a trivial objective (isolates the encoder block)
  loss_all    loss region alone (embeddings as jit args): all losses,
              mining k=4, pos_idx width 8 — fwd + grad wrt embeddings
  loss_one    same, single train loss only
  loss_nopos  all losses, pos_idx=None (drops the (B, 2B, P) any-match)
  loss_nomine all losses, num_negatives=0 (drops mining selection)
  loss_dense  single PairwiseHingeLoss, no mask/mining args at all
              (similarity matmul + weighted mean fwd+bwd floor)

All timings: pipelined dispatch, one scalar drain (value fetch), the
repo's standard through-relay convention. Run: python
runs/bench_step_ablation.py  (TPU, ~3 min).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from xfmr_rec_tpu.ops.losses import LossConfig, compute_losses
from xfmr_rec_tpu.training.module import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

B = 4096
DIM = 32
POS_W = 8


def timed(fn, *args, reps=30):
    out = fn(*args)
    val = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(val).ravel()[0])  # compile + warm
    for _ in range(3):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def synthetic_embeds(rng):
    u = rng.normal(size=(B, DIM)).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    c = rng.normal(size=(2 * B, DIM)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    target = rng.integers(1, 6, B).astype(np.float32)
    item_idx = rng.integers(1, 10000, 2 * B).astype(np.int64)
    pos_idx = rng.integers(0, 10000, (B, POS_W)).astype(np.int64)
    log_q = rng.normal(size=2 * B).astype(np.float32)
    return u, c, target, item_idx, pos_idx, log_q


def loss_region_fn(*, names, use_pos, k):
    config = LossConfig(num_negatives=k, sigma=1.0, margin=1.0)

    def fwd(u, c, target, item_idx, pos_idx, log_q):
        losses = compute_losses(
            u, c, target,
            item_idx=item_idx,
            pos_idx=pos_idx if use_pos else None,
            config=config,
            log_q=log_q,
            names=names,
        )
        first = names[0] if names else "PairwiseHingeLoss"
        return losses[first], losses

    def step(u, c, target, item_idx, pos_idx, log_q):
        (gu, gc), losses = jax.grad(
            lambda uu, cc: fwd(uu, cc, target, item_idx, pos_idx, log_q),
            argnums=(0, 1),
            has_aux=True,
        )(u, c)
        return jnp.sum(gu * gu) + jnp.sum(gc * gc)

    return jax.jit(step)


def main() -> None:
    print(f"devices: {jax.devices()}  B={B} dim={DIM} posw={POS_W}")
    rng = np.random.default_rng(0)
    config = TrainConfig()

    # full step (reference trained config, all losses)
    step = jax.jit(make_train_step(config), donate_argnums=0)
    _, state = create_train_state(config, rng=0)
    batch = {
        "user_tokens": rng.integers(
            1, config.vocab_size, (B, config.max_length)
        ).astype(np.int32),
        "item_tokens": rng.integers(
            1, config.vocab_size, (B, config.max_length)
        ).astype(np.int32),
        "neg_item_tokens": rng.integers(
            1, config.vocab_size, (B, config.max_length)
        ).astype(np.int32),
        "target": rng.integers(1, 6, B).astype(np.float32),
        "item_idx": rng.integers(1, 10000, 2 * B).astype(np.int64),
        "pos_idx": rng.integers(0, 10000, (B, POS_W)).astype(np.int64),
        "log_q": rng.normal(size=2 * B).astype(np.float32),
    }
    batch = jax.device_put(batch)

    def full(state, batch):
        new_state, metrics = step(state, batch)
        return new_state, metrics

    # keep state donation happy: time manually
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["train/grad_norm"])
    t0 = time.perf_counter()
    reps = 30
    for _ in range(reps):
        state, metrics = step(state, batch)
    float(metrics["train/grad_norm"])
    t_full = (time.perf_counter() - t0) / reps * 1e3
    print(f"full step            : {t_full:7.2f} ms")

    # encoder-only step: identical towers/opt, trivial objective
    from xfmr_rec_tpu.training.module import compute_batch_losses  # noqa

    def make_enc_only(config):
        def enc_step(state, batch):
            def objective(params):
                tokens = jnp.concatenate(
                    [
                        batch["user_tokens"],
                        batch["item_tokens"],
                        batch["neg_item_tokens"],
                    ]
                )
                embeds = state.apply_fn(
                    {"params": params},
                    tokens,
                    deterministic=False,
                    rngs={"dropout": state.dropout_rng},
                )
                return jnp.sum(embeds * embeds)

            grads = jax.grad(objective)(state.params)
            new_state = state.apply_gradients(grads=grads)
            import optax

            return new_state, {"train/grad_norm": optax.global_norm(grads)}

        return enc_step

    enc_step = jax.jit(make_enc_only(config), donate_argnums=0)
    _, state2 = create_train_state(config, rng=0)
    for _ in range(3):
        state2, m2 = enc_step(state2, batch)
    float(m2["train/grad_norm"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state2, m2 = enc_step(state2, batch)
    float(m2["train/grad_norm"])
    t_enc = (time.perf_counter() - t0) / reps * 1e3
    print(f"enc_only             : {t_enc:7.2f} ms")

    # loss-region variants (embeddings as args)
    args = jax.device_put(synthetic_embeds(rng))
    variants = {
        "loss_all   (k=4, pos)": loss_region_fn(
            names=None, use_pos=True, k=4
        ),
        "loss_one   (k=4, pos)": loss_region_fn(
            names=("PairwiseHingeLoss",), use_pos=True, k=4
        ),
        "loss_nopos (k=4)     ": loss_region_fn(
            names=None, use_pos=False, k=4
        ),
        "loss_nomine (pos)    ": loss_region_fn(
            names=None, use_pos=True, k=0
        ),
        "loss_dense (1, nopos)": loss_region_fn(
            names=("PairwiseHingeLoss",), use_pos=False, k=0
        ),
    }
    for name, fn in variants.items():
        ms = timed(fn, *args)
        print(f"{name}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
