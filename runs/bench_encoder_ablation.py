"""Decompose the h32 ENCODER block cost (round 5, follow-up to
runs/bench_step_ablation.py which showed the loss region is ~5.5 ms of
the 63 ms step at B=4096 — the encoder fwd+bwd+adamw is the other ~57).

Variants (all 3-tower-shaped: 3B rows of seq=64 tokens, h32 L1):

  enc_train       dropout ON  + full grad + adamw   (the real step's block)
  enc_nodrop      dropout OFF + full grad + adamw   (isolates threefry RNG)
  enc_fwd         forward only, deterministic        (inference floor)
  enc_frozen_emb  dropout OFF, gradients only for non-embedding params
                  (isolates the (3B*L, 32) -> (30522, 32) scatter-add of
                  the token-embedding backward)

Pipelined timing, scalar drain. Run: python runs/bench_encoder_ablation.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from xfmr_rec_tpu.training.module import TrainConfig, create_train_state

B = 4096


def main() -> None:
    print(f"devices: {jax.devices()}  rows={3 * B} seq=64 h32")
    rng = np.random.default_rng(0)
    config = TrainConfig()
    tokens = rng.integers(
        1, config.vocab_size, (3 * B, config.max_length)
    ).astype(np.int32)
    tokens = jax.device_put(tokens)

    def timed(step, state, label, metrics_key="g"):
        for _ in range(3):
            state, m = step(state, tokens)
        float(np.asarray(m[metrics_key]).ravel()[0])
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            state, m = step(state, tokens)
        float(np.asarray(m[metrics_key]).ravel()[0])
        print(f"{label}: {(time.perf_counter() - t0) / reps * 1e3:7.2f} ms")

    def make_step(*, dropout: bool, freeze_embed: bool):
        def step(state, tokens):
            def objective(params):
                out = state.apply_fn(
                    {"params": params},
                    tokens,
                    deterministic=not dropout,
                    rngs=(
                        {"dropout": state.dropout_rng} if dropout else None
                    ),
                )
                return jnp.sum(out * out)

            grads = jax.grad(objective)(state.params)
            if freeze_embed:
                grads = jax.tree_util.tree_map_with_path(
                    lambda path, g: (
                        jnp.zeros_like(g)
                        if any(
                            "embed" in str(getattr(k, "key", "")).lower()
                            for k in path
                        )
                        else g
                    ),
                    grads,
                )
            new_state = state.apply_gradients(grads=grads)
            return new_state, {"g": optax.global_norm(grads)}

        return jax.jit(step, donate_argnums=0)

    def make_fwd():
        def step(state, tokens):
            out = state.apply_fn(
                {"params": state.params}, tokens, deterministic=True
            )
            return state, {"g": jnp.sum(out * out)}

        return jax.jit(step)

    _, s = create_train_state(config, rng=0)
    timed(make_step(dropout=True, freeze_embed=False), s, "enc_train     ")
    _, s = create_train_state(config, rng=0)
    timed(make_step(dropout=False, freeze_embed=False), s, "enc_nodrop    ")
    _, s = create_train_state(config, rng=0)
    timed(make_fwd(), s, "enc_fwd       ")
    _, s = create_train_state(config, rng=0)
    timed(make_step(dropout=False, freeze_embed=True), s, "enc_frozen_emb")


if __name__ == "__main__":
    main()
