"""Train-step MFU accounting (VERDICT r3 #5).

For the reference-trained config (hidden 32, 1 layer) and the
reference-default encoder (hidden 384, 3 layers), measures the full
train step (3 tower encodes + the (B, 2B) loss family + backward +
adamw) across batch sizes, separating RELAY DISPATCH from DEVICE time:

  - blocking: one step per host->device round trip (worst case, what a
    naive loop pays on a remote-relay TPU),
  - pipelined: N steps dispatched back-to-back, one sync at the end —
    steady-state DEVICE time per step once dispatch overlaps compute.

FLOPs per step come from XLA's own cost model on the compiled step
(`compiled.cost_analysis()['flops']`) — not hand math — so MFU =
xla_flops / (device_time * peak). Peak assumed 197 TFLOP/s bf16 (TPU
v5e public spec); the tiny config compute-path is bf16 (matmuls),
f32 master weights.

Run: python runs/bench_train_mfu.py  (TPU; ~4 min)
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from xfmr_rec_tpu.training.module import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

PEAK_BF16 = 197e12  # TPU v5e per-chip peak, public spec

CONFIGS = {
    "trained (h32 L1)": TrainConfig(),
    "default (h384 L3)": TrainConfig(
        hidden_size=384,
        num_hidden_layers=3,
        num_attention_heads=12,
        intermediate_size=1536,
    ),
}


def synthetic_batch(batch, seq, vocab, rng):
    return {
        "user_tokens": rng.integers(1, vocab, (batch, seq)).astype(np.int32),
        "item_tokens": rng.integers(1, vocab, (batch, seq)).astype(np.int32),
        "neg_item_tokens": rng.integers(1, vocab, (batch, seq)).astype(
            np.int32
        ),
        "target": rng.integers(1, 6, batch).astype(np.float32),
        "item_idx": rng.integers(1, 10000, 2 * batch).astype(np.int64),
        "pos_idx": rng.integers(0, 10000, (batch, 8)).astype(np.int64),
        "log_q": rng.normal(size=2 * batch).astype(np.float32),
    }


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    header = (
        f"{'config':18s} {'B':>5s} {'XLA GFLOP':>10s} {'block ms':>9s} "
        f"{'pipe ms':>8s} {'disp ms':>8s} {'MFU':>6s} {'ex/s':>9s}"
    )
    print(header)
    for name, config in CONFIGS.items():
        step = jax.jit(make_train_step(config), donate_argnums=0)
        # h384 at B=4096 exceeds one chip's HBM (the 8-loss (B, 2B)
        # matrices fwd+bwd need ~29.5 GB — measured OOM), so the big
        # config tops out at 2048
        sizes = (256, 1024, 4096) if config.hidden_size <= 64 else (
            256, 1024, 2048)
        for batch_size in sizes:
            _, state = create_train_state(config, rng=0)
            batch = synthetic_batch(
                batch_size, config.max_length, config.vocab_size, rng
            )
            batch = jax.device_put(batch)
            lowered = step.lower(state, batch)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            flops = float(
                (cost or {}).get("flops", float("nan"))
            )
            # warmup (and state donation bootstrap). NOTE: the axon relay
            # acks readiness before remote completion, so block_until_ready
            # is NOT a sync here — every timing below drains an actual
            # VALUE (float() fetch), the same harness convention as every
            # probe in runs/ (BENCH_NOTES "scalar drain").
            for _ in range(3):
                state, metrics = step(state, batch)
            float(metrics["train/grad_norm"])

            times = []
            for _ in range(8):
                t0 = time.perf_counter()
                state, metrics = step(state, batch)
                float(metrics["train/grad_norm"])
                times.append(time.perf_counter() - t0)
            block_ms = float(np.median(times)) * 1e3

            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                state, metrics = step(state, batch)
            float(metrics["train/grad_norm"])
            pipe_ms = (time.perf_counter() - t0) / reps * 1e3

            mfu = flops / (pipe_ms / 1e3) / PEAK_BF16
            print(
                f"{name:18s} {batch_size:5d} {flops / 1e9:10.1f} "
                f"{block_ms:9.2f} {pipe_ms:8.2f} "
                f"{block_ms - pipe_ms:8.2f} {mfu:6.1%} "
                f"{batch_size / (pipe_ms / 1e3):9.0f}"
            )


if __name__ == "__main__":
    main()
