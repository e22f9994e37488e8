"""Eval re-embed barrier: per-chunk-sync vs pipelined (VERDICT r2 #7).

The every-validation corpus re-embed is the reference's known hot spot
(SURVEY §3.2: full-corpus embed + LanceDB rebuild per validation).
Round 2's Trainer._encode_rows blocked on np.asarray per 512-row chunk
— a host-device round trip per chunk. Round 3 dispatches all chunks
asynchronously and transfers once (or not at all: build_index keeps the
corpus on device).

This measures both strategies at 100k and 1M synthetic items with the
reference-trained encoder size (hidden 32, 1 layer, L=64), on the real
chip: `python runs/bench_reembed.py`.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ENCODE_BATCH = 512
MAX_LENGTH = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.models.encoder import ModelConfig, init_encoder

    config = ModelConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=32,
        max_length=MAX_LENGTH,
    )
    model, params = init_encoder(config, rng=0)
    params = jax.device_put(params)
    encode = jax.jit(
        lambda p, t: model.apply({"params": p}, t, deterministic=True)
    )

    rng = np.random.default_rng(0)

    def run_sync(tokens):
        """Round-2 behavior: np.asarray per chunk (host sync each)."""
        outs = []
        for start in range(0, len(tokens), ENCODE_BATCH):
            chunk = tokens[start : start + ENCODE_BATCH]
            outs.append(np.asarray(encode(params, chunk)))
        return np.concatenate(outs)

    def run_pipelined(tokens, to_host):
        """Round-3 behavior: async dispatch, one transfer (or none)."""
        outs = []
        for start in range(0, len(tokens), ENCODE_BATCH):
            chunk = tokens[start : start + ENCODE_BATCH]
            outs.append(encode(params, chunk))
        result = jnp.concatenate(outs)
        if to_host:
            return np.asarray(result)
        return jax.block_until_ready(result)

    for n_items in (102_400, 1_048_576):
        tokens = rng.integers(
            1, config.vocab_size, (n_items, MAX_LENGTH)
        ).astype(np.int32)
        # warmup / compile
        run_pipelined(tokens[: 2 * ENCODE_BATCH], to_host=False)
        results = {}
        for name, fn in (
            ("sync_per_chunk", lambda t: run_sync(t)),
            ("pipelined_to_host", lambda t: run_pipelined(t, True)),
            ("pipelined_on_device", lambda t: run_pipelined(t, False)),
        ):
            start = time.perf_counter()
            fn(tokens)
            results[name] = round(time.perf_counter() - start, 3)
        print(
            json.dumps({"n_items": n_items, "reembed_seconds": results}),
            flush=True,
        )


if __name__ == "__main__":
    main()
