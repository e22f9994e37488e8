"""Measured reference-quality baseline (VERDICT round-2 item 1).

Trains the REFERENCE's own math — its torch loss classes executed
verbatim from /root/reference/xfmr_rec/losses.py, a fresh transformers
BertModel built with the reference's trained config
(/root/reference/xfmr_rec/models.py:27-39 + lightning.py:32-37: hidden
32, 1 layer, 4 heads, intermediate 32), mean pooling + L2 normalize
(models.py:42-63), AdamW lr 1e-4 (lightning.py:238-239), batch 32,
PairwiseHingeLoss num_negatives=4 (lightning.py:38-41) — on batches
exported from THIS repo's RecDataModule, so both sides see identical
data, identical hashing-token ids, and identical eval splits/metrics.
The WordPiece vocab download is blocked in this image; the controlled
variable is the framework, not the vocab.

Eval matches Trainer._eval_retrieval: every 1/4 epoch, embed the full
item corpus + val users, exact top-20 with train-history exclusion,
metrics via xfmr_rec_tpu.training.metrics.retrieval_metrics on the same
eval_batches stream. Early stopping / best tracking mirror the trainer
(monitor val/RetrievalNormalizedDCG, min_delta 1e-3, patience 3).

Run (CPU-only; keep JAX off the TPU so the chip stays free):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python runs/reference_baseline.py --seeds 0 1 2 --out runs

Writes runs/ref-torch-seed{N}/metrics.jsonl and a final JSON summary
line per seed; the side-by-side table lives in BENCH_NOTES.md / PARITY.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF_LOSSES = pathlib.Path("/root/reference/xfmr_rec/losses.py")

# reference trained config (lightning.py:32-44) + ETL/eval parity knobs
CONFIG = {
    "vocab_size": 30522,
    "hidden_size": 32,
    "num_hidden_layers": 1,
    "num_attention_heads": 4,
    "intermediate_size": 32,
    "max_position_embeddings": 512,
    "train_loss": "PairwiseHingeLoss",
    "num_negatives": 4,
    "sigma": 1.0,
    "margin": 1.0,
    "learning_rate": 1e-4,
    "batch_size": 32,
    "top_k": 20,
    # the reference trainer's own default budget (lightning.py:399-407:
    # max_epochs=1, val_check_interval=1/4); both sides of the
    # side-by-side run this budget
    "max_epochs": 1,
    "val_check_interval": 0.25,
    "early_stopping_min_delta": 1e-3,
    "early_stopping_patience": 3,
}


def load_reference_losses():
    spec = importlib.util.spec_from_file_location("ref_losses", REF_LOSSES)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def build_model(torch):
    """Fresh BertModel with the reference's trained config (models.py:27-39)."""
    from transformers.models.bert import BertConfig, BertModel

    bert_config = BertConfig(
        vocab_size=CONFIG["vocab_size"],
        hidden_size=CONFIG["hidden_size"],
        num_hidden_layers=CONFIG["num_hidden_layers"],
        num_attention_heads=CONFIG["num_attention_heads"],
        intermediate_size=CONFIG["intermediate_size"],
        hidden_act="gelu",
        max_position_embeddings=CONFIG["max_position_embeddings"],
    )
    return BertModel(bert_config)


def encode(model, torch, tokens: np.ndarray) -> "object":
    """Transformer -> mean pooling -> L2 normalize (models.py:42-63 via
    sentence-transformers Pooling(mean) + Normalize)."""
    input_ids = torch.as_tensor(tokens, dtype=torch.long)
    mask = (input_ids != 0).long()
    out = model(input_ids=input_ids, attention_mask=mask)
    hidden = out.last_hidden_state  # (B, L, H)
    maskf = mask.unsqueeze(-1).to(hidden.dtype)
    pooled = (hidden * maskf).sum(1) / maskf.sum(1).clamp(min=1e-9)
    return torch.nn.functional.normalize(pooled, dim=-1)


def encode_rows(model, torch, tokens: np.ndarray, batch: int = 256) -> np.ndarray:
    outs = []
    with torch.inference_mode():
        for start in range(0, len(tokens), batch):
            outs.append(
                encode(model, torch, tokens[start : start + batch]).numpy()
            )
    return np.concatenate(outs)


def evaluate(model, torch, data, subset: str = "val") -> dict[str, float]:
    """Exact top-20 retrieval metrics, same stream/math as the Trainer."""
    import jax.numpy as jnp

    from xfmr_rec_tpu.training.metrics import retrieval_metrics

    corpus = encode_rows(model, torch, data.item_tokens)
    top_k = CONFIG["top_k"]
    totals: dict[str, float] = {}
    count = 0
    for batch in data.eval_batches(subset):
        users = encode_rows(model, torch, batch["user_tokens"])
        scores = users @ corpus.T  # (B, N) exact
        for i, excl in enumerate(batch["exclude_positions"]):
            valid_excl = excl[excl < data.num_items]
            scores[i, valid_excl] = -np.inf
        top = np.argsort(-scores, axis=1)[:, :top_k]
        pred_ids = data.item_ids[top]
        valid = batch["valid"][:, None]
        metrics = retrieval_metrics(
            jnp.asarray(pred_ids),
            jnp.asarray(batch["target_ids"] * valid),
            jnp.asarray(batch["target_ratings"] * valid),
            top_k=top_k,
            prefix=f"{subset}/",
        )
        weight = int(batch["valid"].sum())
        for key, value in metrics.items():
            totals[key] = totals.get(key, 0.0) + float(value) * weight
        count += weight
    return {key: value / max(count, 1) for key, value in totals.items()}


def run_seed(seed: int, out_dir: pathlib.Path, max_steps: int | None) -> dict:
    import torch

    torch.set_num_threads(1)
    torch.manual_seed(seed)

    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

    data = RecDataModule(DataConfig(data_dir="data/ml1m", seed=0))
    data.prepare_data()
    data.setup()

    ref = load_reference_losses()
    loss_cls = getattr(ref, CONFIG["train_loss"])
    loss_fn = loss_cls(
        num_negatives=CONFIG["num_negatives"],
        sigma=CONFIG["sigma"],
        margin=CONFIG["margin"],
    )
    model = build_model(torch)
    optim = torch.optim.AdamW(model.parameters(), lr=CONFIG["learning_rate"])

    run_dir = out_dir / f"ref-torch-seed{seed}"
    run_dir.mkdir(parents=True, exist_ok=True)
    metrics_file = (run_dir / "metrics.jsonl").open("w")
    (run_dir / "config.json").write_text(
        json.dumps({**CONFIG, "seed": seed, "data_dir": "data/ml1m"}, indent=2)
    )

    steps_per_epoch = data.steps_per_epoch
    val_every = max(1, int(steps_per_epoch * CONFIG["val_check_interval"]))
    best, bad_checks, global_step = -np.inf, 0, 0
    gated_best = -np.inf
    best_metrics: dict[str, float] = {}
    best_state: dict | None = None
    stop = False
    t0 = time.time()

    def validate() -> dict[str, float]:
        model.eval()
        metrics = evaluate(model, torch, data, "val")
        model.train()
        row = {"step": global_step, "time": round(time.time() - t0, 1), **metrics}
        metrics_file.write(json.dumps(row) + "\n")
        metrics_file.flush()
        print(f"[seed {seed}] step {global_step}: {metrics}", flush=True)
        return metrics

    model.train()
    for epoch in range(CONFIG["max_epochs"]):
        if stop:
            break
        for batch_idx, batch in enumerate(data.train_batches(epoch)):
            user_embed = encode(model, torch, batch["user_tokens"])
            item_embed = torch.cat(
                [
                    encode(model, torch, batch["item_tokens"]),
                    encode(model, torch, batch["neg_item_tokens"]),
                ]
            )
            loss = loss_fn(
                user_embed=user_embed,
                item_embed=item_embed,
                target=torch.as_tensor(batch["target"]),
                item_idx=torch.as_tensor(batch["item_idx"]),
                pos_idx=torch.as_tensor(batch["pos_idx"]),
            )
            optim.zero_grad()
            loss.backward()
            optim.step()
            global_step += 1
            if global_step % 500 == 0:
                print(
                    f"[seed {seed}] step {global_step} "
                    f"loss {float(loss):.3f} "
                    f"({(time.time() - t0) / global_step * 1e3:.1f} ms/step)",
                    flush=True,
                )
            if max_steps and global_step >= max_steps:
                stop = True
            if (batch_idx + 1) % val_every == 0 or stop:
                val = validate()
                value = val["val/RetrievalNormalizedDCG"]
                # mirror trainer._early_stop_check exactly: the gated
                # best (and the "best" checkpoint) move only on a
                # min_delta improvement over the GATED best, so the
                # test-split comparison selects checkpoints by the same
                # rule on both sides; `best` (any max) is for reporting
                improved = (
                    value > gated_best + CONFIG["early_stopping_min_delta"]
                )
                if value > best:
                    best, best_metrics = value, val
                if improved:
                    gated_best = value
                    best_state = {
                        k: v.detach().clone()
                        for k, v in model.state_dict().items()
                    }
                bad_checks = 0 if improved else bad_checks + 1
                if bad_checks >= CONFIG["early_stopping_patience"]:
                    stop = True
                if stop:
                    break

    # test-split evaluation at the BEST val checkpoint (mirrors the
    # JAX side: orbax "best" restore -> cli test). The test partition
    # is the LOW-holdout-count 80% of holdout users (val = top 20%),
    # so its retrieval metrics run far below val on BOTH sides.
    test_metrics: dict[str, float] = {}
    if best_state is not None:
        model.load_state_dict(best_state)
        model.eval()
        test_metrics = evaluate(model, torch, data, "test")
        print(f"[seed {seed}] test@best: {test_metrics}", flush=True)

    summary = {
        "seed": seed,
        "best_val_ndcg20": best,
        "best_metrics": best_metrics,
        "test_metrics": test_metrics,
        "steps": global_step,
        "wall_s": round(time.time() - t0, 1),
    }
    (run_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print("SUMMARY " + json.dumps(summary), flush=True)
    metrics_file.close()
    return summary


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--out", type=str, default="runs")
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()
    out_dir = pathlib.Path(args.out)
    for seed in args.seeds:
        run_seed(seed, out_dir, args.max_steps)


if __name__ == "__main__":
    main()
