"""Report for the items10m hash/Bloom campaign (BASELINE config 4,
VERDICT r4 #1): memory vs quality vs throughput of compressed ID tables
at a vocab where compression matters (10,000,000 items).

Reads runs/items10m-{dense,hash,bloom}-s*/metrics.jsonl and prints a
markdown table plus one JSON line per run. Memory is analytic from the
run's config (IdEmbed param bytes, f32, + 2x Adam moments), matching
models/history.py IdEmbed:
  dense: buckets x hidden
  bloom: buckets x hidden
  hash:  buckets x hidden + buckets x num_hashes (importance)

Usage: python runs/report_items10m.py
"""

from __future__ import annotations

import json
import pathlib

RUNS = pathlib.Path(__file__).resolve().parent
METRIC = "val/RetrievalNormalizedDCG"


def table_bytes(cfg: dict) -> int:
    mode = cfg["item_id_embedding"]
    buckets = cfg["item_id_buckets"]
    hidden = cfg["hidden_size"]
    n = buckets * hidden
    if mode == "hash":
        n += buckets * cfg.get("num_hashes", 2)
    return n * 4


def load_run(run_dir: pathlib.Path) -> dict | None:
    metrics = run_dir / "metrics.jsonl"
    if not metrics.is_file() or metrics.stat().st_size == 0:
        return None
    cfg = json.loads((run_dir / "config.json").read_text())["model"]
    best = None
    train_rows = []
    for line in metrics.read_text().splitlines():
        row = json.loads(line)
        if METRIC in row:
            if best is None or row[METRIC] > best[METRIC]:
                best = row
        elif any(k.startswith("train/") for k in row):
            train_rows.append((row["step"], row["time"]))
    steps_per_s = None
    if len(train_rows) >= 3:
        # median per-interval rate: robust to the compile-bearing first
        # interval and to intervals that contain a validation pass
        rates = [
            (s1 - s0) / (t1 - t0)
            for (s0, t0), (s1, t1) in zip(train_rows, train_rows[1:])
            if t1 > t0
        ]
        rates.sort()
        steps_per_s = rates[len(rates) // 2]
    return {
        "run": run_dir.name,
        "mode": cfg["item_id_embedding"],
        "buckets": cfg["item_id_buckets"],
        "table_mb": table_bytes(cfg) / 2**20,
        "train_state_mb": 3 * table_bytes(cfg) / 2**20,
        "best_ndcg": None if best is None else best[METRIC],
        "best_recall": None if best is None else best.get("val/RetrievalRecall"),
        # the train objective on the holdout: the quality-retention
        # signal that stays above the noise floor at 10M-item sparsity
        "val_hinge": None
        if best is None
        else best.get("val/PairwiseHingeLoss"),
        "val_infonce": None
        if best is None
        else best.get("val/InfomationNoiseContrastiveEstimationLoss"),
        "steps_per_s": steps_per_s,
        "last_step": train_rows[-1][0] if train_rows else 0,
    }


def main() -> None:
    rows = []
    for run_dir in sorted(RUNS.glob("items10m-*")):
        if not run_dir.is_dir() or run_dir.name.endswith("-smoke"):
            continue
        row = load_run(run_dir)
        if row:
            rows.append(row)
            print(json.dumps(row))
    if not rows:
        print("no completed items10m runs")
        return
    print()
    print(
        "| run | mode | table (MB) | +Adam (MB) | best val NDCG@20 (graded) "
        "| val hinge | steps/s |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        ndcg = "-" if r["best_ndcg"] is None else f"{r['best_ndcg']:.2e}"
        hinge = "-" if r["val_hinge"] is None else f"{r['val_hinge']:.1f}"
        sps = "-" if r["steps_per_s"] is None else f"{r['steps_per_s']:.1f}"
        print(
            f"| {r['run']} | {r['mode']} | {r['table_mb']:.1f} "
            f"| {r['train_state_mb']:.1f} | {ndcg} | {hinge} | {sps} |"
        )
    # n>=3 headline cell: bloom mean +/- std (keep 0.0 seeds — at 10M-item
    # sparsity a zero-hit seed is a legitimate observation, not missing data)
    bloom = [
        r["best_ndcg"]
        for r in rows
        if r["mode"] == "bloom" and r["best_ndcg"] is not None
    ]
    if len(bloom) >= 2:
        mean = sum(bloom) / len(bloom)
        var = sum((x - mean) ** 2 for x in bloom) / (len(bloom) - 1)
        print(
            f"\nbloom headline (n={len(bloom)}): "
            f"{mean:.2e} +/- {var ** 0.5:.2e} GRADED NDCG@20 (val, the "
            "trainer metric — torchmetrics convention)"
        )


if __name__ == "__main__":
    main()
