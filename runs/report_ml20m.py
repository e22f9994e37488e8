"""Report for the ML-20M-shape loss sweep (BASELINE config 3,
VERDICT r4 #2): per-loss quality + train throughput at 20M-rating /
138k-user / 27k-item scale, 128-dim encoder, mixed negative sampling.

Reads runs/ml20m-*/metrics.jsonl; prints one JSON line per run plus a
markdown table. NDCG convention: GRADED (trainer metric, torchmetrics
parity — see training/metrics.py). Throughput excludes the first
logged interval (contains compile).

Usage: python runs/report_ml20m.py
"""

from __future__ import annotations

import json
import pathlib

RUNS = pathlib.Path(__file__).resolve().parent
METRIC = "val/RetrievalNormalizedDCG"


def load_run(run_dir: pathlib.Path) -> dict | None:
    metrics = run_dir / "metrics.jsonl"
    if not metrics.is_file() or metrics.stat().st_size == 0:
        return None
    cfg = json.loads((run_dir / "config.json").read_text())["model"]
    best = None
    vals = 0
    train_rows = []
    for line in metrics.read_text().splitlines():
        row = json.loads(line)
        if METRIC in row:
            vals += 1
            if best is None or row[METRIC] > best[METRIC]:
                best = row
        elif any(k.startswith("train/") for k in row):
            train_rows.append((row["step"], row["time"]))
    steps_per_s = None
    if len(train_rows) >= 3:
        # median per-interval rate (robust to compile/val intervals)
        rates = [
            (s1 - s0) / (t1 - t0)
            for (s0, t0), (s1, t1) in zip(train_rows, train_rows[1:])
            if t1 > t0
        ]
        rates.sort()
        steps_per_s = rates[len(rates) // 2]
    batch = json.loads((run_dir / "config.json").read_text())["data"][
        "batch_size"
    ]
    return {
        "run": run_dir.name,
        "loss": cfg["train_loss"],
        "best_ndcg_graded": None if best is None else best[METRIC],
        "best_recall": None if best is None else best.get("val/RetrievalRecall"),
        "best_at_step": None if best is None else best["step"],
        "vals": vals,
        "steps_per_s": steps_per_s,
        "examples_per_s": None
        if steps_per_s is None
        else steps_per_s * batch,
        "last_step": train_rows[-1][0] if train_rows else 0,
    }


def main() -> None:
    rows = []
    for run_dir in sorted(RUNS.glob("ml20m-*")):
        if not run_dir.is_dir():
            continue
        row = load_run(run_dir)
        if row:
            rows.append(row)
            print(json.dumps(row))
    if not rows:
        print("no completed ml20m runs")
        return
    print()
    print(
        "| run | loss | best val NDCG@20 (graded) | recall@20 "
        "| @step | steps/s | examples/s |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        ndcg = (
            "-"
            if r["best_ndcg_graded"] is None
            else f"{r['best_ndcg_graded']:.5f}"
        )
        rec = "-" if r["best_recall"] is None else f"{r['best_recall']:.5f}"
        sps = "-" if r["steps_per_s"] is None else f"{r['steps_per_s']:.1f}"
        eps = (
            "-"
            if r["examples_per_s"] is None
            else f"{r['examples_per_s']:.0f}"
        )
        print(
            f"| {r['run']} | {r['loss']} | {ndcg} | {rec} "
            f"| {r['best_at_step']} | {sps} | {eps} |"
        )


if __name__ == "__main__":
    main()
