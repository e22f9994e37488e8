"""Score composition: learned two-tower + factorized itemCF + popularity.

The repo's non-learned probes put itemCF+pop at 0.0677 *binary* val
NDCG@20 vs the learned flagship's 0.0561 — but the trainer's metric is
GRADED (ratings as gains, torchmetrics semantics), so the two were
never directly comparable (round-4 finding). This probe restores a
trained checkpoint, computes its eval scores exactly as the trainer
does, adds the rank-r factorized CF channel + popularity prior

    score = learned + w_cf * (cf_u / ||cf_u||) . c_i + w_pop * pop_i

and reports BOTH metric conventions. Weights are calibrated by graded
NDCG on the even-indexed half of the val users, reported on the odd
half, the full val set, and (with --test) the fully held-out test
split at the frozen weights.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/score_composition_probe.py runs/<run-dir> [--rank R] \
     [--test] [--weights W_CF W_POP]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import tempfile
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.models.cf import factorize_item_cf
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

TOPK = 20


def collect_rows(trainer, dm, corpus, cf, subset):
    """Per-user: (learned scores, cf scores, exclusions, {pos: rating})."""
    rows = []
    pos_of_id = {int(m): p for p, m in enumerate(dm.item_ids)}
    n_items = dm.num_items
    for batch in dm.eval_batches(subset):
        users = trainer._eval_user_embeds(batch)[:, : corpus.shape[1]]
        learned = users @ corpus.T
        for i, u in enumerate(batch["user_pos"]):
            if not batch["valid"][i]:
                continue
            tgt = {}
            for tid, rating in zip(
                batch["target_ids"][i], batch["target_ratings"][i]
            ):
                if int(tid) != 0:
                    tgt[pos_of_id[int(tid)]] = float(rating)
            if not tgt:
                continue
            ti = dm._train_items_by_user.get(int(u), [])
            cf_u = (
                cf.user_vectors(np.asarray(ti, dtype=np.int64))
                if ti
                else np.zeros(cf.rank, np.float32)
            )
            e = batch["exclude_positions"][i]
            e = e[(e >= 0) & (e < n_items)]
            rows.append((learned[i], cf.item_factors @ cf_u, e, tgt))
    return rows


def ndcg(rows, pop_n, w_cf, w_pop, *, graded):
    vals = []
    for learned, cf_s, e, tgt in rows:
        s = learned + w_cf * cf_s + w_pop * pop_n
        s = s.copy()
        s[e] = -1e9
        top = np.argpartition(-s, TOPK)[:TOPK]
        top = top[np.argsort(-s[top])]
        gains = [
            (tgt.get(int(p), 0.0) if graded else float(int(p) in tgt))
            for p in top
        ]
        dcg = sum(g / np.log2(r + 2) for r, g in enumerate(gains))
        ideal = sorted(tgt.values(), reverse=True) if graded else [1.0] * len(tgt)
        idcg = sum(
            g / np.log2(r + 2) for r, g in enumerate(ideal[:TOPK])
        )
        vals.append(dcg / idcg if idcg > 0 else 0.0)
    return float(np.mean(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--weights", type=float, nargs=2, default=None)
    args = ap.parse_args()

    run = pathlib.Path(args.run_dir)
    cfg = json.loads((run / "config.json").read_text())
    dm = RecDataModule(DataConfig.model_validate(cfg["data"]))
    tcfg = dict(cfg["trainer"])
    tcfg["log_dir"] = tempfile.mkdtemp(prefix="probe-logs-")  # probes report to stdout/BENCH_NOTES, not run dirs
    tcfg["run_name"] = ""
    trainer = Trainer(
        TrainConfig.model_validate(cfg["model"]),
        data=dm,
        trainer_config=TrainerConfig(**tcfg),
    )
    trainer.setup()
    trainer.restore_checkpoint(str(run / "ckpt" / "best"))
    index = trainer.build_index()
    corpus = np.asarray(index.corpus, dtype=np.float32)
    if trainer.cf is not None:
        # the run itself had the channel on: strip to the learned part so
        # this probe's own factors/weights are the single CF source
        corpus = corpus[:, : corpus.shape[1] - trainer.cf.rank - 1]

    cf = factorize_item_cf(
        dm._train_items_by_user, dm.num_items, rank=args.rank
    )
    pop_n = cf.pop_prior

    rows = collect_rows(trainer, dm, corpus, cf, "val")
    cal, held = rows[0::2], rows[1::2]
    print(f"run={run.name} rank={args.rank} users={len(rows)}")
    for graded in (True, False):
        tag = "graded" if graded else "binary"
        print(
            f"learned only  [{tag}]: "
            f"full {ndcg(rows, pop_n, 0, 0, graded=graded):.4f}"
        )
        print(
            f"cf+pop w=(1,2)[{tag}]: full "
            f"{ndcg([(np.zeros_like(r[0]), r[1], r[2], r[3]) for r in rows], pop_n, 1.0, 2.0, graded=graded):.4f}"
        )

    if args.weights:
        w_cf, w_pop = args.weights
        print(f"frozen weights w_cf={w_cf} w_pop={w_pop}")
    else:
        best = (-1.0, (0.0, 0.0))
        for w_cf in (0.0, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0):
            for w_pop in (0.0, 0.25, 0.5, 1.0, 2.0, 4.0):
                v = ndcg(cal, pop_n, w_cf, w_pop, graded=True)
                if v > best[0]:
                    best = (v, (w_cf, w_pop))
        w_cf, w_pop = best[1]
        print(
            f"calibrated on graded cal half: w_cf={w_cf} w_pop={w_pop} "
            f"(cal {best[0]:.4f})"
        )
    for graded in (True, False):
        tag = "graded" if graded else "binary"
        print(
            f"composed      [{tag}]: "
            f"held {ndcg(held, pop_n, w_cf, w_pop, graded=graded):.4f}  "
            f"full {ndcg(rows, pop_n, w_cf, w_pop, graded=graded):.4f}"
        )
    if args.test:
        trows = collect_rows(trainer, dm, corpus, cf, "test")
        for graded in (True, False):
            tag = "graded" if graded else "binary"
            print(
                f"test learned  [{tag}]: "
                f"{ndcg(trows, pop_n, 0, 0, graded=graded):.4f}   "
                f"composed: {ndcg(trows, pop_n, w_cf, w_pop, graded=graded):.4f}"
            )


if __name__ == "__main__":
    main()
