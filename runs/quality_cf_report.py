"""Round-4 headline report: flagship family x CF composition (n seeds).

For each run dir (trained flagship seeds, ckpt/best): restore, rebuild
eval scores exactly as the trainer does, compose with the factorized CF
channel at FROZEN weights (w_cf=1, w_pop=2 — calibrated once on the
round-4 id-bag-bias checkpoint's graded cal half, never re-tuned per
seed), and report val + test NDCG@20 in BOTH metric conventions, plus
the cold-start probe (anonymized user profile text, history intact) for
learned vs composed.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/quality_cf_report.py runs/ml1m-r4-flagship-s*
"""

from __future__ import annotations

import json
import pathlib
import tempfile
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from runs.score_composition_probe import collect_rows, ndcg
from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.models.cf import factorize_item_cf
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

W_CF, W_POP, RANK = 1.0, 2.0, 128
ANON_TEXT = '{"gender":"M","age":25,"occupation":0,"zipcode":"00000"}'


def probe_run(run_dir: str) -> dict[str, float]:
    run = pathlib.Path(run_dir)
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
        corpus = corpus[:, : corpus.shape[1] - trainer.cf.rank - 1]
    cf = factorize_item_cf(dm._train_items_by_user, dm.num_items, rank=RANK)
    pop = cf.pop_prior

    out: dict[str, float] = {}
    for subset in ("val", "test"):
        rows = collect_rows(trainer, dm, corpus, cf, subset)
        for graded in (True, False):
            tag = "graded" if graded else "binary"
            out[f"{subset}/learned/{tag}"] = ndcg(
                rows, pop, 0.0, 0.0, graded=graded
            )
            out[f"{subset}/composed/{tag}"] = ndcg(
                rows, pop, W_CF, W_POP, graded=graded
            )

    # cold start: anonymize every user's profile text, keep history
    real_tokens = dm.user_tokens.copy()
    anon_row = dm.tokenizer.encode_batch(
        [ANON_TEXT], trainer.config.max_length
    )[0]
    dm.user_tokens = np.broadcast_to(
        anon_row, real_tokens.shape
    ).copy()
    try:
        rows = collect_rows(trainer, dm, corpus, cf, "val")
        out["anon/learned/graded"] = ndcg(rows, pop, 0.0, 0.0, graded=True)
        out["anon/composed/graded"] = ndcg(
            rows, pop, W_CF, W_POP, graded=True
        )
    finally:
        dm.user_tokens = real_tokens
    return out


def main(run_dirs: list[str]) -> None:
    per_seed = []
    for run_dir in run_dirs:
        result = probe_run(run_dir)
        per_seed.append(result)
        print(f"--- {run_dir}")
        for key, value in sorted(result.items()):
            print(f"    {key:26s} {value:.4f}")
    keys = sorted(per_seed[0])
    print(f"\n=== family (n={len(per_seed)}), frozen w_cf={W_CF} w_pop={W_POP}")
    for key in keys:
        vals = np.array([r[key] for r in per_seed])
        print(f"{key:26s} {vals.mean():.4f} ± {vals.std():.4f}")
    # retention: anon / full, composed
    full = np.array([r["val/composed/graded"] for r in per_seed])
    anon = np.array([r["anon/composed/graded"] for r in per_seed])
    print(
        f"{'cold-start retention':26s} "
        f"{(anon / full).mean():.1%} (composed, graded)"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
