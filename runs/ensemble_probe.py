"""Seed-ensemble probe: averaged scores via embedding CONCATENATION.

Averaging K independently-trained two-tower models' scores is exactly
one dot product of concatenated embeddings:

    mean_k q_k . c_k  ==  [q_1; ...; q_K]/K . [c_1; ...; c_K]

so a K-seed ensemble rides the existing MIPS index as a (K*d)-dim
corpus — every exact/Pallas/guaranteed/sharded path, exclusions and
the serving engine work untouched (dim 160 for K=5 x h32 is still tiny
for the scan). This probe measures the val/test NDCG@20 of K = 1..5
prefix ensembles of the round-4 flagship family, both metric
conventions, against the non-learned probe ceiling.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/ensemble_probe.py runs/ml1m-r4-flagship-s*
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


def main(run_dirs: list[str]) -> None:
    per_seed: dict[str, list] = {"val": [], "test": []}
    cf = None
    for run_dir in run_dirs:
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
        corpus = np.asarray(trainer.build_index().corpus, np.float32)
        if cf is None:
            cf = factorize_item_cf(
                dm._train_items_by_user, dm.num_items, rank=8
            )  # only pop/exclusion plumbing reused; rank irrelevant
        for subset in ("val", "test"):
            per_seed[subset].append(
                collect_rows(trainer, dm, corpus, cf, subset)
            )
        print(f"collected {run.name}")

    pop = cf.pop_prior
    for subset in ("val", "test"):
        rows_by_seed = per_seed[subset]
        n_users = len(rows_by_seed[0])
        for k in range(1, len(rows_by_seed) + 1):
            merged = []
            for u in range(n_users):
                learned = np.mean(
                    [rows_by_seed[s][u][0] for s in range(k)], axis=0
                )
                _, cf_s, excl, tgt = rows_by_seed[0][u]
                merged.append((learned, cf_s, excl, tgt))
            b = ndcg(merged, pop, 0.0, 0.0, graded=False)
            g = ndcg(merged, pop, 0.0, 0.0, graded=True)
            print(
                f"{subset}: K={k} ensemble  binary {b:.4f}  graded {g:.4f}"
            )


if __name__ == "__main__":
    main(sys.argv[1:])
