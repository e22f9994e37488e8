"""Cold-start probe: what happens when user profiles are anonymized?

The signal analysis (runs/corpus_signal_probes.py, BENCH_NOTES "What the
quality numbers mean") showed the TEXT user tower personalizes by
memorizing near-unique hashed zipcode tokens — implicit user-ID
embeddings. That mechanism dies for any user the model did not train on.
This probe measures it directly: restore a trained checkpoint and
evaluate val NDCG@20 twice —

    full    : the real user profiles (the standard eval)
    anon    : every user's profile text replaced by one constant string
              (no identifying tokens; the history fields, if the model
              has a history tower, are untouched)

A text-tower model should collapse toward the popularity floor (~0.021);
a history-tower model should keep most of its score, because its
personalization rides the (anonymous) behavioral history.

Run: python runs/cold_start_probe.py runs/<run-dir> [runs/<run-dir> ...]
(uses the run's own config.json + ckpt/best; TPU or CPU.)
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

ANON_TEXT = '{"gender":"M","age":25,"occupation":0,"zipcode":"00000"}'


def probe(run_dir: str) -> dict[str, float]:
    run = pathlib.Path(run_dir)
    cfg = json.loads((run / "config.json").read_text())
    data = RecDataModule(DataConfig.model_validate(cfg["data"]))
    tcfg = dict(cfg["trainer"])
    tcfg["log_dir"] = str(run / "coldstart-probe")
    tcfg["run_name"] = ""
    trainer = Trainer(
        TrainConfig.model_validate(cfg["model"]),
        data=data,
        trainer_config=TrainerConfig(**tcfg),
    )
    trainer.setup()
    trainer.restore_checkpoint(str(run / "ckpt" / "best"))

    out: dict[str, float] = {}
    full = trainer.validate()
    out["full"] = full["val/RetrievalNormalizedDCG"]

    real_tokens = data.user_tokens.copy()
    anon_row = data.tokenizer.encode_batch([ANON_TEXT])[0]
    data.user_tokens = np.tile(anon_row, (len(real_tokens), 1))
    trainer.index = None  # force re-embed (item side unchanged, cheap)
    anon = trainer.validate()
    out["anon"] = anon["val/RetrievalNormalizedDCG"]
    data.user_tokens = real_tokens
    return out


def main() -> None:
    runs = sys.argv[1:]
    if not runs:
        raise SystemExit("usage: cold_start_probe.py <run-dir> [...]")
    print(f"{'run':40s} {'full':>8s} {'anon':>8s} {'kept':>6s}")
    for run_dir in runs:
        r = probe(run_dir)
        kept = r["anon"] / max(r["full"], 1e-9)
        print(
            f"{pathlib.Path(run_dir).name:40s} {r['full']:8.4f} "
            f"{r['anon']:8.4f} {kept:5.0%}"
        )


if __name__ == "__main__":
    main()
