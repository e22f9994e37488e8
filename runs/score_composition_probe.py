"""Score composition: learned two-tower + factorized itemCF + popularity.

The repo's non-learned probes put itemCF+pop at 0.0677 val NDCG@20 vs
the learned flagship's 0.0561 (BENCH_NOTES "What the quality numbers
mean"). This probe measures the *composition*: restore a trained
checkpoint, compute its eval scores exactly as the trainer does, then
add a rank-r factorized CF channel and a popularity prior

    score = learned + w_cf * (cf_u / ||cf_u||) . c_i + w_pop * pop_i

sweeping (w_cf, w_pop) on the even-indexed half of the val users and
reporting the odd half (honest calibration split) plus the full val set
for the chosen weights.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/score_composition_probe.py runs/<run-dir> [rank]
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

TOPK = 20


def factorize(dm, rank: int):
    n_items = len(dm.item_ids)
    pop = np.zeros(n_items)
    for items in dm._train_items_by_user.values():
        for it in items:
            pop[it] += 1
    pop_n = pop / pop.max()
    co = np.zeros((n_items, n_items), np.float32)
    for items in dm._train_items_by_user.values():
        it = np.asarray(items)
        co[np.ix_(it, it)] += 1
    np.fill_diagonal(co, 0)
    deg = np.sqrt(pop)
    deg[deg == 0] = 1
    cos = (co / deg[:, None] / deg[None, :]).astype(np.float64)
    lam, vec = np.linalg.eigh(cos)
    idx = np.argsort(-np.abs(lam))[:rank]
    lam_r, v = lam[idx], vec[:, idx]
    item_f = (v * np.sqrt(np.abs(lam_r))).astype(np.float32)
    hist_f = (item_f * np.sign(lam_r)).astype(np.float32)
    return item_f, hist_f, pop_n.astype(np.float32)


def main(run_dir: str, rank: int = 128) -> None:
    run = pathlib.Path(run_dir)
    cfg = json.loads((run / "config.json").read_text())
    dm = RecDataModule(DataConfig.model_validate(cfg["data"]))
    tcfg = dict(cfg["trainer"])
    tcfg["log_dir"] = str(run / "composition-probe")
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
    n_items = dm.num_items

    item_f, hist_f, pop_n = factorize(dm, rank)

    # gather per-user eval data: learned scores + cf vector + targets
    rows = []  # (learned_scores, cf_unit_scores, excl, tset)
    pos_of_id = {int(m): p for p, m in enumerate(dm.item_ids)}
    for batch in dm.eval_batches("val"):
        users = trainer._eval_user_embeds(batch)
        learned = users @ corpus.T  # (B, n)
        for i, u in enumerate(batch["user_pos"]):
            if not batch["valid"][i]:
                continue
            tset = {
                pos_of_id[int(x)]
                for x in batch["target_ids"][i]
                if int(x) != 0
            }
            if not tset:
                continue
            ti = dm._train_items_by_user.get(int(u), [])
            cf_u = hist_f[ti].sum(0) if ti else np.zeros(rank, np.float32)
            nrm = np.linalg.norm(cf_u)
            if nrm > 0:
                cf_u = cf_u / nrm
            e = batch["exclude_positions"][i]
            e = e[(e >= 0) & (e < n_items)]
            rows.append((learned[i], item_f @ cf_u, e, tset))

    def ndcg(scores_fn, subset) -> float:
        vals = []
        for learned, cf_s, e, tset in subset:
            s = scores_fn(learned, cf_s)
            s = s.copy()
            s[e] = -1e9
            top = np.argpartition(-s, TOPK)[:TOPK]
            top = top[np.argsort(-s[top])]
            hits = [1.0 if p in tset else 0.0 for p in top]
            dcg = sum(h / np.log2(r + 2) for r, h in enumerate(hits))
            idcg = sum(
                1 / np.log2(r + 2) for r in range(min(len(tset), TOPK))
            )
            vals.append(dcg / idcg)
        return float(np.mean(vals))

    cal = rows[0::2]
    held = rows[1::2]
    print(f"users: {len(rows)} (cal {len(cal)} / held {len(held)})")
    print(f"learned only          : cal {ndcg(lambda l, c: l, cal):.4f}  "
          f"held {ndcg(lambda l, c: l, held):.4f}  "
          f"full {ndcg(lambda l, c: l, rows):.4f}")
    print(f"cf only               : full "
          f"{ndcg(lambda l, c: c, rows):.4f}")
    print(f"cf+pop (w_pop=1)      : full "
          f"{ndcg(lambda l, c: c + pop_n, rows):.4f}")

    best = (-1.0, None)
    for w_cf in (0.0, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
        for w_pop in (0.0, 0.25, 0.5, 1.0, 2.0, 4.0):
            v = ndcg(lambda l, c: l + w_cf * c + w_pop * pop_n, cal)
            if v > best[0]:
                best = (v, (w_cf, w_pop))
    (w_cf, w_pop) = best[1]
    print(f"calibrated w_cf={w_cf} w_pop={w_pop}: cal {best[0]:.4f}")
    print(f"  held {ndcg(lambda l, c: l + w_cf * c + w_pop * pop_n, held):.4f}")
    print(f"  full {ndcg(lambda l, c: l + w_cf * c + w_pop * pop_n, rows):.4f}")


if __name__ == "__main__":
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))
