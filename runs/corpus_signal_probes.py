"""Non-learned ranking probes: how much signal does the corpus hold?

Answers "what should a perfect model score?" on the synthetic-ML1M
corpus, with the same val-split / exclusion / NDCG@20 protocol the
trainer uses. Probes (none involve training):

- popularity: global train-interaction count ranking
- genre-CF: rank by cosine(item genre vector, user's train genre
  profile) — exactly the generative signal (synthetic.py plants
  archetype->genre preferences)
- genre+pop: alpha * genre-CF + popularity
- item-item CF: cosine co-occurrence over train interactions, summed
  over the user's train items
- itemCF+pop: normalized item-CF + popularity

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python runs/corpus_signal_probes.py [data_dir]

Round-3 measurements (data/ml1m, seed-0 corpus) — see BENCH_NOTES
"What the quality numbers mean":
    popularity            0.0210
    genre-CF (skyline)    0.0654
    genre+pop alpha=1     0.0654
    item-item CF          0.0650
    itemCF+pop            0.0677   <- practical ceiling
"""

from __future__ import annotations

import re
import sys

import numpy as np

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

TOPK = 20


def main(data_dir: str = "data/ml1m", subset: str = "val") -> None:
    dm = RecDataModule(DataConfig(data_dir=data_dir))
    dm.setup()
    genres = []
    for text in dm.item_texts:
        m = re.search(r'"genres":\s*\[(.*?)\]', text)
        genres.append(
            set(re.findall(r'"([^"]+)"', m.group(1))) if m else set()
        )
    all_g = sorted(set().union(*genres))
    gidx = {g: i for i, g in enumerate(all_g)}
    mat = np.zeros((len(genres), len(all_g)))
    for i, gs in enumerate(genres):
        for g in gs:
            mat[i, gidx[g]] = 1
    gn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-9)
    n_items = len(genres)
    pos_of_id = {int(m): p for p, m in enumerate(dm.item_ids)}

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
    cos = co / deg[:, None] / deg[None, :]

    def evaluate(score_fn, name):
        # binary NDCG (the round-3 probe convention) AND graded NDCG
        # (ratings as gains — the trainer's torchmetrics convention), so
        # probe ceilings are directly comparable to trainer val metrics
        ndcgs = []
        graded = []
        for batch in dm.eval_batches(subset):
            upos = batch["user_pos"]
            valid = batch["valid"]
            scores = np.stack([score_fn(int(u)) for u in upos])
            excl = batch["exclude_positions"]
            for i in range(len(upos)):
                e = excl[i]
                e = e[(e >= 0) & (e < n_items)]
                scores[i, e] = -1e9
            top = np.argsort(-scores, axis=1)[:, :TOPK]
            tid = batch["target_ids"]
            trat = batch["target_ratings"]
            for i in range(len(upos)):
                if not valid[i]:
                    continue
                tset = {pos_of_id[int(x)] for x in tid[i] if int(x) != 0}
                rating_of = {
                    pos_of_id[int(x)]: float(r)
                    for x, r in zip(tid[i], trat[i])
                    if int(x) != 0
                }
                if not tset:
                    continue
                hits = [1.0 if p in tset else 0.0 for p in top[i]]
                dcg = sum(h / np.log2(r + 2) for r, h in enumerate(hits))
                idcg = sum(
                    1 / np.log2(r + 2) for r in range(min(len(tset), TOPK))
                )
                ndcgs.append(dcg / idcg)
                gains = [rating_of.get(int(p), 0.0) for p in top[i]]
                gdcg = sum(g / np.log2(r + 2) for r, g in enumerate(gains))
                ideal = sorted(rating_of.values(), reverse=True)[:TOPK]
                gidcg = sum(
                    g / np.log2(r + 2) for r, g in enumerate(ideal)
                )
                graded.append(gdcg / gidcg if gidcg > 0 else 0.0)
        print(
            f"{name:22s} NDCG@20 binary = {np.mean(ndcgs):.4f}  "
            f"graded = {np.mean(graded):.4f} (n={len(ndcgs)})"
        )

    def genre_profile(u):
        ti = dm._train_items_by_user.get(u, [])
        if not ti:
            return pop_n.copy()
        prof = gn[ti].sum(0)
        prof /= max(np.linalg.norm(prof), 1e-9)
        return gn @ prof

    def item_cf(u):
        ti = dm._train_items_by_user.get(u, [])
        if not ti:
            return pop_n.copy()
        return cos[ti].sum(0)

    def item_cf_pop(u):
        s = item_cf(u)
        s = s / max(s.max(), 1e-9)
        return s + pop_n

    evaluate(lambda u: pop_n.copy(), "popularity")
    evaluate(genre_profile, "genre-CF (skyline)")
    evaluate(lambda u: genre_profile(u) + pop_n, "genre+pop")
    evaluate(item_cf, "item-item CF")
    evaluate(item_cf_pop, "itemCF+pop")


if __name__ == "__main__":
    main(*sys.argv[1:])
