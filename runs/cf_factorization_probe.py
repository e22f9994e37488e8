"""Factorized item-CF: how much of the exact probe survives rank-r?

The exact itemCF probe (corpus_signal_probes.py) scores
    s_i(u) = sum_{h in hist(u)} co[h,i] / (sqrt(pop_h) sqrt(pop_i))
which needs the dense n x n co-occurrence at serving time. The
TPU-native form factorizes it: cos = B^T B - I where B[u,i] =
1/sqrt(pop_i) on the user's train items, so eigenvectors of cos are
right-singular vectors of the *sparse user-item incidence*. Keeping the
top-r eigenpairs gives item factors
    c_i = V_i * sqrt(|lam|),   h_i = c_i * sign(lam)
and the CF score becomes one dot product
    s_i(u) ~= (sum_{h in hist} h_h) . c_i
that rides the existing MIPS index as r extra dimensions.

This probe measures NDCG@20 of the factorized score at several ranks
against the exact probe, with and without the popularity prior, to pick
the rank the framework feature ships with.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python runs/cf_factorization_probe.py [data_dir]
"""

from __future__ import annotations

import sys

import numpy as np

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

TOPK = 20


def ndcg_eval(dm, score_fn, name: str) -> float:
    n_items = len(dm.item_ids)
    pos_of_id = {int(m): p for p, m in enumerate(dm.item_ids)}
    ndcgs = []
    for batch in dm.eval_batches("val"):
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
        for i in range(len(upos)):
            if not valid[i]:
                continue
            tset = {pos_of_id[int(x)] for x in tid[i] if int(x) != 0}
            if not tset:
                continue
            hits = [1.0 if p in tset else 0.0 for p in top[i]]
            dcg = sum(h / np.log2(r + 2) for r, h in enumerate(hits))
            idcg = sum(
                1 / np.log2(r + 2) for r in range(min(len(tset), TOPK))
            )
            ndcgs.append(dcg / idcg)
    out = float(np.mean(ndcgs))
    print(f"{name:34s} NDCG@20 = {out:.4f} (n={len(ndcgs)})")
    return out


def main(data_dir: str = "data/ml1m") -> None:
    dm = RecDataModule(DataConfig(data_dir=data_dir))
    dm.setup()
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

    def exact_cf(u):
        ti = dm._train_items_by_user.get(u, [])
        if not ti:
            return pop_n.copy()
        return cos[ti].sum(0)

    def with_pop(fn):
        def f(u):
            s = fn(u)
            return s / max(s.max(), 1e-9) + pop_n

        return f

    ndcg_eval(dm, exact_cf, "exact itemCF")
    ndcg_eval(dm, with_pop(exact_cf), "exact itemCF + pop")

    lam, vec = np.linalg.eigh(cos)  # ascending
    order = np.argsort(-np.abs(lam))
    print(
        "eigenvalue spectrum: top5",
        np.round(lam[order[:5]], 2),
        "| most-negative",
        round(float(lam.min()), 2),
    )
    for rank in (32, 64, 128, 256):
        for signed in (False, True):
            idx = (
                order[:rank]
                if signed
                else np.argsort(-lam)[:rank]  # positive-only: largest lam
            )
            lam_r = lam[idx]
            v = vec[:, idx]
            item_f = v * np.sqrt(np.abs(lam_r))
            hist_f = item_f * np.sign(lam_r)

            def cf_r(u, hist_f=hist_f, item_f=item_f):
                ti = dm._train_items_by_user.get(u, [])
                if not ti:
                    return pop_n.copy()
                return item_f @ hist_f[ti].sum(0)

            tag = "signed" if signed else "pos-only"
            ndcg_eval(dm, cf_r, f"factorized r={rank} {tag}")
            ndcg_eval(dm, with_pop(cf_r), f"factorized r={rank} {tag} + pop")


if __name__ == "__main__":
    main(*sys.argv[1:])
