"""TPESampler vs AdaptiveSampler on a fixed budget (VERDICT r4 #7).

Deterministic synthetic response surface over the real SearchSpace
(loss-dependent optimal learning rate + interactions, mild config-hash
jitter standing in for trial noise), so the comparison is seeded,
reproducible on one CPU core, and costs no TPU time. Both samplers see
the identical propose->evaluate->observe protocol with the same budget;
random search rides along as the control.

Writes runs/hpo_sampler_compare.jsonl (one row per sampler x seed:
best-so-far at 16/32/48 trials) and prints a mean +/- std summary.

Run: PALLAS_AXON_POOL_IPS= python runs/hpo_sampler_compare.py
"""

from __future__ import annotations

import hashlib
import json
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from xfmr_rec_tpu.tuning.hpo import (  # noqa: E402
    AdaptiveSampler,
    SearchSpace,
    TPESampler,
)

BUDGET = 48
SEEDS = range(8)
CHECKPOINTS = (16, 32, 48)

# loss-dependent optimum: the surrogate has to learn the interaction
_OPT_LOG10_LR = {
    "PairwiseHingeLoss": -3.0,
    "PairwiseLogisticLoss": -3.5,
    "AlignmentContrastiveLoss": -2.5,
    "MutualInformationNeuralEstimationLoss": -3.2,
}
_LOSS_BASE = {
    "PairwiseHingeLoss": 0.050,
    "PairwiseLogisticLoss": 0.046,
    "AlignmentContrastiveLoss": 0.055,
    "MutualInformationNeuralEstimationLoss": 0.040,
}


def objective(cfg: dict) -> float:
    """NDCG-shaped response surface, deterministic per config."""
    loss = cfg["train_loss"]
    score = _LOSS_BASE[loss]
    score -= 0.010 * (math.log10(cfg["learning_rate"]) - _OPT_LOG10_LR[loss]) ** 2
    score -= 0.002 * (math.log2(max(1, cfg["num_negatives"])) - 3.0) ** 2
    score -= 0.0015 * (math.log10(cfg["sigma"]) - 1.0) ** 2
    # margin matters only for the hinge family (interaction)
    if "Pairwise" in loss:
        score -= 0.004 * (cfg["margin"] - 0.4) ** 2
    digest = hashlib.md5(
        json.dumps(cfg, sort_keys=True).encode()
    ).digest()
    jitter = (int.from_bytes(digest[:4], "little") / 2**32 - 0.5) * 0.002
    return score + jitter


def run(sampler) -> list[float]:
    best = -math.inf
    trajectory = []
    for _ in range(BUDGET):
        cfg = sampler.propose()
        metric = objective(cfg)
        sampler.observe(cfg, metric)
        best = max(best, metric)
        trajectory.append(best)
    return trajectory


class RandomSampler:
    def __init__(self, space, seed=0):
        self.space = space
        self.rng = np.random.default_rng(seed)

    def propose(self):
        return self.space.sample(self.rng)

    def observe(self, cfg, metric):
        pass


def main() -> None:
    space = SearchSpace()
    out_path = pathlib.Path("runs/hpo_sampler_compare.jsonl")
    rows = []
    makers = {
        "random": lambda s: RandomSampler(space, seed=s),
        "adaptive": lambda s: AdaptiveSampler(space, seed=s),
        "tpe": lambda s: TPESampler(space, seed=s),
    }
    with out_path.open("w") as fh:
        for name, make in makers.items():
            at = {c: [] for c in CHECKPOINTS}
            for seed in SEEDS:
                traj = run(make(seed))
                row = {
                    "sampler": name,
                    "seed": seed,
                    **{f"best@{c}": traj[c - 1] for c in CHECKPOINTS},
                }
                fh.write(json.dumps(row) + "\n")
                for c in CHECKPOINTS:
                    at[c].append(traj[c - 1])
            rows.append((name, at))
    print(f"{'sampler':10s} " + " ".join(f"{'best@' + str(c):>18s}" for c in CHECKPOINTS))
    for name, at in rows:
        cells = [
            f"{np.mean(v):.5f} +/- {np.std(v):.5f}"
            for v in (at[c] for c in CHECKPOINTS)
        ]
        print(f"{name:10s} " + " ".join(f"{c:>18s}" for c in cells))
    print(f"wrote {out_path} (optimum ~0.056 at ACL/lr=10^-2.5/nn=8)")


if __name__ == "__main__":
    main()
