"""Slow, independent numpy oracle for the embedding-loss family.

Deliberately written with per-row Python loops, explicit set membership and
stable sorts — structurally unlike the vectorized JAX implementation — so
agreement between the two is meaningful evidence of correctness.
"""

from __future__ import annotations

import math

import numpy as np


def sqdist(u: np.ndarray, c: np.ndarray) -> np.ndarray:
    out = np.zeros((u.shape[0], c.shape[0]))
    for i in range(u.shape[0]):
        for j in range(c.shape[0]):
            out[i, j] = 0.5 * float(np.sum((u[i] - c[j]) ** 2))
    return out


def signed_logits(u, c, target, sigma):
    d = sqdist(u, c)
    out = np.zeros_like(d)
    for i in range(d.shape[0]):
        s = math.copysign(1.0, target[i]) if target[i] != 0 else 0.0
        out[i] = -d[i] * s * sigma
    return out


def valid_negative_row(i, item_idx, pos_set_i, batch_size):
    m = np.zeros(len(item_idx), dtype=bool)
    for j in range(len(item_idx)):
        same_item = item_idx[j] == item_idx[i]
        in_positives = int(item_idx[j]) in pos_set_i
        m[j] = not (same_item or in_positives)
    return m


def masks_oracle(item_idx, pos_idx, batch_size):
    num_items = len(item_idx)
    masks = np.zeros((batch_size, num_items), dtype=bool)
    for i in range(batch_size):
        pos_set = {int(p) for p in pos_idx[i]}
        masks[i] = valid_negative_row(i, item_idx, pos_set, batch_size)
    return masks


def semi_hard_oracle(logits, masks, k):
    if k <= 0 or k >= logits.shape[1]:
        return masks
    out = masks.copy()
    for i in range(logits.shape[0]):
        pos = logits[i, i]
        mods = []
        row_min = min(logits[i, j] - pos for j in range(logits.shape[1]))
        for j in range(logits.shape[1]):
            d = logits[i, j] - pos
            key = (d - row_min) if d < 0 else -d
            if not masks[i, j]:
                key = -math.inf
            mods.append((key, j))
        mods.sort(key=lambda t: -t[0])
        keep = {j for _, j in mods[:k]}
        for j in range(logits.shape[1]):
            out[i, j] = masks[i, j] and (j in keep)
    return out


def weighted_mean_rows(values, weights):
    out = np.zeros(values.shape[0])
    for i in range(values.shape[0]):
        denom = float(np.sum(weights[i])) + 1e-10
        out[i] = float(np.sum(values[i] * weights[i])) / denom
    return out


def _prep(u, c, target, item_idx, pos_idx, k, sigma):
    logits = signed_logits(u, c, target, sigma)
    masks = masks_oracle(item_idx, pos_idx, u.shape[0])
    masks = semi_hard_oracle(logits, masks, k)
    return logits, masks


def alignment(u, c, target, sigma):
    b = u.shape[0]
    total = 0.0
    for i in range(b):
        total += 0.5 * float(np.sum((u[i] - c[i]) ** 2)) * target[i] * sigma
    return total


def contrastive(u, c, target, item_idx, pos_idx, k, sigma, margin):
    logits, masks = _prep(u, c, target, item_idx, pos_idx, k, sigma)
    b = u.shape[0]
    losses = np.zeros_like(logits)
    for i in range(b):
        s = math.copysign(1.0, target[i]) if target[i] != 0 else 0.0
        losses[i] = np.maximum(logits[i] + s * margin, 0.0)
    per_row = weighted_mean_rows(losses, masks)
    return float(np.sum(per_row * np.abs(target)))


def infonce(u, c, target, item_idx, pos_idx, k, sigma, log_q=None):
    logits, masks = _prep(u, c, target, item_idx, pos_idx, k, sigma)
    b = u.shape[0]
    total = 0.0
    for i in range(b):
        keep = [j for j in range(logits.shape[1]) if masks[i, j] or j == i]
        row = [logits[i, j] for j in keep]
        if log_q is not None:
            row = [v - log_q[j] for v, j in zip(row, keep)]
        m = max(row)
        lse = m + math.log(sum(math.exp(v - m) for v in row))
        pos = logits[i, i] - (log_q[i] if log_q is not None else 0.0)
        total += (-pos + lse) * abs(target[i])
    return total


def mine(u, c, target, item_idx, pos_idx, k, sigma, log_q=None):
    logits, masks = _prep(u, c, target, item_idx, pos_idx, k, sigma)
    b = u.shape[0]
    total = 0.0
    for i in range(b):
        keep = [j for j in range(logits.shape[1]) if masks[i, j]]
        if not keep:  # no valid negatives: the row contributes 0
            continue
        row = [logits[i, j] for j in keep]
        if log_q is not None:
            row = [v - log_q[j] for v, j in zip(row, keep)]
        m = max(row)
        lse = m + math.log(sum(math.exp(v - m) for v in row))
        total += (-logits[i, i] + lse) * abs(target[i])
    return total


def pairwise(u, c, target, item_idx, pos_idx, k, sigma, margin, kind):
    logits, masks = _prep(u, c, target, item_idx, pos_idx, k, sigma)
    b = u.shape[0]
    losses = np.zeros_like(logits)
    for i in range(b):
        for j in range(logits.shape[1]):
            s = logits[i, j] - logits[i, i] + margin
            if kind == "hinge":
                losses[i, j] = max(s, 0.0)
            else:  # logistic: softplus
                losses[i, j] = math.log1p(math.exp(-abs(s))) + max(s, 0.0)
    per_row = weighted_mean_rows(losses, masks)
    return float(np.sum(per_row * np.abs(target)))
