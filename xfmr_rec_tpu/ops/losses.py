"""Contrastive / pairwise embedding loss family.

Numerical-parity targets (reference /root/reference/xfmr_rec/losses.py):

- alignment_loss    : losses.py:164-170   (~ DirectAU alignment term)
- contrastive_loss  : losses.py:172-193   (~ CCL / SimpleX)
- infonce_loss      : losses.py:195-223   (~ SSM / InfoNCE+)
- mine_loss         : losses.py:225-246   (MINE+)
- pairwise family   : losses.py:324-359   (BPR logistic / hinge)
- the 7 concrete classes: losses.py:249-359

Re-designed as pure functions over a frozen `LossConfig` so a single jitted
train step can compute all losses at once (the reference runs all of them per
step and backprops only the configured one — lightning.py:137-147,189-192).

Extension beyond the reference snapshot (promised in its README but not
implemented there): LogQ sampled-softmax correction. Pass `log_q`
(per-candidate sampling log-probability) and softmax-family losses subtract
it from candidate logits, de-biasing in-batch/mixed negative sampling per
"Sampling-Bias-Corrected Neural Modeling" (Yi et al., RecSys'19).

Conventions shared by all losses:
- logits = -squared_distance(user, item) * sign(target) * sigma
- rows are weighted by |target| (rating magnitude); sign(target) flips the
  objective for negative-feedback rows.
- `item_embed` holds `2 * batch_size` rows when mixed negative sampling is
  on: in-batch positives first, then sampled corpus negatives.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array

from xfmr_rec_tpu.ops.masking import (
    mask_log,
    negative_masks,
    semi_hard_mining,
)
from xfmr_rec_tpu.ops.similarity import squared_distance, weighted_mean


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss hyperparameters (trace-time constants under jit)."""

    num_negatives: int = 0
    sigma: float = 1.0
    margin: float = 1.0
    # DirectAU uniformity weight — its own knob, NOT margin: margin's
    # hinge semantics (HPO samples it in [-1, 1]) would zero or negate
    # the uniformity term
    gamma: float = 1.0
    # MAWU user-side uniformity weight; None = use gamma for both sides
    # (the paper's gamma_1/gamma_2 are dataset-dependent and distinct)
    gamma_user: float | None = None
    use_logq_correction: bool = False


def _signed_logits(
    user_embed: Array, item_embed: Array, target: Array, sigma: float
) -> Array:
    logits = -squared_distance(user_embed, item_embed)
    return logits * jnp.sign(target)[:, None] * sigma


def _mined_masks(
    logits: Array, item_idx: Array, pos_idx: Array, num_negatives: int
) -> Array:
    masks = negative_masks(logits, item_idx=item_idx, pos_idx=pos_idx)
    masks = semi_hard_mining(logits, masks, num_negatives=num_negatives)
    return jax.lax.stop_gradient(masks)


def alignment_loss(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,  # noqa: ARG001 — uniform signature across the family
    pos_idx: Array,  # noqa: ARG001
    config: LossConfig,
    log_q: Array | None = None,  # noqa: ARG001
) -> Array:
    """Pull each user towards its positive item (DirectAU alignment)."""
    batch_size = user_embed.shape[0]
    dist = squared_distance(user_embed, item_embed[:batch_size])
    loss = jnp.diagonal(dist)
    return jnp.sum(loss * target * config.sigma)


def contrastive_loss(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    log_q: Array | None = None,  # noqa: ARG001 — margin loss is not softmax-corrected
) -> Array:
    """Margin-hinge over mined negatives (~ CCL)."""
    logits = _signed_logits(user_embed, item_embed, target, config.sigma)
    masks = _mined_masks(logits, item_idx, pos_idx, config.num_negatives)
    losses = jax.nn.relu(logits + jnp.sign(target)[:, None] * config.margin)
    loss = weighted_mean(losses, masks, axis=-1)
    return jnp.sum(loss * jnp.abs(target))


def infonce_loss(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    log_q: Array | None = None,
) -> Array:
    """Masked sampled-softmax cross-entropy with the positive on the diagonal."""
    logits = _signed_logits(user_embed, item_embed, target, config.sigma)
    masks = _mined_masks(logits, item_idx, pos_idx, config.num_negatives)
    batch_size, num_items = logits.shape
    eye = jnp.eye(batch_size, num_items, dtype=bool)
    masks = masks | eye
    if config.use_logq_correction and log_q is not None:
        logits = logits - log_q[None, :]
    masked_logits = logits + mask_log(masks)
    # cross entropy with labels = arange(batch): -diag + logsumexp(row)
    loss = -jnp.diagonal(masked_logits) + jax.nn.logsumexp(
        masked_logits, axis=-1
    )
    return jnp.sum(loss * jnp.abs(target))


def mine_loss(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    log_q: Array | None = None,
) -> Array:
    """Mutual Information Neural Estimation bound: -pos + logsumexp(neg)."""
    logits = _signed_logits(user_embed, item_embed, target, config.sigma)
    masks = _mined_masks(logits, item_idx, pos_idx, config.num_negatives)
    corrected = logits
    if config.use_logq_correction and log_q is not None:
        corrected = logits - log_q[None, :]
    # rows with zero valid negatives (every candidate an accidental hit)
    # contribute 0, like the rest of the family — an all-masked row
    # would otherwise make logsumexp -inf and poison the batch sum /
    # gradients. The dummy first-column entry keeps logsumexp's input
    # finite so the zeroed rows don't backprop NaN (the where-grad trap).
    has_neg = jnp.any(masks, axis=-1)
    first_col = (
        jax.lax.broadcasted_iota(jnp.int32, masks.shape, 1) == 0
    )
    safe_masks = masks | (~has_neg[:, None] & first_col)
    negative_score = jax.nn.logsumexp(
        corrected + mask_log(safe_masks), axis=-1
    )
    loss = (-jnp.diagonal(logits) + negative_score) * has_neg
    return jnp.sum(loss * jnp.abs(target))


def _pairwise_loss(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    score_loss_fn,
) -> Array:
    """Pairwise positive-vs-negative ranking loss over mined negatives."""
    logits = _signed_logits(user_embed, item_embed, target, config.sigma)
    masks = _mined_masks(logits, item_idx, pos_idx, config.num_negatives)
    scores = logits - jnp.diagonal(logits)[:, None] + config.margin
    losses = score_loss_fn(scores)
    loss = weighted_mean(losses, masks, axis=-1)
    return jnp.sum(loss * jnp.abs(target))


def pairwise_logistic_loss(
    user_embed, item_embed, target, *, item_idx, pos_idx, config, log_q=None  # noqa: ARG001
) -> Array:
    """BPR: -logsigmoid(-(neg - pos + margin)) == softplus(score)."""
    return _pairwise_loss(
        user_embed,
        item_embed,
        target,
        item_idx=item_idx,
        pos_idx=pos_idx,
        config=config,
        score_loss_fn=jax.nn.softplus,
    )


def pairwise_hinge_loss(
    user_embed, item_embed, target, *, item_idx, pos_idx, config, log_q=None  # noqa: ARG001
) -> Array:
    """Hinge on (neg - pos + margin). Reference default train loss."""
    return _pairwise_loss(
        user_embed,
        item_embed,
        target,
        item_idx=item_idx,
        pos_idx=pos_idx,
        config=config,
        score_loss_fn=jax.nn.relu,
    )


def alignment_contrastive_loss(
    user_embed, item_embed, target, *, item_idx, pos_idx, config, log_q=None
) -> Array:
    """Alignment + contrastive sum (~ MAWU / DirectAU-style)."""
    return alignment_loss(
        user_embed,
        item_embed,
        target,
        item_idx=item_idx,
        pos_idx=pos_idx,
        config=config,
        log_q=log_q,
    ) + contrastive_loss(
        user_embed,
        item_embed,
        target,
        item_idx=item_idx,
        pos_idx=pos_idx,
        config=config,
        log_q=log_q,
    )


def _uniformity(embed: Array) -> Array:
    """log E[exp(-2||x - x'||^2)] over distinct in-batch pairs.

    The uniformity term of Wang & Isola (ICML'20) as used by DirectAU
    (Wang et al., SIGIR'22). squared_distance returns ||.||^2 / 2, so
    the -2||x-x'||^2 exponent is -4 * sqdist.
    """
    n = embed.shape[0]
    d = squared_distance(embed, embed)
    off_diag = ~jnp.eye(n, dtype=bool)
    logits = -4.0 * d + mask_log(off_diag)
    return jax.nn.logsumexp(logits) - jnp.log(float(n * (n - 1)))


def direct_au_loss(
    user_embed, item_embed, target, *, item_idx, pos_idx, config, log_q=None
) -> Array:
    """DirectAU: alignment + gamma * uniformity (Wang et al., SIGIR'22).

    Promised in the reference README's capability list but not
    implemented in its snapshot (its AlignmentContrastiveLoss substitutes
    a contrastive term for uniformity).

    Scale note: the family's AlignmentLoss is a rating-weighted SUM over
    the batch (reference semantics), which would drown the
    batch-size-independent uniformity term ~100x at batch 32 and let the
    embeddings collapse. The paper defines alignment as a MEAN of
    ||u - i||^2 (squared_distance returns half that, hence the 2x), so
    this loss uses the rating-weighted mean over POSITIVE-target rows —
    DirectAU is defined on observed positive interactions, so
    negative-feedback rows are excluded rather than aligned. gamma
    (config.gamma, default 1.0, paper range 0.2-10) weighs the uniformity
    of in-batch user and positive-item embeddings (sampled corpus
    negatives excluded, as the paper defines uniformity over the
    interaction batch).
    """
    batch = user_embed.shape[0]
    dist = jnp.diagonal(
        squared_distance(user_embed, item_embed[:batch])
    )
    align = weighted_mean(
        2.0 * dist * config.sigma, jnp.maximum(target, 0.0)
    )
    if batch < 2:
        return align
    uniform = 0.5 * (
        _uniformity(user_embed) + _uniformity(item_embed[:batch])
    )
    return align + config.gamma * uniform


def mawu_loss(
    user_embed, item_embed, target, *, item_idx, pos_idx, config, log_q=None
) -> Array:
    """MAWU: Margin-aware Alignment + Weighted Uniformity (Park et al.,
    CIKM'23, "Toward a Better Understanding of Loss Functions for
    Collaborative Filtering").

    Named in this rebuild's target configs alongside CCL/DirectAU;
    absent from the reference snapshot (like DirectAULoss).

    Margin-aware alignment adds an ANGULAR margin to each positive
    pair: align = E_pos[1 - cos(theta_ui + m)]. The margin passes
    through the cosine nonlinearity (cos(theta+m) = cos.cos(m) -
    sin.sin(m)), so it reshapes gradients near convergence — an
    additive cosine margin would be a constant shift with zero
    gradient effect.

    Scale convention (gamma is NOT transferable to DirectAULoss): at
    m=0 the alignment is (1-cos)*sigma = ||u-i||^2/2 * sigma — HALF of
    direct_au_loss's paper-form 2*(1-cos)*sigma — and the two
    uniformity terms enter unhalved (the paper's separate
    gamma_1/gamma_2), where direct_au_loss averages them. So
    mawu(m=0, sigma, gamma) == direct_au(sigma/2, 2*gamma): the
    uniformity-to-alignment ratio at equal knobs is 4x DirectAU's.
    Sweeps comparing the two losses compare MECHANISMS at their own
    paper-form scales, not a shared gamma axis.

    Weighted uniformity keeps DirectAU's two uniformity terms but
    weighs each side separately (the paper's dataset-dependent
    gamma_1/gamma_2): user side by config.gamma_user (falls back to
    gamma), item side by config.gamma.

    Margin semantics: config.margin is RADIANS here (paper-practical
    range ~0.05-0.5). The family default margin=1.0 is the pairwise
    hinge's; set it explicitly for MAWU runs.
    """
    batch = user_embed.shape[0]
    dist = jnp.diagonal(
        squared_distance(user_embed, item_embed[:batch])
    )
    cos = jnp.clip(1.0 - dist, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos)
    align = weighted_mean(
        (1.0 - jnp.cos(theta + config.margin)) * config.sigma,
        jnp.maximum(target, 0.0),
    )
    if batch < 2:
        return align
    g_item = config.gamma
    g_user = (
        config.gamma if config.gamma_user is None else config.gamma_user
    )
    return (
        align
        + g_user * _uniformity(user_embed)
        + g_item * _uniformity(item_embed[:batch])
    )


# Registry — names match the reference concrete classes (losses.py:249-359)
# so configs written for the reference select the same objective here.
# DirectAULoss is an extension: README-promised, absent from the snapshot.
LOSSES = {
    "AlignmentLoss": alignment_loss,
    "ContrastiveLoss": contrastive_loss,
    "AlignmentContrastiveLoss": alignment_contrastive_loss,
    "DirectAULoss": direct_au_loss,
    "MAWULoss": mawu_loss,
    "InfomationNoiseContrastiveEstimationLoss": infonce_loss,
    "MutualInformationNeuralEstimationLoss": mine_loss,
    "PairwiseHingeLoss": pairwise_hinge_loss,
    "PairwiseLogisticLoss": pairwise_logistic_loss,
}
LOSS_NAMES = tuple(LOSSES)


def compute_loss(
    name: str,
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    log_q: Array | None = None,
) -> Array:
    return LOSSES[name](
        user_embed,
        item_embed,
        target,
        item_idx=item_idx,
        pos_idx=pos_idx,
        config=config,
        log_q=log_q,
    )


def compute_losses(
    user_embed: Array,
    item_embed: Array,
    target: Array,
    *,
    item_idx: Array,
    pos_idx: Array,
    config: LossConfig,
    log_q: Array | None = None,
    names: tuple[str, ...] | None = None,
) -> dict[str, Array]:
    """All losses at once — one fused jit region, shared similarity matrix.

    `names` restricts the family (default: every registered loss — the
    reference logs all of them each step, lightning.py:137-147; passing
    just the train loss gives identical updates with leaner metrics —
    measured only ~2% faster, the family shares the similarity matrix:
    `--trainer.log_all_losses false`, BENCH_NOTES round 4).
    """
    return {
        name: compute_loss(
            name,
            user_embed,
            item_embed,
            target,
            item_idx=item_idx,
            pos_idx=pos_idx,
            config=config,
            log_q=log_q,
        )
        for name in (LOSS_NAMES if names is None else names)
    }
