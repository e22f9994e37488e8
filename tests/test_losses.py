"""Loss-family numerics: JAX implementation vs independent numpy oracle."""

import numpy as np
import pytest

import oracle
from xfmr_rec_tpu.ops import (
    LOSS_NAMES,
    LossConfig,
    compute_loss,
    compute_losses,
    hard_mining,
    negative_masks,
    semi_hard_mining,
    squared_distance,
    weighted_mean,
)


def make_batch(seed=0, batch=8, dim=6, num_pos=3, with_neg_items=True):
    rng = np.random.default_rng(seed)
    b = batch
    m = 2 * b if with_neg_items else b
    u = rng.normal(size=(b, dim))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    c = rng.normal(size=(m, dim))
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    # item indices start at 1; inject some duplicates for accidental hits
    item_idx = rng.integers(1, m, size=m)
    item_idx[0] = item_idx[3]  # force an in-batch duplicate
    # pos_idx: 0-padded per-row positive sets, include own item sometimes
    pos_idx = rng.integers(0, m, size=(b, num_pos))
    pos_idx[1, 0] = item_idx[5]  # force a pos-set accidental hit
    target = rng.integers(1, 6, size=b).astype(np.float64)
    return u, c, target, item_idx, pos_idx


class TestPrimitives:
    def test_squared_distance_matches_definition(self):
        u, c, *_ = make_batch()
        got = np.asarray(squared_distance(u, c))
        want = oracle.sqdist(u, c)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_squared_distance_nonnegative(self):
        x = np.random.default_rng(1).normal(size=(4, 3))
        d = np.asarray(squared_distance(x, x))
        assert (d >= 0).all()
        np.testing.assert_allclose(np.diagonal(d), 0.0, atol=1e-6)

    def test_weighted_mean(self):
        v = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        w = np.array([[1.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
        got = np.asarray(weighted_mean(v, w, axis=-1))
        np.testing.assert_allclose(got[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(got[1], 0.0, atol=1e-6)  # guarded denom


class TestMasking:
    def test_negative_masks_oracle(self):
        u, c, target, item_idx, pos_idx = make_batch()
        logits = np.zeros((u.shape[0], c.shape[0]))
        got = np.asarray(
            negative_masks(logits, item_idx=item_idx, pos_idx=pos_idx)
        )
        want = oracle.masks_oracle(item_idx, pos_idx, u.shape[0])
        np.testing.assert_array_equal(got, want)

    def test_self_item_always_masked(self):
        u, c, target, item_idx, pos_idx = make_batch()
        logits = np.zeros((u.shape[0], c.shape[0]))
        got = np.asarray(
            negative_masks(logits, item_idx=item_idx, pos_idx=pos_idx)
        )
        for i in range(u.shape[0]):
            assert not got[i, i]

    def test_zero_padding_never_matches(self):
        # padded pos_idx zeros must not mask anything (item_idx >= 1)
        item_idx = np.arange(1, 9)
        pos_idx = np.zeros((4, 3), dtype=np.int64)
        logits = np.zeros((4, 8))
        got = np.asarray(
            negative_masks(logits, item_idx=item_idx, pos_idx=pos_idx)
        )
        want = ~(item_idx[:4, None] == item_idx[None, :])
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_semi_hard_mining_oracle(self, k):
        u, c, target, item_idx, pos_idx = make_batch(seed=2)
        logits = oracle.signed_logits(u, c, target, 1.0)
        base = oracle.masks_oracle(item_idx, pos_idx, u.shape[0])
        got = np.asarray(
            semi_hard_mining(logits, base, num_negatives=k)
        )
        want = oracle.semi_hard_oracle(logits, base, k)
        np.testing.assert_array_equal(got, want)

    def test_mining_disabled_passthrough(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=3)
        logits = oracle.signed_logits(u, c, target, 1.0)
        base = oracle.masks_oracle(item_idx, pos_idx, u.shape[0])
        for k in (0, logits.shape[1], logits.shape[1] + 5):
            got = np.asarray(semi_hard_mining(logits, base, num_negatives=k))
            np.testing.assert_array_equal(got, base)
            got = np.asarray(hard_mining(logits, base, num_negatives=k))
            np.testing.assert_array_equal(got, base)

    def test_hard_mining_selects_highest_logits(self):
        logits = np.array([[5.0, 1.0, 4.0, 3.0, 2.0]])
        masks = np.array([[False, True, True, True, True]])
        got = np.asarray(hard_mining(logits, masks, num_negatives=2))
        np.testing.assert_array_equal(
            got, np.array([[False, False, True, True, False]])
        )

    def test_all_duplicate_batch_every_loss_finite_with_grads(self):
        """Fully-masked rows (every candidate an accidental hit) must
        contribute 0, never -inf/NaN — MINE previously leaked
        logsumexp(-inf) into the batch sum (round-5 verify drive)."""
        import jax
        import jax.numpy as jnp

        u, c, target, _, pos_idx = make_batch(seed=13)
        item_idx = np.ones(2 * u.shape[0], np.int64)  # all duplicates
        config = LossConfig(num_negatives=4)
        losses = compute_losses(
            jnp.asarray(u), jnp.asarray(c), jnp.asarray(target),
            item_idx=jnp.asarray(item_idx),
            pos_idx=jnp.asarray(pos_idx), config=config,
        )
        for name, value in losses.items():
            assert np.isfinite(float(value)), (name, float(value))
        grad = jax.grad(
            lambda uu: compute_losses(
                uu, jnp.asarray(c), jnp.asarray(target),
                item_idx=jnp.asarray(item_idx),
                pos_idx=jnp.asarray(pos_idx), config=config,
            )["MutualInformationNeuralEstimationLoss"]
        )(jnp.asarray(u))
        assert np.isfinite(np.asarray(grad)).all()

    @pytest.mark.parametrize("k", [1, 2, 5, 16])
    def test_argmax_select_matches_sort_select(self, k):
        """The sort-free top-k selection (k argmax+knockout passes, the
        round-5 train-step fast path) must pick the SAME set as
        lax.top_k, including on ties (both resolve equal scores to the
        lowest index)."""
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops import masking

        rng = np.random.default_rng(11)
        # quantized scores force many exact ties at the k boundary
        scores = rng.integers(0, 4, size=(16, 64)).astype(np.float32)
        masks = rng.random((16, 64)) < 0.8

        def sort_select(masks, scores, k):
            _, indices = jax.lax.top_k(scores, k)
            rows = np.arange(masks.shape[0])[:, None]
            sel = np.zeros(masks.shape, dtype=bool)
            sel[rows, np.asarray(indices)] = True
            return masks & sel

        got = np.asarray(
            masking._restrict_to_topk(
                jnp.asarray(masks), jnp.asarray(scores), k
            )
        )
        want = sort_select(masks, scores, k)
        np.testing.assert_array_equal(got, want)

    def test_mining_at_most_k_survivors(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=4)
        logits = oracle.signed_logits(u, c, target, 1.0)
        base = oracle.masks_oracle(item_idx, pos_idx, u.shape[0])
        got = np.asarray(semi_hard_mining(logits, base, num_negatives=4))
        assert (got.sum(-1) <= 4).all()
        assert (got <= base).all()  # subset of valid negatives


@pytest.mark.parametrize("k", [0, 4])
@pytest.mark.parametrize("sigma,margin", [(1.0, 1.0), (3.0, 0.5), (1.0, -0.3)])
class TestLossParity:
    def cfg(self, k, sigma, margin):
        return LossConfig(num_negatives=k, sigma=sigma, margin=margin)

    def run_loss(self, name, k, sigma, margin, seed=0):
        u, c, target, item_idx, pos_idx = make_batch(seed=seed)
        config = self.cfg(k, sigma, margin)
        got = float(
            compute_loss(
                name, u, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        return got, (u, c, target, item_idx, pos_idx)

    def test_alignment(self, k, sigma, margin):
        got, (u, c, target, *_rest) = self.run_loss(
            "AlignmentLoss", k, sigma, margin
        )
        want = oracle.alignment(u, c, target, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_contrastive(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "ContrastiveLoss", k, sigma, margin
        )
        want = oracle.contrastive(
            u, c, target, item_idx, pos_idx, k, sigma, margin
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_alignment_contrastive_is_sum(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "AlignmentContrastiveLoss", k, sigma, margin
        )
        want = oracle.alignment(u, c, target, sigma) + oracle.contrastive(
            u, c, target, item_idx, pos_idx, k, sigma, margin
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_infonce(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "InfomationNoiseContrastiveEstimationLoss", k, sigma, margin
        )
        want = oracle.infonce(u, c, target, item_idx, pos_idx, k, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_mine(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "MutualInformationNeuralEstimationLoss", k, sigma, margin
        )
        want = oracle.mine(u, c, target, item_idx, pos_idx, k, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_pairwise_hinge(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "PairwiseHingeLoss", k, sigma, margin
        )
        want = oracle.pairwise(
            u, c, target, item_idx, pos_idx, k, sigma, margin, "hinge"
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_pairwise_logistic(self, k, sigma, margin):
        got, (u, c, target, item_idx, pos_idx) = self.run_loss(
            "PairwiseLogisticLoss", k, sigma, margin
        )
        want = oracle.pairwise(
            u, c, target, item_idx, pos_idx, k, sigma, margin, "logistic"
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestMAWU:
    """MAWULoss (Park et al., CIKM'23): margin-aware alignment +
    per-side weighted uniformity."""

    def test_zero_margin_equals_hand_formula(self):
        """m=0: alignment reduces to DirectAU's squared-distance form
        (1 - cos = ||u-i||^2/2 on unit vectors); uniformity terms use
        the per-side weights."""
        from xfmr_rec_tpu.ops.losses import _uniformity

        u, c, target, item_idx, pos_idx = make_batch(seed=21)
        config = LossConfig(margin=0.0, gamma=0.4, gamma_user=0.9)
        got = float(
            compute_loss(
                "MAWULoss", u, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        b = u.shape[0]
        halfsq = 0.5 * ((u - c[:b]) ** 2).sum(-1)
        w = np.maximum(target, 0.0)
        align = float((halfsq * w).sum() / w.sum())
        want = (
            align
            + 0.9 * float(_uniformity(u))
            + 0.4 * float(_uniformity(c[:b]))
        )
        assert np.isclose(got, want, rtol=1e-4)

    def test_margin_changes_gradients_not_just_value(self):
        """The angular margin must pass through the cos nonlinearity:
        gradients at m=0.3 differ from m=0 (an additive cosine margin
        would shift the value but leave gradients untouched)."""
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.losses import mawu_loss

        u, c, target, item_idx, pos_idx = make_batch(seed=22)

        def loss_at(margin):
            config = LossConfig(margin=margin, gamma=0.0)
            return jax.grad(
                lambda ue: mawu_loss(
                    ue, jnp.asarray(c), jnp.asarray(target),
                    item_idx=item_idx, pos_idx=pos_idx, config=config,
                )
            )(jnp.asarray(u))

        g0 = np.asarray(loss_at(0.0))
        g3 = np.asarray(loss_at(0.3))
        assert np.isfinite(g0).all() and np.isfinite(g3).all()
        assert np.abs(g0 - g3).max() > 1e-4

    def test_gamma_user_defaults_to_gamma(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=23)
        a = float(
            compute_loss(
                "MAWULoss", u, c, target, item_idx=item_idx,
                pos_idx=pos_idx, config=LossConfig(gamma=0.8),
            )
        )
        b = float(
            compute_loss(
                "MAWULoss", u, c, target, item_idx=item_idx,
                pos_idx=pos_idx,
                config=LossConfig(gamma=0.8, gamma_user=0.8),
            )
        )
        assert np.isclose(a, b, rtol=1e-6)

    def test_identical_pair_grad_finite(self):
        """cos == 1 (user equals item) sits at arccos's singular point;
        the clip must keep gradients finite."""
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.losses import mawu_loss

        b, dim = 4, 6
        rng = np.random.default_rng(24)
        x = rng.normal(size=(b, dim))
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        c = np.concatenate([x, x])  # items identical to users
        target = np.full(b, 5.0)
        item_idx = np.arange(1, 2 * b + 1)
        pos_idx = np.zeros((b, 2), dtype=np.int64)
        config = LossConfig(margin=0.3, gamma=1.0)
        grad = jax.grad(
            lambda ue: mawu_loss(
                ue, jnp.asarray(c), jnp.asarray(target),
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )(jnp.asarray(x))
        assert np.isfinite(np.asarray(grad)).all()


class TestDirectAU:
    def test_uniformity_matches_hand_formula(self):
        from xfmr_rec_tpu.ops.losses import _uniformity

        rng = np.random.default_rng(5)
        x = rng.normal(size=(6, 4))
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        got = float(_uniformity(x))
        sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        vals = np.exp(-2.0 * sq[~np.eye(6, dtype=bool)])
        want = np.log(vals.mean())
        assert np.isclose(got, want, rtol=1e-5)

    def test_equals_mean_alignment_plus_gamma_uniformity(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=6)
        config = LossConfig(num_negatives=4, sigma=1.0, gamma=0.7)
        from xfmr_rec_tpu.ops.losses import _uniformity

        got = float(
            compute_loss(
                "DirectAULoss", u, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        b = u.shape[0]
        diag = ((u - c[:b]) ** 2).sum(-1)  # paper form: full ||u - i||^2
        # paper-form alignment: rating-weighted MEAN over positive rows
        # (a sum would drown the batch-size-independent uniformity ~100x;
        # negative-feedback rows are excluded, not aligned)
        w = np.maximum(target, 0.0)
        align = float((diag * w).sum() / w.sum())
        uni = 0.5 * (float(_uniformity(u)) + float(_uniformity(c[:b])))
        assert np.isclose(got, align + 0.7 * uni, rtol=1e-4)

    def test_negative_target_rows_excluded_from_alignment(self):
        """A negative-feedback row must not be pulled towards its item."""
        u, c, target, item_idx, pos_idx = make_batch(seed=12)
        config = LossConfig(num_negatives=4, gamma=0.0)
        base = float(
            compute_loss(
                "DirectAULoss", u, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        flipped = np.array(target)
        flipped[0] = -flipped[0]
        from xfmr_rec_tpu.ops.losses import direct_au_loss

        import jax.numpy as jnp

        got = float(
            direct_au_loss(
                u, c, jnp.asarray(flipped),
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        # with gamma=0 the loss is the positive-row weighted mean: row 0
        # drops out entirely instead of contributing as a positive
        b = u.shape[0]
        diag = ((np.asarray(u) - np.asarray(c)[:b]) ** 2).sum(-1)
        w = np.maximum(flipped, 0.0)
        want = float((diag * w).sum() / w.sum())
        assert np.isclose(got, want, rtol=1e-4)
        assert not np.isclose(got, base, rtol=1e-6)

    def test_uniformity_term_not_drowned(self):
        """gamma * d(uniformity) must matter at default settings: a
        collapsed batch must score strictly worse than a spread one even
        with perfect alignment."""
        rng = np.random.default_rng(9)
        b, dim = 16, 8
        point = rng.normal(size=dim)
        point /= np.linalg.norm(point)
        collapsed = np.tile(point, (b, 1))
        spread = rng.normal(size=(b, dim))
        spread /= np.linalg.norm(spread, axis=-1, keepdims=True)
        target = np.full(b, 5.0)
        item_idx = np.arange(1, b + 1)
        pos_idx = np.zeros((b, 2), dtype=np.int64)
        config = LossConfig(num_negatives=4)
        loss_collapsed = float(
            compute_loss(
                "DirectAULoss", collapsed, collapsed, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        loss_spread = float(
            compute_loss(
                "DirectAULoss", spread, spread, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )
        )
        assert loss_collapsed > loss_spread

    def test_uniformity_prefers_spread(self):
        """Collapsed embeddings must score a higher (worse) uniformity
        than well-spread ones."""
        from xfmr_rec_tpu.ops.losses import _uniformity

        collapsed = np.ones((8, 4)) / 2.0
        rng = np.random.default_rng(7)
        spread = rng.normal(size=(8, 4))
        spread /= np.linalg.norm(spread, axis=-1, keepdims=True)
        assert float(_uniformity(collapsed)) > float(_uniformity(spread))

    def test_gradients_finite(self):
        import jax

        u, c, target, item_idx, pos_idx = make_batch(seed=8)
        config = LossConfig(num_negatives=4, sigma=1.0, margin=1.0)

        def fn(ue):
            return compute_loss(
                "DirectAULoss", ue, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )

        g = jax.grad(fn)(u)
        assert np.isfinite(np.asarray(g)).all()


class TestLossProperties:
    def test_compute_losses_returns_all(self):
        u, c, target, item_idx, pos_idx = make_batch()
        out = compute_losses(
            u, c, target,
            item_idx=item_idx, pos_idx=pos_idx,
            config=LossConfig(num_negatives=4),
        )
        assert set(out) == set(LOSS_NAMES)
        for v in out.values():
            assert np.isfinite(float(v))

    def test_losses_differentiable(self):
        import jax

        u, c, target, item_idx, pos_idx = make_batch()
        config = LossConfig(num_negatives=4)

        def f(ue, ie):
            return compute_loss(
                "PairwiseHingeLoss", ue, ie, target,
                item_idx=item_idx, pos_idx=pos_idx, config=config,
            )

        gu, gi = jax.grad(f, argnums=(0, 1))(u, c)
        assert np.isfinite(np.asarray(gu)).all()
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gu)).sum() > 0

    def test_logq_correction_shifts_infonce(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=7)
        log_q = np.random.default_rng(8).normal(size=c.shape[0])
        cfg = LossConfig(num_negatives=0, use_logq_correction=True)
        got = float(
            compute_loss(
                "InfomationNoiseContrastiveEstimationLoss",
                u, c, target,
                item_idx=item_idx, pos_idx=pos_idx, config=cfg, log_q=log_q,
            )
        )
        want = oracle.infonce(
            u, c, target, item_idx, pos_idx, 0, 1.0, log_q=log_q
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)
        base = float(
            compute_loss(
                "InfomationNoiseContrastiveEstimationLoss",
                u, c, target,
                item_idx=item_idx, pos_idx=pos_idx,
                config=LossConfig(num_negatives=0), log_q=log_q,
            )
        )
        assert abs(got - base) > 1e-6  # flag off => no correction applied

    def test_negative_target_flips_sign(self):
        u, c, target, item_idx, pos_idx = make_batch(seed=9)
        target_neg = -target
        cfg = LossConfig(num_negatives=0)
        got = float(
            compute_loss(
                "MutualInformationNeuralEstimationLoss",
                u, c, target_neg,
                item_idx=item_idx, pos_idx=pos_idx, config=cfg,
            )
        )
        want = oracle.mine(u, c, target_neg, item_idx, pos_idx, 0, 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_jit_compiles(self):
        import jax

        u, c, target, item_idx, pos_idx = make_batch()
        config = LossConfig(num_negatives=4)
        fn = jax.jit(
            lambda ue, ie, t, ii, pi: compute_losses(
                ue, ie, t, item_idx=ii, pos_idx=pi, config=config
            )
        )
        out = fn(u, c, target, item_idx, pos_idx)
        assert len(out) == len(LOSS_NAMES)
