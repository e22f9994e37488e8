"""Direct numerical parity against the reference torch implementation.

Executes the actual reference loss module
(/root/reference/xfmr_rec/losses.py) side by side with the JAX ops on
random batches — the gold-standard parity evidence on top of the
independent numpy oracle (tests/oracle.py). Covers all 7 concrete loss
classes plus negative_masks / hard_mining / semi_hard_mining, with
negative targets, duplicate item indices, and num_negatives in
{0, 2, 4, big}.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

REF_LOSSES = pathlib.Path("/root/reference/xfmr_rec/losses.py")
pytestmark = pytest.mark.skipif(
    not REF_LOSSES.exists(), reason="reference checkout not present"
)


def _load_reference():
    import torch  # noqa: F401 — the reference module needs it importable

    spec = importlib.util.spec_from_file_location("ref_losses", REF_LOSSES)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


LOSS_NAMES = (
    "AlignmentLoss",
    "ContrastiveLoss",
    "AlignmentContrastiveLoss",
    "InfomationNoiseContrastiveEstimationLoss",
    "MutualInformationNeuralEstimationLoss",
    "PairwiseLogisticLoss",
    "PairwiseHingeLoss",
)


def make_batch(
    seed: int,
    *,
    batch: int = 16,
    dim: int = 16,
    num_items: int = 32,
    num_pos: int = 8,
    negative_targets: bool = False,
    unit_norm: bool = True,
):
    """Random batch shaped like a training step with MNS (2B candidates)."""
    rng = np.random.default_rng(seed)
    user = rng.normal(size=(batch, dim)).astype(np.float32)
    item = rng.normal(size=(num_items, dim)).astype(np.float32)
    if unit_norm:  # the encoder L2-normalizes; keep values realistic
        user /= np.linalg.norm(user, axis=-1, keepdims=True)
        item /= np.linalg.norm(item, axis=-1, keepdims=True)
    target = rng.integers(1, 6, batch).astype(np.float32)
    if negative_targets:
        target *= rng.choice([-1.0, 1.0], batch)
    # small id range => duplicate item ids occur (in-batch accidental hits)
    item_idx = rng.integers(1, 20, num_items).astype(np.int64)
    # 0 acts as padding (never matches item_idx >= 1)
    pos_idx = rng.integers(0, 20, (batch, num_pos)).astype(np.int64)
    return user, item, target, item_idx, pos_idx


def torch_loss(ref, name, arrays, *, num_negatives, sigma=1.0, margin=1.0):
    import torch

    user, item, target, item_idx, pos_idx = arrays
    loss_cls = getattr(ref, name)
    module = loss_cls(
        num_negatives=num_negatives, sigma=sigma, margin=margin
    )
    with torch.no_grad():
        value = module(
            torch.from_numpy(user),
            torch.from_numpy(item),
            torch.from_numpy(target),
            item_idx=torch.from_numpy(item_idx),
            pos_idx=torch.from_numpy(pos_idx),
        )
    return float(value)


def jax_loss(name, arrays, *, num_negatives, sigma=1.0, margin=1.0):
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.losses import LossConfig, compute_loss

    user, item, target, item_idx, pos_idx = arrays
    value = compute_loss(
        name,
        jnp.asarray(user),
        jnp.asarray(item),
        jnp.asarray(target),
        item_idx=jnp.asarray(item_idx),
        pos_idx=jnp.asarray(pos_idx),
        config=LossConfig(
            num_negatives=num_negatives, sigma=sigma, margin=margin
        ),
    )
    return float(value)


class TestLossParity:
    @pytest.mark.parametrize("name", LOSS_NAMES)
    @pytest.mark.parametrize("num_negatives", [0, 2, 4, 100])
    def test_loss_matches_reference(self, ref, name, num_negatives):
        for seed in range(3):
            arrays = make_batch(seed)
            expected = torch_loss(
                ref, name, arrays, num_negatives=num_negatives
            )
            actual = jax_loss(name, arrays, num_negatives=num_negatives)
            np.testing.assert_allclose(
                actual,
                expected,
                rtol=1e-5,
                atol=1e-5,
                err_msg=f"{name} num_negatives={num_negatives} seed={seed}",
            )

    @pytest.mark.parametrize("name", LOSS_NAMES)
    def test_negative_targets(self, ref, name):
        arrays = make_batch(7, negative_targets=True)
        expected = torch_loss(ref, name, arrays, num_negatives=4)
        actual = jax_loss(name, arrays, num_negatives=4)
        np.testing.assert_allclose(
            actual, expected, rtol=1e-5, atol=1e-5, err_msg=name
        )

    @pytest.mark.parametrize("name", LOSS_NAMES)
    def test_sigma_margin_sweep(self, ref, name):
        for sigma, margin in ((10.0, 0.5), (100.0, -0.5), (3.0, 1.0)):
            arrays = make_batch(11)
            expected = torch_loss(
                ref, name, arrays, num_negatives=2, sigma=sigma, margin=margin
            )
            actual = jax_loss(
                name, arrays, num_negatives=2, sigma=sigma, margin=margin
            )
            np.testing.assert_allclose(
                actual,
                expected,
                rtol=1e-5,
                atol=1e-5,
                err_msg=f"{name} sigma={sigma} margin={margin}",
            )

    def test_equal_candidate_count(self, ref):
        """num_items == batch (pure in-batch negatives, no MNS column)."""
        for name in LOSS_NAMES:
            arrays = make_batch(13, batch=8, num_items=8)
            expected = torch_loss(ref, name, arrays, num_negatives=3)
            actual = jax_loss(name, arrays, num_negatives=3)
            np.testing.assert_allclose(
                actual, expected, rtol=1e-5, atol=1e-5, err_msg=name
            )


class TestMaskMiningParity:
    def _logits_and_masks(self, ref, seed, *, sigma=1.0):
        import torch

        user, item, target, item_idx, pos_idx = make_batch(seed)
        module = ref.PairwiseHingeLoss(num_negatives=0, sigma=sigma)
        logits_t = -ref.squared_distance(
            torch.from_numpy(user), torch.from_numpy(item)
        )
        logits_t = logits_t * torch.from_numpy(target).sign()[:, None] * sigma
        masks_t = module.negative_masks(
            logits_t,
            item_idx=torch.from_numpy(item_idx),
            pos_idx=torch.from_numpy(pos_idx),
        )
        return (user, item, target, item_idx, pos_idx), logits_t, masks_t

    def test_negative_masks_match(self, ref):
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.masking import negative_masks

        for seed in range(5):
            arrays, logits_t, masks_t = self._logits_and_masks(ref, seed)
            _, _, _, item_idx, pos_idx = arrays
            masks_j = negative_masks(
                jnp.asarray(logits_t.numpy()),
                item_idx=jnp.asarray(item_idx),
                pos_idx=jnp.asarray(pos_idx),
            )
            np.testing.assert_array_equal(
                np.asarray(masks_j), masks_t.numpy()
            )

    @pytest.mark.parametrize("num_negatives", [1, 2, 4, 8])
    def test_semi_hard_mining_matches(self, ref, num_negatives):
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.masking import negative_masks, semi_hard_mining

        for seed in range(5):
            arrays, logits_t, masks_t = self._logits_and_masks(ref, seed)
            _, _, _, item_idx, pos_idx = arrays
            module = ref.PairwiseHingeLoss(num_negatives=num_negatives)
            mined_t = module.semi_hard_mining(logits_t, masks_t.clone())
            logits_j = jnp.asarray(logits_t.numpy())
            masks_j = negative_masks(
                logits_j,
                item_idx=jnp.asarray(item_idx),
                pos_idx=jnp.asarray(pos_idx),
            )
            mined_j = semi_hard_mining(
                logits_j, masks_j, num_negatives=num_negatives
            )
            np.testing.assert_array_equal(
                np.asarray(mined_j), mined_t.numpy()
            )

    @pytest.mark.parametrize("num_negatives", [1, 4, 8])
    def test_hard_mining_matches(self, ref, num_negatives):
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.masking import hard_mining, negative_masks

        for seed in range(5):
            arrays, logits_t, masks_t = self._logits_and_masks(ref, seed)
            _, _, _, item_idx, pos_idx = arrays
            module = ref.PairwiseHingeLoss(num_negatives=num_negatives)
            mined_t = module.hard_mining(logits_t, masks_t.clone())
            logits_j = jnp.asarray(logits_t.numpy())
            masks_j = negative_masks(
                logits_j,
                item_idx=jnp.asarray(item_idx),
                pos_idx=jnp.asarray(pos_idx),
            )
            mined_j = hard_mining(
                logits_j, masks_j, num_negatives=num_negatives
            )
            np.testing.assert_array_equal(
                np.asarray(mined_j), mined_t.numpy()
            )

    def test_squared_distance_matches(self, ref):
        import torch

        from xfmr_rec_tpu.ops.similarity import squared_distance

        user, item, *_ = make_batch(3)
        expected = ref.squared_distance(
            torch.from_numpy(user), torch.from_numpy(item)
        ).numpy()
        actual = np.asarray(squared_distance(user, item))
        np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-6)
