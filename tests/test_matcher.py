"""Hungarian-matcher loss variant tests (losses.py:44-101, off by default)."""

import jax
import jax.numpy as jnp
import numpy as np

from ldmseg_tpu.losses import SegLossConfig, hungarian_match, matched_segmentation_loss


def _problem(seed=0, hw=32, c=16):
    """Quadrant instances whose gt ids do NOT equal their best logit channel."""
    rng = np.random.default_rng(seed)
    targets = np.zeros((2, hw, hw), dtype=np.int32)
    half = hw // 2
    # gt ids 1..4; logits put the masses on channels 11..14 (shift by 10)
    quads = [(slice(None, half), slice(None, half)),
             (slice(None, half), slice(half, None)),
             (slice(half, None), slice(None, half)),
             (slice(half, None), slice(half, None))]
    logits = np.full((2, hw, hw, c), -10.0, dtype=np.float32)
    for b in range(2):
        for i, (sy, sx) in enumerate(quads):
            targets[b, sy, sx] = i + 1
            logits[b, sy, sx, (i + 11) % c] = 10.0
    return logits, targets


def test_hungarian_match_finds_shifted_channels():
    logits, targets = _problem()
    cfg = SegLossConfig(num_points=128, num_classes=16, max_masks=8)
    slot_ids, slot_valid, assigned = hungarian_match(
        jnp.asarray(logits), jnp.asarray(targets), jax.random.PRNGKey(0), cfg
    )
    slot_ids, slot_valid, assigned = map(np.asarray, (slot_ids, slot_valid, assigned))
    for b in range(2):
        for k in range(8):
            if not slot_valid[b, k]:
                continue
            gt_id = slot_ids[b, k]
            assert assigned[b, k] == (gt_id + 10) % 16, (gt_id, assigned[b, k])


def test_matched_loss_lower_for_matched_prediction():
    """With matching, a channel-shifted (but correct) prediction scores well."""
    logits, targets = _problem()
    cfg = SegLossConfig(num_points=128, num_classes=16, max_masks=8)
    out = matched_segmentation_loss(
        jnp.asarray(logits), jnp.asarray(targets), jax.random.PRNGKey(0), cfg
    )
    assert float(out["ce"]) < 0.1
    assert float(out["mask"]) < 0.4

    # a garbage prediction scores badly even with matching
    bad = np.full_like(logits, -10.0)
    out_bad = matched_segmentation_loss(
        jnp.asarray(bad), jnp.asarray(targets), jax.random.PRNGKey(0), cfg
    )
    assert float(out_bad["mask"]) > 0.9


def test_matched_loss_is_differentiable():
    logits, targets = _problem(hw=16)
    cfg = SegLossConfig(num_points=64, num_classes=16, max_masks=8)

    def f(lg):
        out = matched_segmentation_loss(
            lg, jnp.asarray(targets), jax.random.PRNGKey(0), cfg
        )
        return out["ce"] + out["mask"]

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
