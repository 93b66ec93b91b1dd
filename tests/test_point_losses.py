"""Point-sampling / segmentation-loss tests vs torch grid_sample oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from ldmseg_tpu.losses import (
    SegLossConfig,
    point_sample,
    segmentation_point_loss,
)
from ldmseg_tpu.losses.point_losses import (
    build_mask_slots,
    loss_ce,
    loss_masks,
    _sample_channel,
    _sample_binary_target,
)


def torch_point_sample(feat_nchw, coords, mode="bilinear"):
    """detectron2 point_sample oracle (detectron2_utils.py:73-96)."""
    grid = 2.0 * torch.from_numpy(coords).unsqueeze(2) - 1.0
    out = TF.grid_sample(
        torch.from_numpy(feat_nchw), grid, mode=mode, align_corners=False
    )
    return out.squeeze(3).numpy()  # [B, C, P]


def test_point_sample_bilinear_matches_grid_sample():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(2, 9, 13, 5)).astype(np.float32)
    coords = rng.random((2, 50, 2)).astype(np.float32)
    ours = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(coords)))
    ref = torch_point_sample(feat.transpose(0, 3, 1, 2), coords)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=1e-5)


def test_point_sample_nearest_matches_grid_sample():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(2, 7, 7, 1)).astype(np.float32)
    coords = rng.random((2, 64, 2)).astype(np.float32)
    ours = np.asarray(
        point_sample(jnp.asarray(feat), jnp.asarray(coords), mode="nearest")
    )
    ref = torch_point_sample(feat.transpose(0, 3, 1, 2), coords, mode="nearest")
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=1e-6)


def test_point_sample_edges_zero_padding():
    feat = np.ones((1, 4, 4, 1), dtype=np.float32)
    coords = np.array([[[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]]], dtype=np.float32)
    ours = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(coords)))
    ref = torch_point_sample(feat.transpose(0, 3, 1, 2), coords)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=1e-6)
    # corners at exactly (0,0): centre is at -0.5 pixels -> 1/4 weight in-bounds
    np.testing.assert_allclose(ours[0, 0, 0], 0.25, atol=1e-6)


def test_sample_channel_consistent_with_point_sample():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    coords = rng.random((2, 3, 10, 2)).astype(np.float32)
    channels = np.array([[0, 2, 5], [1, 1, 3]])
    ours = np.asarray(
        _sample_channel(jnp.asarray(feat), jnp.asarray(coords), jnp.asarray(channels))
    )
    for b in range(2):
        for k in range(3):
            full = np.asarray(
                point_sample(jnp.asarray(feat[b: b + 1]), jnp.asarray(coords[b: b + 1, k]))
            )
            np.testing.assert_allclose(ours[b, k], full[0, :, channels[b, k]], atol=1e-5)


def test_sample_binary_target():
    targets = np.zeros((1, 8, 8), dtype=np.int32)
    targets[0, :4] = 7
    coords = np.array([[[[0.5, 0.1], [0.5, 0.9], [0.5, 0.5]]]], dtype=np.float32)
    ids = np.array([[7]])
    out = np.asarray(
        _sample_binary_target(jnp.asarray(targets), jnp.asarray(coords), jnp.asarray(ids))
    )
    np.testing.assert_allclose(out[0, 0, 0], 1.0)  # inside the instance
    np.testing.assert_allclose(out[0, 0, 1], 0.0)  # outside
    np.testing.assert_allclose(out[0, 0, 2], 0.5)  # straddling the boundary


def test_build_mask_slots():
    cfg = SegLossConfig(num_classes=16, max_masks=4, ignore_label=0)
    targets = np.zeros((2, 8, 8), dtype=np.int32)
    targets[0, 0] = 3
    targets[0, 1] = 9
    targets[1, :] = 5
    ids, valid = build_mask_slots(jnp.asarray(targets), cfg)
    ids, valid = np.asarray(ids), np.asarray(valid)
    assert set(ids[0][valid[0]]) == {3, 9}
    assert set(ids[1][valid[1]]) == {5}
    assert valid[0].sum() == 2 and valid[1].sum() == 1
    assert not valid[0][2] and not valid[0][3]  # empty slots invalid


def _toy_problem(seed=0, b=2, hw=32, c=16):
    """Blocky instance maps (quadrants of classes 1..4, plus a void strip)."""
    rng = np.random.default_rng(seed)
    targets = np.zeros((b, hw, hw), dtype=np.int32)
    half = hw // 2
    for bi in range(b):
        perm = rng.permutation(np.arange(1, 5))
        targets[bi, :half, :half] = perm[0]
        targets[bi, :half, half:] = perm[1]
        targets[bi, half:, :half] = perm[2]
        targets[bi, half:, half:] = perm[3]
        targets[bi, : hw // 8, :] = 0  # void strip
    # perfect logits: one-hot * 10
    logits = np.full((b, hw, hw, c), -10.0, dtype=np.float32)
    for k in range(1, 5):
        logits[..., k] = np.where(targets == k, 10.0, -10.0)
    return logits, targets


def test_losses_near_zero_for_perfect_prediction():
    cfg = SegLossConfig(num_points=256, num_classes=16, max_masks=8)
    logits, targets = _toy_problem()
    out = segmentation_point_loss(
        jnp.asarray(logits), jnp.asarray(targets), jax.random.PRNGKey(0), cfg
    )
    assert float(out["ce"]) < 0.05  # boundary points are soft
    assert float(out["mask"]) < 0.35  # dice floor from soft boundary points


def test_losses_high_for_wrong_prediction():
    cfg = SegLossConfig(num_points=256, num_classes=16, max_masks=8)
    logits, targets = _toy_problem()
    wrong = np.roll(logits, shift=6, axis=-1)  # shift all classes
    out = segmentation_point_loss(
        jnp.asarray(wrong), jnp.asarray(targets), jax.random.PRNGKey(0), cfg
    )
    assert float(out["ce"]) > 1.0
    assert float(out["mask"]) > 1.0


def test_loss_ce_respects_ignore_and_valid_region():
    cfg = SegLossConfig(num_points=128, num_classes=16, max_masks=8, ignore_label=0)
    logits, targets = _toy_problem(seed=1)
    # making everything ignore -> zero loss (no valid points)
    region = np.zeros_like(targets)
    val = loss_ce(
        jnp.asarray(logits), jnp.asarray(targets), jax.random.PRNGKey(0), cfg,
        valid_region=jnp.asarray(region),
    )
    assert float(val) == 0.0


def test_losses_are_differentiable():
    cfg = SegLossConfig(num_points=64, num_classes=16, max_masks=8)
    logits, targets = _toy_problem(seed=2, hw=16)

    def f(lg):
        out = segmentation_point_loss(
            lg, jnp.asarray(targets), jax.random.PRNGKey(0), cfg
        )
        return out["ce"] + out["mask"]

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
