"""Native C++ eval accelerator: build + parity vs numpy."""

import numpy as np
import pytest

from ldmseg_tpu import native
from ldmseg_tpu.eval.panoptic import OFFSET


def _numpy_confusion(gt, pred):
    pair = gt.astype(np.uint64) * np.uint64(OFFSET) + pred.astype(np.uint64)
    return np.unique(pair, return_counts=True)


def test_native_builds_and_matches_numpy():
    if not native.native_available():
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.default_rng(0)
    # piecewise-constant maps like real panoptic data: upsampled coarse ids
    gt = np.kron(
        rng.integers(0, 40, size=(16, 16), dtype=np.uint32),
        np.ones((8, 8), dtype=np.uint32),
    )
    pred = np.kron(
        rng.integers(0, 50, size=(16, 16), dtype=np.uint32),
        np.ones((8, 8), dtype=np.uint32),
    )
    keys, counts = native.pair_confusion(gt, pred, OFFSET)
    ref_keys, ref_counts = _numpy_confusion(gt, pred)
    order = np.argsort(keys)
    np.testing.assert_array_equal(keys[order], ref_keys)
    np.testing.assert_array_equal(counts[order], ref_counts)
    assert counts.sum() == gt.size


def test_native_random_noise_maps():
    if not native.native_available():
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 1000, size=(123, 77), dtype=np.uint32)
    pred = rng.integers(0, 1000, size=(123, 77), dtype=np.uint32)
    keys, counts = native.pair_confusion(gt, pred, OFFSET)
    ref_keys, ref_counts = _numpy_confusion(gt, pred)
    order = np.argsort(keys)
    np.testing.assert_array_equal(keys[order], ref_keys)
    np.testing.assert_array_equal(counts[order], ref_counts)


def test_fallback_when_disabled(monkeypatch):
    monkeypatch.setenv("LDMSEG_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", False)
    gt = np.asarray([[0, 1], [1, 2]], dtype=np.uint32)
    pred = np.asarray([[0, 1], [2, 2]], dtype=np.uint32)
    keys, counts = native.pair_confusion(gt, pred, OFFSET)
    ref_keys, ref_counts = _numpy_confusion(gt, pred)
    np.testing.assert_array_equal(np.sort(keys), ref_keys)
    assert counts.sum() == 4
    monkeypatch.setattr(native, "_lib_failed", False)
