"""Encoding/remap/colormap unit tests (semantics from ldmseg/data/coco.py:320-390)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.data import (
    MaskingGenerator,
    color_map,
    decode_bitmap,
    decode_bitmap_jnp,
    encode_bitmap,
    encode_bitmap_jnp,
    encode_semseg_color,
    encode_semseg_random_color,
    remap_labels,
)


def test_bitmap_roundtrip_all_ids():
    ids = np.arange(128).reshape(8, 16)
    bits, ignore = encode_bitmap(ids, n=7, fill_value=0.5, ignore_label=-1)
    assert bits.shape == (8, 16, 7)
    # map {0,1} -> [-1,1] as the AE input scaling does (2x-1)
    decoded = decode_bitmap(2 * bits - 1)
    np.testing.assert_array_equal(decoded, ids)


def test_bitmap_void_fill():
    ids = np.array([[0, 5], [127, 0]])
    bits, ignore = encode_bitmap(ids, n=7, fill_value=0.5, ignore_label=0)
    np.testing.assert_array_equal(ignore, ids == 0)
    assert np.all(bits[0, 0] == 0.5)
    assert np.all(bits[1, 1] == 0.5)
    assert set(np.unique(bits[0, 1])) <= {0.0, 1.0}
    np.testing.assert_array_equal(bits[1, 0], np.ones(7))  # 127 = 1111111b


def test_bitmap_jnp_matches_numpy():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 16, 16))
    bits_np, ig_np = encode_bitmap(ids, ignore_label=0)
    bits_j, ig_j = encode_bitmap_jnp(jnp.asarray(ids), ignore_label=0)
    np.testing.assert_allclose(np.asarray(bits_j), bits_np)
    np.testing.assert_array_equal(np.asarray(ig_j), ig_np)
    dec_j = decode_bitmap_jnp(jnp.asarray(2 * bits_np - 1))
    np.testing.assert_array_equal(np.asarray(dec_j), decode_bitmap(2 * bits_np - 1))


def test_remap_labels_properties():
    rng = np.random.default_rng(42)
    labels = np.zeros((32, 32), dtype=np.int64)
    labels[:8] = 3
    labels[8:16] = 77
    labels[16:24] = 200  # ids may exceed num_classes before remap (raw COCO ids)
    remapped, mapping = remap_labels(labels, num_classes=128, ignore_label=0, rng=rng)
    # ignore stays fixed
    np.testing.assert_array_equal(remapped == 0, labels == 0)
    # targets unique, in [1, 128)
    vals = list(mapping.values())
    assert len(set(vals)) == len(vals) == 3
    assert all(1 <= v < 128 for v in vals)
    # structure preserved
    for old, new in mapping.items():
        np.testing.assert_array_equal(remapped == new, labels == old)


def test_remap_labels_deterministic_with_seed():
    labels = np.array([[1, 2], [3, 0]])
    r1, m1 = remap_labels(labels, rng=np.random.default_rng(7))
    r2, m2 = remap_labels(labels, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(r1, r2)
    assert m1 == m2


def test_color_map_reference_values():
    cmap = color_map()
    # well-known PASCAL VOC colors
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])
    np.testing.assert_array_equal(cmap[3], [128, 128, 0])
    np.testing.assert_array_equal(cmap[4], [0, 0, 128])
    np.testing.assert_array_equal(cmap[21], [128, 64, 128])
    norm = color_map(normalized=True)
    np.testing.assert_allclose(norm, cmap / 255.0)


def test_encode_semseg_color():
    seg = np.array([[0, 1], [2, 1]])
    out = encode_semseg_color(seg)
    cmap = color_map()
    np.testing.assert_array_equal(out[0, 1], cmap[1])
    np.testing.assert_array_equal(out[1, 0], cmap[2])


def test_encode_semseg_random_color_distinct():
    seg = np.array([[0, 1], [2, 3]])
    out = encode_semseg_random_color(seg, rng=np.random.default_rng(0))
    colors = {tuple(out[i, j]) for i in range(2) for j in range(2)}
    assert len(colors) == 4  # 3 ids + void(0,0,0)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])


def test_mask_generator_local():
    gen = MaskingGenerator((64, 64), mode="random_local", rng=np.random.default_rng(0))
    m = gen(t=0.25)
    assert m.shape == (64, 64)
    frac = m.mean()
    assert 0.2 < frac < 0.3
    assert gen(t=0.0).sum() == 0
    assert gen(t=1.0).sum() == 64 * 64


def test_mask_generator_global():
    gen = MaskingGenerator(
        (32, 32), num_masking_patches=256, mode="random_global",
        rng=np.random.default_rng(0),
    )
    m = gen()
    assert m.shape == (32, 32)
    assert 0 < m.sum() <= 256 + 128  # within budget (+max block overshoot)


def test_mask_generator_combined():
    gen = MaskingGenerator(
        (32, 32), num_masking_patches=128, mode="random_global_plus_local",
        rng=np.random.default_rng(1),
    )
    m = gen(t=0.1)
    assert set(np.unique(m)) <= {0, 1}
    assert m.sum() > 0


def test_deterministic_remap_stable_across_epochs():
    """deterministic_remap=True: same image -> same id permutation on every
    read (overfit/debug aid); default random remap resamples per read."""
    import os
    from ldmseg_tpu.data.coco import COCOExamples

    root = "/tmp/ldmseg_data/examples"
    if not os.path.isdir(root):
        import pytest

        pytest.skip("bundled examples unavailable")
    ds = COCOExamples(root, split="train", deterministic_remap=True)
    a = np.asarray(ds[0]["semseg"])
    b = np.asarray(ds[0]["semseg"])
    np.testing.assert_array_equal(a, b)

    ds_rand = COCOExamples(root, split="train", deterministic_remap=False)
    reads = [np.asarray(ds_rand[0]["semseg"]) for _ in range(4)]
    assert any((reads[0] != r).any() for r in reads[1:])
