"""Sampler, postprocess and PQ-evaluator tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.diffusion import make_schedule
from ldmseg_tpu.diffusion.sampling import ddim_sample
from ldmseg_tpu.eval import PQStat, pq_compute_single
from ldmseg_tpu.eval.panoptic import PanopticEvaluator, id2rgb, rgb2id
from ldmseg_tpu.eval.postprocess import (
    crop_padding_np,
    filter_segments,
    panoptic_decode,
    postprocess_image,
    resize_bilinear_np,
)

SCHED = make_schedule(
    num_train_timesteps=100, beta_schedule="scaled_linear",
    beta_start=0.00085, beta_end=0.012, clip_sample=False,
    set_alpha_to_one=False,
)


def test_ddim_sample_shapes_and_determinism():
    def denoise(inputs, t, ctx):
        # fake epsilon predictor: returns the first 4 channels scaled
        return 0.1 * inputs[..., :4]

    rgb = jnp.ones((2, 8, 8, 4))
    out1 = ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                       num_inference_steps=10)
    out2 = ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                       num_inference_steps=10)
    assert out1.shape == (2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = ddim_sample(denoise, SCHED, jax.random.PRNGKey(1), rgb,
                       num_inference_steps=10)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 0


def test_ddim_sample_self_condition_and_cfg():
    calls = []

    def denoise(inputs, t, ctx):
        calls.append(inputs.shape)
        return jnp.zeros(inputs.shape[:-1] + (4,))

    rgb = jnp.ones((2, 8, 8, 4))
    ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                num_inference_steps=4, self_condition=True)
    assert calls[0][-1] == 12  # latents + rgb + condition

    calls.clear()
    ddim_sample(
        denoise, SCHED, jax.random.PRNGKey(0), rgb, num_inference_steps=4,
        encoder_hidden_states=jnp.zeros((2, 7, 16)),
        uncond_hidden_states=jnp.zeros((2, 7, 16)),
        guidance_scale=7.5,
    )
    assert calls[0][0] == 4  # CFG doubles the batch


def test_ddim_sample_inpainting_preserves_known():
    def denoise(inputs, t, ctx):
        return jnp.zeros(inputs.shape[:-1] + (4,))

    known = jnp.full((1, 8, 8, 4), 0.7)
    mask = jnp.zeros((1, 8, 8)).at[:, :4].set(1)
    out = ddim_sample(
        denoise, SCHED, jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)),
        num_inference_steps=5, inpaint_mask=mask, known_latents=known,
    )
    np.testing.assert_allclose(np.asarray(out[0, :4]), 0.7, atol=1e-5)
    assert np.abs(np.asarray(out[0, 4:]) - 0.7).max() > 0.01


def test_ddim_repeat_noise():
    def denoise(inputs, t, ctx):
        return inputs[..., :4] * 0.0

    rgb = jnp.ones((3, 4, 4, 4))
    out, noise = ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                             num_inference_steps=3, repeat_noise=True)
    noise = np.asarray(noise)
    np.testing.assert_array_equal(noise[0], noise[1])
    np.testing.assert_array_equal(noise[0], noise[2])


# ---------------------------------------------------------------- PQ ----


def test_rgb_id_roundtrip():
    ids = np.array([[0, 1, 255], [256, 70000, 2 ** 23]])
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_pq_perfect_match():
    pan = np.zeros((20, 20), np.uint32)
    pan[:10] = 1
    pan[10:] = 2
    segs = [{"id": 1, "category_id": 1, "iscrowd": 0},
            {"id": 2, "category_id": 1, "iscrowd": 0}]
    cats = {1: {"id": 1, "isthing": 1}}
    stat = pq_compute_single(pan, segs, pan, segs, cats)
    res, _ = stat.pq_average(cats)
    assert res["pq"] == pytest.approx(1.0)
    assert stat[1].tp == 2 and stat[1].fp == 0 and stat[1].fn == 0


def test_pq_iou_threshold():
    gt = np.zeros((10, 10), np.uint32)
    gt[:, :5] = 1
    pred = np.zeros((10, 10), np.uint32)
    pred[:, :3] = 1  # IoU = 30/50 = 0.6 > 0.5 -> TP
    segs_gt = [{"id": 1, "category_id": 1, "iscrowd": 0}]
    segs_pr = [{"id": 1, "category_id": 1}]
    cats = {1: {"id": 1, "isthing": 1}}
    stat = pq_compute_single(gt, segs_gt, pred, segs_pr, cats)
    assert stat[1].tp == 1
    assert stat[1].iou == pytest.approx(0.6)

    pred2 = np.zeros((10, 10), np.uint32)
    pred2[:, :2] = 1  # IoU = 20/50 = 0.4 -> FP + FN
    stat2 = pq_compute_single(gt, segs_gt, pred2, segs_pr, cats)
    assert stat2[1].tp == 0 and stat2[1].fp == 1 and stat2[1].fn == 1


def test_pq_void_and_crowd_handling():
    cats = {1: {"id": 1, "isthing": 1}}
    # prediction mostly over void -> not an FP
    gt = np.zeros((10, 10), np.uint32)  # all void
    gt[9, 9] = 5  # tiny gt outside the prediction
    segs_gt = [{"id": 5, "category_id": 1, "iscrowd": 0}]
    pred = np.zeros((10, 10), np.uint32)
    pred[:5] = 7
    segs_pr = [{"id": 7, "category_id": 1}]
    stat = pq_compute_single(gt, segs_gt, pred, segs_pr, cats)
    assert stat[1].fp == 0  # >50% void intersection
    assert stat[1].fn == 1  # the tiny gt segment is missed

    # crowd gt doesn't count as FN and shields preds from FP
    gt2 = np.zeros((10, 10), np.uint32)
    gt2[:6] = 9
    gt2[6:] = 3
    segs_gt2 = [{"id": 9, "category_id": 1, "iscrowd": 1},
                {"id": 3, "category_id": 1, "iscrowd": 0}]
    pred2 = np.zeros((10, 10), np.uint32)
    pred2[:5] = 2  # lies inside the crowd region
    segs_pr2 = [{"id": 2, "category_id": 1}]
    stat2 = pq_compute_single(gt2, segs_gt2, pred2, segs_pr2, cats)
    assert stat2[1].fp == 0  # crowd-shielded
    assert stat2[1].fn == 1  # non-crowd gt 3 missed


def test_pqstat_accumulation():
    s1, s2 = PQStat(), PQStat()
    s1[1].tp, s1[1].iou = 2, 1.5
    s2[1].tp, s2[1].fp = 1, 3
    s1 += s2
    assert s1[1].tp == 3 and s1[1].fp == 3 and s1[1].iou == 1.5


# ------------------------------------------------------ postprocess ----


def test_panoptic_decode_threshold():
    logits = np.full((1, 4, 4, 8), -5.0, np.float32)
    logits[0, :, :, 3] = 5.0
    logits[0, 0, 0] = 0.0  # uniform -> low confidence
    pred, conf = panoptic_decode(jnp.asarray(logits), mask_th=0.5)
    pred = np.asarray(pred)
    assert pred[0, 1, 1] == 3
    assert pred[0, 0, 0] == -1  # thresholded to void


def test_filter_segments_area_and_overlap():
    logits = np.full((1, 32, 32, 8), -8.0, np.float32)
    logits[0, :16, :, 2] = 8.0       # big segment id 2
    logits[0, 16:, :16, 3] = 8.0     # 256-px segment id 3
    logits[0, 16:, 16:, 4] = 8.0     # 256-px segment id 4
    pred, _ = panoptic_decode(jnp.asarray(logits), mask_th=0.5)
    out, keep = filter_segments(
        pred, jnp.asarray(logits), num_classes=8, count_th=300,
        overlap_th=0.5, mask_th=0.5,
    )
    out, keep = np.asarray(out), np.asarray(keep)
    assert keep[0, 2] and not keep[0, 3] and not keep[0, 4]
    assert set(np.unique(out)) == {0, 3}  # id 2 + 1; others void


def test_crop_and_resize_np():
    x = np.arange(2 * 6 * 6, dtype=np.float32).reshape(2, 6, 6)
    pad = np.zeros((6, 6))
    pad[1:5, 2:6] = 1
    cropped = crop_padding_np(x, pad)
    assert cropped.shape == (2, 4, 4)
    up = resize_bilinear_np(cropped, (8, 8))
    assert up.shape == (2, 8, 8)
    import torch
    import torch.nn.functional as TF

    ref = TF.interpolate(
        torch.from_numpy(cropped)[None], size=(8, 8), mode="bilinear",
        align_corners=False,
    )[0].numpy()
    np.testing.assert_allclose(up, ref, atol=1e-5)


def test_postprocess_image_end_to_end():
    c = 8
    logits = np.full((16, 16, c), -8.0, np.float32)
    logits[:8, :, 2] = 8.0
    logits[8:, :, 5] = 8.0
    pad = np.ones((16, 16))
    pan, segs = postprocess_image(
        logits, pad, (32, 32), mask_th=0.5, count_th=100, overlap_th=0.5,
    )
    assert pan.shape == (32, 32)
    ids = {s["id"] for s in segs}
    assert ids == {3, 6}  # label + 1
    assert set(np.unique(pan)) == {3, 6}


def test_evaluator_on_synthetic_gt(tmp_path):
    """GT fed as prediction -> PQ == 100."""
    from PIL import Image

    root = tmp_path / "panoptic"
    root.mkdir()
    annotations = []
    preds = []
    rng = np.random.default_rng(0)
    for i in range(3):
        pan = rng.integers(0, 4, size=(24, 24)).astype(np.uint32)
        # make segments contiguous blobs instead of noise
        pan = np.repeat(np.repeat(pan[::4, ::4], 4, 0), 4, 1)
        Image.fromarray(id2rgb(pan)).save(root / f"{i:012d}.png")
        segs = [
            {"id": int(v), "category_id": 1, "iscrowd": 0,
             "area": int((pan == v).sum())}
            for v in np.unique(pan) if v != 0
        ]
        annotations.append({"image_id": i, "file_name": f"{i:012d}.png",
                            "segments_info": segs})
        preds.append((pan, [{"id": int(v), "category_id": 1, "isthing": True}
                            for v in np.unique(pan) if v != 0]))

    gt_json = tmp_path / "panoptic_val.json"
    with open(gt_json, "w") as f:
        json.dump({
            "annotations": annotations,
            "categories": [{"id": 1, "name": "object", "isthing": 1}],
        }, f)

    meta = {
        "panoptic_json": str(gt_json),
        "panoptic_root": str(root),
        "thing_dataset_id_to_contiguous_id": {1: 0},
        "stuff_dataset_id_to_contiguous_id": {1: 0},
    }
    ev = PanopticEvaluator(meta, class_agnostic=True)
    ev.process(
        [f"{i}.jpg" for i in range(3)], list(range(3)),
        [{"panoptic_seg": p} for p in preds],
    )
    res = ev.evaluate()
    assert res["panoptic_seg"]["PQ"] == pytest.approx(100.0)
    assert res["panoptic_seg"]["SQ"] == pytest.approx(100.0)


def test_offline_pq_compute_cli_workflow(tmp_path):
    """Offline PQ on saved dirs (reference panoptic_evaluation.py:176-195):
    GT-as-prediction -> PQ 100; a corrupted prediction dir scores lower."""
    from PIL import Image

    from ldmseg_tpu.eval import offline_pq_compute

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    bad_dir = tmp_path / "bad"
    for d in (gt_dir, pred_dir, bad_dir):
        d.mkdir()
    annotations, pred_ann = [], []
    rng = np.random.default_rng(1)
    for i in range(3):
        pan = rng.integers(0, 4, size=(24, 24)).astype(np.uint32)
        pan = np.repeat(np.repeat(pan[::4, ::4], 4, 0), 4, 1)
        Image.fromarray(id2rgb(pan)).save(gt_dir / f"{i}.png")
        Image.fromarray(id2rgb(pan)).save(pred_dir / f"{i}.png")
        bad = np.roll(pan, 12, axis=0)
        Image.fromarray(id2rgb(bad)).save(bad_dir / f"{i}.png")
        segs = [
            {"id": int(v), "category_id": 1, "iscrowd": 0,
             "area": int((pan == v).sum())}
            for v in np.unique(pan) if v != 0
        ]
        annotations.append({"image_id": i, "file_name": f"{i}.png",
                            "segments_info": segs})
        pred_ann.append({"image_id": i, "file_name": f"{i}.png",
                         "segments_info": [
                             {"id": s["id"], "category_id": 1} for s in segs
                         ]})
    with open(tmp_path / "gt.json", "w") as f:
        json.dump({"annotations": annotations,
                   "categories": [{"id": 1, "name": "object", "isthing": 1}]},
                  f)
    with open(tmp_path / "pred.json", "w") as f:
        json.dump({"annotations": pred_ann}, f)

    res = offline_pq_compute(
        str(tmp_path / "gt.json"), str(tmp_path / "pred.json"),
        gt_folder=str(gt_dir), pred_folder=str(pred_dir), verbose=True,
    )
    assert res["All"]["pq"] == pytest.approx(1.0)

    res_bad = offline_pq_compute(
        str(tmp_path / "gt.json"), str(tmp_path / "pred.json"),
        gt_folder=str(gt_dir), pred_folder=str(bad_dir), verbose=False,
    )
    assert res_bad["All"]["pq"] < 1.0


def test_ddim_return_all_latents_consistent_with_default():
    """The default path carries final x0 instead of stacking; both paths
    must agree, and the stacked output must have [steps, ...] shape."""
    def denoise(inputs, t, ctx):
        return 0.1 * inputs[..., :4]

    rgb = jnp.ones((2, 8, 8, 4))
    final_default = ddim_sample(denoise, SCHED, jax.random.PRNGKey(3), rgb,
                                num_inference_steps=6)
    final_stacked, all_prev = ddim_sample(
        denoise, SCHED, jax.random.PRNGKey(3), rgb, num_inference_steps=6,
        return_all_latents=True,
    )
    assert all_prev.shape == (6, 2, 8, 8, 4)
    np.testing.assert_allclose(
        np.asarray(final_default), np.asarray(final_stacked), atol=1e-6
    )


def test_ddim_sample_bf16_carry_close_to_fp32(monkeypatch):
    """LDMSEG_SAMPLE_CARRY=bf16 (round-4 throughput knob) must stay close
    to the fp32 carry: the DDIM update math itself runs fp32 either way,
    only the carried latents/self-cond are cast between steps."""
    def denoise(inputs, t, ctx):
        return 0.1 * inputs[..., :4] + 0.05 * inputs[..., 4:8]

    rgb = jnp.ones((2, 8, 8, 4))
    ref = np.asarray(ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                                 num_inference_steps=10,
                                 self_condition=True))
    monkeypatch.setenv("LDMSEG_SAMPLE_CARRY", "bf16")
    out = np.asarray(ddim_sample(denoise, SCHED, jax.random.PRNGKey(0), rgb,
                                 num_inference_steps=10,
                                 self_condition=True))
    assert out.dtype == np.float32  # output stays fp32
    assert np.isfinite(out).all()
    # bf16 has ~3 decimal digits; the carry round-trips 10 times
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
