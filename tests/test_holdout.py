"""Held-out split + synthetic-category (class-aware PQ) tests.

VERDICT r3 Missing #1: the bundled-examples proxy served the SAME 16
images for train and val (training-set PQ). ``holdout=N`` reserves the
last N sorted examples for val — the honest equivalent of the
reference's held-out val2017 protocol (reference coco.py:106,
README.md:136) on the only data available.

VERDICT r3 Weak #6: class-aware PQ (reference
panoptic_evaluation.py:60-73) had no end-to-end consumer.
``synthetic_categories=K`` assigns deterministic area-bucket classes so
the class-aware evaluator runs through the full generative eval.
"""

import json
import os
import shutil

import jax
import numpy as np
import pytest

from ldmseg_tpu.core.mesh import MeshSpec, make_mesh
from ldmseg_tpu.data.coco import (
    COCOExamples,
    area_bucket_category,
    synthetic_category_table,
)
from ldmseg_tpu.eval.panoptic import PanopticEvaluator, rgb2id
from ldmseg_tpu.eval.postprocess import assign_area_bucket_categories

REF_EXAMPLES = "/root/reference/data/examples/coco"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="bundled examples unavailable"
)


@pytest.fixture(scope="module")
def examples_root(tmp_path_factory):
    dst = tmp_path_factory.mktemp("ex_holdout")
    shutil.copytree(REF_EXAMPLES, dst / "coco", dirs_exist_ok=True)
    return str(dst / "coco")


def test_holdout_split_disjoint_and_exhaustive(examples_root):
    tr = COCOExamples(examples_root, split="train", holdout=4)
    va = COCOExamples(examples_root, split="val", holdout=4)
    assert len(tr) == 12 and len(va) == 4
    tn = {os.path.basename(f) for f in tr.images}
    vn = {os.path.basename(f) for f in va.images}
    assert not (tn & vn)
    full = COCOExamples(examples_root, split="val")
    assert tn | vn == {os.path.basename(f) for f in full.images}
    # val GT json covers exactly the val names (a GT entry without a
    # prediction would silently skew PQ denominators)
    with open(va.panoptic_json) as f:
        anns = json.load(f)["annotations"]
    assert {a["file_name"] for a in anns} == {
        n.replace(".jpg", ".png") for n in vn
    }
    # the full-split json is untouched (different cache filename)
    assert va.panoptic_json != full.panoptic_json


def test_holdout_bounds_checked(examples_root):
    with pytest.raises(AssertionError):
        COCOExamples(examples_root, split="train", holdout=16)


def test_area_bucket_rule_is_monotonic_and_total():
    image_area = 100_000
    cats = [area_bucket_category(a, image_area, 3)
            for a in (10, 900, 999, 1000, 5999, 6000, 99_000)]
    assert cats == [10, 10, 10, 20, 20, 30, 30]
    assert {c["id"] for c in synthetic_category_table(3)} == {10, 20, 30}
    cats2 = [area_bucket_category(a, image_area, 2)
             for a in (10, 2999, 3000, 99_000)]
    assert cats2 == [10, 10, 20, 20]


def test_synthetic_categories_gt_json_and_metadata(examples_root):
    va = COCOExamples(examples_root, split="val", holdout=4,
                      synthetic_categories=3)
    with open(va.panoptic_json) as f:
        data = json.load(f)
    used = {s["category_id"] for a in data["annotations"]
            for s in a["segments_info"]}
    assert used <= {10, 20, 30}
    assert len(used) >= 2, "fixture should actually exercise >1 category"
    assert va.meta_data["thing_dataset_id_to_contiguous_id"] == {
        10: 0, 20: 1, 30: 2
    }
    # GT areas must obey the bucket rule wrt the image area
    from PIL import Image

    for a in data["annotations"]:
        png = os.path.join(os.path.dirname(va.panoptic_json), a["file_name"])
        arr = np.array(Image.open(png).convert("RGB"))
        image_area = arr.shape[0] * arr.shape[1]
        for s in a["segments_info"]:
            assert s["category_id"] == area_bucket_category(
                s["area"], image_area, 3
            )


def test_class_aware_pq_perfect_and_degraded(examples_root):
    """Class-aware evaluator end-to-end: GT fed back as prediction scores
    PQ 100; re-bucketing a segment into the wrong category drops it."""
    va = COCOExamples(examples_root, split="val", holdout=4,
                      synthetic_categories=3)
    thing_map = va.meta_data["thing_dataset_id_to_contiguous_id"]

    def predictions():
        from PIL import Image

        with open(va.panoptic_json) as f:
            anns = {a["file_name"]: a for a in json.load(f)["annotations"]}
        out = []
        for f_img in va.images:
            name = os.path.basename(f_img).replace(".jpg", ".png")
            png = os.path.join(os.path.dirname(va.panoptic_json), name)
            pan = rgb2id(np.array(Image.open(png).convert("RGB")))
            segs = [
                {"id": s["id"], "category_id": 1, "isthing": True}
                for s in anns[name]["segments_info"]
            ]
            segs = assign_area_bucket_categories(pan, segs, 3, thing_map)
            out.append((name, anns[name]["image_id"], pan, segs))
        return out

    ev = PanopticEvaluator(va.meta_data, class_agnostic=False)
    preds = predictions()
    for name, image_id, pan, segs in preds:
        ev.process([name], [image_id],
                   [{"panoptic_seg": (pan, segs)}])
    res = ev.evaluate(verbose=False)["panoptic_seg"]
    assert res["PQ"] == pytest.approx(100.0)

    # degrade: force every predicted segment into bucket 0 (contiguous 0);
    # segments whose GT bucket differs become unmatched (category gate in
    # pq_compute_single) -> PQ drops
    ev2 = PanopticEvaluator(va.meta_data, class_agnostic=False)
    for name, image_id, pan, segs in preds:
        bad = [dict(s, category_id=0) for s in segs]
        ev2.process([name], [image_id],
                    [{"panoptic_seg": (pan, bad)}])
    res2 = ev2.evaluate(verbose=False)["panoptic_seg"]
    assert res2["PQ"] < res["PQ"] - 10


def test_evaluator_dedupes_padded_batch_duplicates(examples_root):
    """The loader repeat-pads partial batches (loader.py _batches), so
    with a 4-image holdout val and batch_size 8 the first image reaches
    the evaluator 5 times. evaluate() must count each image once."""
    from PIL import Image

    va = COCOExamples(examples_root, split="val", holdout=4)
    with open(va.panoptic_json) as f:
        anns = {a["file_name"]: a for a in json.load(f)["annotations"]}

    def perfect(name):
        png = os.path.join(os.path.dirname(va.panoptic_json), name)
        pan = rgb2id(np.array(Image.open(png).convert("RGB")))
        segs = [{"id": s["id"], "category_id": 1}
                for s in anns[name]["segments_info"]]
        return pan, segs

    names = [os.path.basename(f).replace(".jpg", ".png") for f in va.images]
    # degrade image 0 only: predict a single full-frame segment
    pan0, _ = perfect(names[0])
    bad0 = (np.ones_like(pan0), [{"id": 1, "category_id": 1}])

    def run(duplicate_first):
        ev = PanopticEvaluator(va.meta_data, class_agnostic=True)
        for name in names:
            pan, segs = bad0 if name == names[0] else perfect(name)
            ev.process([name], [anns[name]["image_id"]],
                       [{"panoptic_seg": (pan, segs)}])
        if duplicate_first:
            for _ in range(4):  # batch-8 padding over 4 images
                ev.process([names[0]], [anns[names[0]]["image_id"]],
                           [{"panoptic_seg": bad0}])
        return ev.evaluate(verbose=False)["panoptic_seg"]["PQ"]

    assert run(True) == pytest.approx(run(False))


def test_assign_area_bucket_categories_contiguous_ids():
    pan = np.zeros((100, 100), dtype=np.uint32)
    pan[:10, :10] = 1          # 100 px   -> frac .01  -> bucket 1 (id 20)
    pan[50:, :] = 2            # 5000 px  -> frac .5   -> bucket 2 (id 30)
    pan[20, 20] = 3            # 1 px     -> bucket 0 (id 10)
    segs = [{"id": i, "category_id": 1, "isthing": True} for i in (1, 2, 3)]
    out = assign_area_bucket_categories(pan, segs, 3, {10: 0, 20: 1, 30: 2})
    assert [s["category_id"] for s in out] == [1, 2, 0]
    # input untouched (helper copies)
    assert [s["category_id"] for s in segs] == [1, 1, 1]


def test_trainer_multiseed_eval_and_class_aware(tmp_path, examples_root):
    """compute_pq with eval_seeds=[0,1]: reports the cross-seed mean +
    per-seed values; class_agnostic=False runs end-to-end on the
    synthetic-category dataset (VERDICT r3 weak #6 'done' criterion)."""
    from ldmseg_tpu.data.transforms import (
        get_train_transforms,
        get_val_transforms,
    )
    from ldmseg_tpu.models.unet import tiny_unet_config
    from ldmseg_tpu.models.vae_sd import SDVAEConfig
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from tests.test_trainers import tiny_config

    p = tiny_config(tmp_path)
    p["eval_kwargs"]["eval_seeds"] = [0, 1]
    p["eval_kwargs"]["count_th"] = 4
    kw = dict(num_classes=128, fill_value=0.5, ignore_label=0,
              holdout=4, synthetic_categories=3)
    ds_t = COCOExamples(examples_root, split="train",
                        transform=get_train_transforms(
                            p["transformation_kwargs"]), **kw)
    ds_v = COCOExamples(examples_root, split="val",
                        transform=get_val_transforms(
                            p["transformation_kwargs"]), **kw)
    assert len(ds_t) == 12 and len(ds_v) == 4
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run_ms"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    res = trainer.compute_pq(num_inference_steps=2)
    assert "PQ_seed_std" in res["panoptic_seg"]
    assert set(res["PQ_seeds"]) == {"0", "1"}
    mean = np.mean(list(res["PQ_seeds"].values()))
    assert res["panoptic_seg"]["PQ"] == pytest.approx(mean)

    res_ca = trainer.compute_pq(num_inference_steps=2, seed=0,
                                class_agnostic=False)
    assert np.isfinite(res_ca["panoptic_seg"]["PQ"])
    # an explicit scalar seed keeps the single-seed (reference) protocol
    assert "PQ_seed_std" not in res_ca["panoptic_seg"]
