"""Panoptic Quality evaluation (panopticapi-compatible, no external dep).

Replaces the reference's panopticapi ``pq_compute_multi_core`` + detectron2
evaluator (ldmseg/evaluations/panoptic_evaluation_agnostic.py) with a
self-contained numpy implementation of the PQ matching algorithm
(Kirillov et al., "Panoptic Segmentation"):

  * per-image confusion via ``gt_id * OFFSET + pred_id`` unique counting,
  * IoU > 0.5 one-to-one matching within the same category,
  * crowd/void handling: unmatched predictions overlapping void+crowd by
    more than 50% of their area are not counted as FP; crowd GT segments
    are never FN.

The evaluator mirrors the reference classes:
  * class-agnostic mode rewrites the GT annotations with category_id=1,
    cached as ``*_agnostic.json`` (panoptic_evaluation_agnostic.py:59-72),
  * ``process()`` accumulates in-memory predictions,
  * ``evaluate()`` gathers across hosts (jax.multihost_utils when
    multi-process) and computes PQ/SQ/RQ (+ precision/recall).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from ldmseg_tpu.native import pair_confusion

OFFSET = 256 ** 3
VOID = 0


class PQStatCat:
    __slots__ = ("iou", "tp", "fp", "fn")

    def __init__(self):
        self.iou = 0.0
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def __iadd__(self, other: "PQStatCat") -> "PQStatCat":
        self.iou += other.iou
        self.tp += other.tp
        self.fp += other.fp
        self.fn += other.fn
        return self


class PQStat:
    def __init__(self):
        self.pq_per_cat: Dict[int, PQStatCat] = defaultdict(PQStatCat)

    def __getitem__(self, cat_id: int) -> PQStatCat:
        return self.pq_per_cat[cat_id]

    def __iadd__(self, other: "PQStat") -> "PQStat":
        for cat, stat in other.pq_per_cat.items():
            self.pq_per_cat[cat] += stat
        return self

    def pq_average(self, categories: Dict[int, dict], isthing: Optional[bool] = None):
        pq, sq, rq, n = 0.0, 0.0, 0.0, 0
        per_class = {}
        for cat_id, cat in categories.items():
            if isthing is not None and bool(cat["isthing"]) != isthing:
                continue
            s = self.pq_per_cat[cat_id]
            if s.tp + s.fp + s.fn == 0:
                per_class[cat_id] = {"pq": 0.0, "sq": 0.0, "rq": 0.0}
                continue
            n += 1
            pq_c = s.iou / (s.tp + 0.5 * s.fp + 0.5 * s.fn)
            sq_c = s.iou / s.tp if s.tp != 0 else 0.0
            rq_c = s.tp / (s.tp + 0.5 * s.fp + 0.5 * s.fn)
            per_class[cat_id] = {"pq": pq_c, "sq": sq_c, "rq": rq_c}
            pq += pq_c
            sq += sq_c
            rq += rq_c
        n = max(n, 1)
        return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}, per_class


def rgb2id(color: np.ndarray) -> np.ndarray:
    """Panoptic PNG decode: id = R + 256 G + 256^2 B (coco.py:489-490)."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + (256 ** 2) * color[..., 2]


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    id_map = id_map.astype(np.uint32)
    return np.stack(
        [id_map % 256, (id_map // 256) % 256, (id_map // 256 ** 2) % 256], axis=-1
    ).astype(np.uint8)


def pq_compute_single(
    pan_gt: np.ndarray,
    gt_segments: List[dict],
    pan_pred: np.ndarray,
    pred_segments: List[dict],
    categories: Dict[int, dict],
) -> PQStat:
    """PQ statistics for one image (panopticapi pq_compute_single_core logic)."""
    stat = PQStat()
    gt_segms = {s["id"]: dict(s) for s in gt_segments}
    pred_segms = {s["id"]: dict(s) for s in pred_segments}

    # ONE pass over the two id maps (native C++ histogram when available,
    # numpy sort fallback): the pair confusion, from which both per-map
    # area tables derive — replaces three np.unique sorts
    keys, counts = pair_confusion(pan_gt, pan_pred, OFFSET)
    gt_ids = (keys // np.uint64(OFFSET)).tolist()
    pred_ids = (keys % np.uint64(OFFSET)).tolist()
    counts = counts.tolist()

    confusion = {}
    pred_areas: Dict[int, int] = defaultdict(int)
    gt_areas: Dict[int, int] = defaultdict(int)
    for g, p, c in zip(gt_ids, pred_ids, counts):
        confusion[(g, p)] = c
        pred_areas[p] += c
        gt_areas[g] += c
    # recompute pred areas; validate labels
    for lab in list(pred_segms):
        pred_segms[lab]["area"] = pred_areas.get(lab, 0)
    for lab in list(gt_segms):
        if lab in gt_areas:
            gt_segms[lab]["area"] = gt_areas[lab]

    matched_gt, matched_pred = set(), set()
    for (gt_l, pred_l), inter in confusion.items():
        if gt_l not in gt_segms or pred_l not in pred_segms:
            continue
        if gt_segms[gt_l].get("iscrowd", 0) == 1:
            continue
        if gt_segms[gt_l]["category_id"] != pred_segms[pred_l]["category_id"]:
            continue
        union = (
            gt_segms[gt_l]["area"]
            + pred_segms[pred_l]["area"]
            - inter
            - confusion.get((VOID, pred_l), 0)
        )
        iou = inter / union
        if iou > 0.5:
            cat = gt_segms[gt_l]["category_id"]
            stat[cat].tp += 1
            stat[cat].iou += iou
            matched_gt.add(gt_l)
            matched_pred.add(pred_l)

    crowd_by_cat = {}
    for gt_l, info in gt_segms.items():
        if info.get("iscrowd", 0) == 1:
            crowd_by_cat[info["category_id"]] = gt_l
            continue
        if gt_l in matched_gt:
            continue
        stat[info["category_id"]].fn += 1

    for pred_l, info in pred_segms.items():
        if pred_l in matched_pred:
            continue
        intersection = confusion.get((VOID, pred_l), 0)
        if info["category_id"] in crowd_by_cat:
            intersection += confusion.get((crowd_by_cat[info["category_id"]], pred_l), 0)
        if info["area"] > 0 and intersection / info["area"] > 0.5:
            continue
        stat[info["category_id"]].fp += 1
    return stat


def make_agnostic_gt_json(panoptic_json: str) -> str:
    """Rewrite GT annotations with category_id=1, cached next to the original
    (panoptic_evaluation_agnostic.py:59-72)."""
    agnostic = panoptic_json.replace(".json", "_agnostic.json")
    if not os.path.exists(agnostic):
        with open(panoptic_json, "r") as f:
            data = json.load(f)
        for anno in data["annotations"]:
            for seg in anno["segments_info"]:
                seg["category_id"] = 1
        data["categories"] = [
            {"id": 1, "name": "object", "supercategory": "object", "isthing": 1}
        ]
        with open(agnostic, "w") as f:
            json.dump(data, f)
    return agnostic


def offline_pq_compute(
    gt_json: str,
    pred_json: str,
    gt_folder: Optional[str] = None,
    pred_folder: Optional[str] = None,
    verbose: bool = True,
) -> Dict[str, Dict]:
    """Offline PQ over saved prediction directories.

    panopticapi ``pq_compute`` parity: GT json + PNG dir vs prediction
    json + PNG dir, matched by image_id. This is the published offline
    workflow of the reference CLI
    (ldmseg/evaluations/panoptic_evaluation.py:176-195).
    """
    from PIL import Image

    with open(gt_json) as f:
        gt = json.load(f)
    with open(pred_json) as f:
        pred = json.load(f)
    gt_folder = gt_folder or gt_json.replace(".json", "")
    pred_folder = pred_folder or pred_json.replace(".json", "")
    categories = {c["id"]: c for c in gt["categories"]}
    pred_by_id = {a["image_id"]: a for a in pred["annotations"]}

    stat = PQStat()
    for ann in gt["annotations"]:
        if ann["image_id"] not in pred_by_id:
            raise KeyError(f"no prediction for image_id {ann['image_id']}")
        p = pred_by_id[ann["image_id"]]
        pan_gt = rgb2id(np.array(
            Image.open(os.path.join(gt_folder, ann["file_name"])).convert("RGB")
        ))
        pan_pred = rgb2id(np.array(
            Image.open(os.path.join(pred_folder, p["file_name"])).convert("RGB")
        ))
        stat += pq_compute_single(
            pan_gt, ann["segments_info"], pan_pred, p["segments_info"],
            categories,
        )

    results = {}
    for name, isthing in (("All", None), ("Things", True), ("Stuff", False)):
        res, per_class = stat.pq_average(categories, isthing=isthing)
        results[name] = res
        if name == "All":
            results["per_class"] = per_class
    if verbose:
        print(f"{'':10s}{'PQ':>10s}{'SQ':>10s}{'RQ':>10s}{'#cats':>8s}")
        for name in ("All", "Things", "Stuff"):
            r = results[name]
            print(f"{name:10s}{100 * r['pq']:10.3f}{100 * r['sq']:10.3f}"
                  f"{100 * r['rq']:10.3f}{r['n']:8d}")
    return results


def _offline_cli():
    """CLI: compute PQ on saved prediction dirs
    (reference: panoptic_evaluation.py:176-195)."""
    import argparse

    parser = argparse.ArgumentParser(description=offline_pq_compute.__doc__)
    parser.add_argument("--gt-json", required=True)
    parser.add_argument("--gt-dir", default=None)
    parser.add_argument("--pred-json", required=True)
    parser.add_argument("--pred-dir", default=None)
    args = parser.parse_args()
    offline_pq_compute(args.gt_json, args.pred_json, gt_folder=args.gt_dir,
                       pred_folder=args.pred_dir)


class PanopticEvaluator:
    """In-memory panoptic evaluator (agnostic or class-aware).

    process() takes the host-side panoptic id maps (uint32 [H, W], 0=void)
    plus segments_info; evaluate() matches against the GT json/PNGs and
    returns {"panoptic_seg": {PQ, SQ, RQ, ...}}.
    """

    def __init__(self, meta: Dict, class_agnostic: bool = True):
        self.meta = meta
        self.class_agnostic = class_agnostic
        self.panoptic_root = meta["panoptic_root"]
        json_path = meta["panoptic_json"]
        self.panoptic_json = (
            make_agnostic_gt_json(json_path) if class_agnostic else json_path
        )
        with open(self.panoptic_json, "r") as f:
            gt_data = json.load(f)
        self.gt_annotations = {a["image_id"]: a for a in gt_data["annotations"]}
        self.categories = {c["id"]: c for c in gt_data["categories"]}
        if not class_agnostic:
            self._thing_c2d = {
                v: k for k, v in meta["thing_dataset_id_to_contiguous_id"].items()
            }
            self._stuff_c2d = {
                v: k for k, v in meta["stuff_dataset_id_to_contiguous_id"].items()
            }
        self.reset()

    def reset(self):
        self._predictions = []

    def _convert_category_id(self, seg: dict) -> dict:
        isthing = seg.pop("isthing", None)
        if isthing is None:
            return seg
        table = self._thing_c2d if isthing else self._stuff_c2d
        seg["category_id"] = table[seg["category_id"]]
        return seg

    def process(self, file_names, image_ids, outputs):
        """outputs: list of {'panoptic_seg': (id_map, segments_info)}."""
        for file_name, image_id, output in zip(file_names, image_ids, outputs):
            pan, segments_info = output["panoptic_seg"]
            pan = np.asarray(pan, dtype=np.uint32)
            segments_info = [dict(s) for s in segments_info]
            if self.class_agnostic:
                for s in segments_info:
                    s["category_id"] = 1
                    s.pop("isthing", None)
            else:
                segments_info = [self._convert_category_id(s) for s in segments_info]
            self._predictions.append(
                {"image_id": image_id, "pan": pan, "segments_info": segments_info}
            )

    def _load_gt(self, image_id: int) -> Tuple[np.ndarray, List[dict]]:
        from PIL import Image

        ann = self.gt_annotations[image_id]
        png = os.path.join(self.panoptic_root, ann["file_name"])
        pan_gt = rgb2id(np.array(Image.open(png).convert("RGB")))
        return pan_gt, ann["segments_info"]

    def evaluate(self, verbose: bool = True) -> Optional[Dict]:
        import jax

        preds = self._predictions
        if jax.process_count() > 1:  # exercised by tests/test_multihost.py
            from jax.experimental import multihost_utils
            import pickle

            blob = np.frombuffer(pickle.dumps(preds), dtype=np.uint8)
            # allgather requires equal shapes: gather lengths, pad to max
            lengths = multihost_utils.process_allgather(
                np.asarray([blob.size], dtype=np.int64)
            ).reshape(-1)
            max_len = int(lengths.max())
            padded = np.zeros(max_len, dtype=np.uint8)
            padded[: blob.size] = blob
            gathered = multihost_utils.process_allgather(padded)
            preds = []
            for row, n in zip(np.asarray(gathered).reshape(-1, max_len), lengths):
                preds.extend(pickle.loads(row[: int(n)].tobytes()))

        stat = PQStat()
        n_preds = 0
        seen_ids = set()
        for p in preds:
            if p["image_id"] not in self.gt_annotations:
                continue
            # the loader repeat-pads partial batches (and pads the index
            # space across processes) to keep device shapes static; keep
            # only the FIRST prediction per image so padded duplicates
            # don't get double-counted (matters once val-set size stops
            # dividing batch_size, e.g. the 4-image holdout split)
            if p["image_id"] in seen_ids:
                continue
            seen_ids.add(p["image_id"])
            gt_pan, gt_segs = self._load_gt(p["image_id"])
            stat += pq_compute_single(
                gt_pan, gt_segs, p["pan"], p["segments_info"], self.categories
            )
            n_preds += 1

        results = {}
        all_res, per_class = stat.pq_average(self.categories, isthing=None)
        things_res, _ = stat.pq_average(self.categories, isthing=True)
        # detection stats summed across ALL categories (class-agnostic runs
        # have only cat 1; the class-aware synthetic-category mode has
        # 10/20/30 — reading only cat 1 there printed ~0 and misled
        # precision/recall attribution, ADVICE r4 #1); used by the
        # calibration sweep to attribute threshold-induced PQ shifts to
        # precision vs recall
        tp = sum(s.tp for s in stat.pq_per_cat.values())
        fp = sum(s.fp for s in stat.pq_per_cat.values())
        fn = sum(s.fn for s in stat.pq_per_cat.values())
        res = {
            "PQ": 100 * all_res["pq"],
            "SQ": 100 * all_res["sq"],
            "RQ": 100 * all_res["rq"],
            "PQ_th": 100 * things_res["pq"],
            "SQ_th": 100 * things_res["sq"],
            "RQ_th": 100 * things_res["rq"],
            "precision": 100 * tp / (tp + fp + 1e-8),
            "recall": 100 * tp / (tp + fn + 1e-8),
        }
        stuff_res, _ = stat.pq_average(self.categories, isthing=False)
        if stuff_res["n"] > 0 and not self.class_agnostic:
            res["PQ_st"] = 100 * stuff_res["pq"]
            res["SQ_st"] = 100 * stuff_res["sq"]
            res["RQ_st"] = 100 * stuff_res["rq"]
        results["panoptic_seg"] = res

        if verbose:
            print(f"precision: {res['precision']:.2f}  "
                  f"recall: {res['recall']:.2f}")
            print(f"found {n_preds} predictions")
            print(
                f"PQ {res['PQ']:.3f}  SQ {res['SQ']:.3f}  RQ {res['RQ']:.3f}"
            )
        return results


if __name__ == "__main__":
    _offline_cli()
