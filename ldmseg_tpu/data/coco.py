"""COCO panoptic dataset (host-side numpy/PIL input pipeline).

Reference: ldmseg/data/coco.py. Semantics preserved:
  * panoptic PNG ids decoded R + 256 G + 256^2 B (:489-490),
  * train-time filtering of tiny instances (<10 px, :313-315,:495-500) and
    crowd segments (:509-511); images without annotations dropped (:281-292),
  * per-example random remap of instance ids into [1, 128) (:320-351),
  * seg encodings bits / color / random_color / none (:377-390,:439-462),
  * captions: none / coco captions / class-name lists / BLIP json with
    caption dropout (:411-423), CLIP tokenization to 77 tokens (:465-470),
  * per-sample inpainting mask (:472), contiguous-category metadata
    (:540-588).

Differences (TPU-first): category metadata comes from the panoptic json
(no hardcoded table); all RNG is an explicit per-worker np.random.Generator
(the reference uses global RNG state, SURVEY §5 race-detection note).
"""

from __future__ import annotations

import json
import os
import zlib
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .encodings import (
    color_map,
    encode_bitmap,
    encode_semseg_color,
    encode_semseg_random_color,
    remap_labels,
)
from .mask_generator import MaskingGenerator


def image_id_from_stem(stem: str) -> int:
    """Stable integer id for an image filename stem.

    COCO's zero-padded numeric names keep their numeric id (so meta ids
    match the panoptic GT json, reference coco.py:532); non-numeric stems
    hash via crc32 — the same derivation everywhere (sample meta, GT-json
    synthesis) so evaluator id matching works for non-COCO names too."""
    return int(stem) if stem.isdigit() else zlib.crc32(stem.encode())


def coco_root(prefix: str) -> str:
    return os.path.join(prefix, "coco")


class COCOPanoptic:
    def __init__(
        self,
        prefix: str,
        split: str = "val",
        tokenizer: Optional[Any] = None,
        transform: Optional[Callable] = None,
        remap_labels: bool = False,
        caption_dropout: float = 0.0,
        overfit: bool = False,
        encoding_mode: str = "bits",
        caption_type: str = "none",
        inpaint_mask_size: Optional[Tuple[int, int]] = None,
        num_classes: int = 128,
        fill_value: float = 0.5,
        ignore_label: int = 0,
        inpainting_strength: float = 0.0,
        deterministic_remap: bool = False,
        seed: int = 0,
        decode_cache: int = 0,
    ):
        assert split in ("train", "val", "test")
        assert caption_type in ("none", "caption", "class_label", "blip")
        assert encoding_mode in ("color", "random_color", "bits", "none")

        self.root = coco_root(prefix)
        self.split = split
        self.training = split == "train"
        self.tokenizer = tokenizer
        self.transform = transform
        self.remap = remap_labels
        self.deterministic_remap = deterministic_remap
        self.caption_dropout = caption_dropout
        self.encoding_mode = encoding_mode
        self.caption_type = caption_type
        self.num_classes = num_classes
        self.fill_value = fill_value
        self.ignore_label = ignore_label
        self.inpainting_strength = inpainting_strength
        self.pixel_threshold = 10 if self.training else 0
        self.rng = np.random.default_rng(seed)
        self.cmap = color_map()
        # deterministic decode+filter results cached per index (0 = off);
        # the per-read randomness (remap/crop/flip) is all downstream
        self.decode_cache = int(decode_cache)
        self._sem_cache: Dict[int, Any] = {}
        self._img_cache: Dict[int, Any] = {}
        self.mask_generator = MaskingGenerator(
            input_size=inpaint_mask_size or (64, 64), mode="random_local",
            rng=self.rng,
        )

        file_dir = {"train": "train2017", "val": "val2017"}[split]
        image_dir = os.path.join(self.root, file_dir)
        semseg_dir = os.path.join(self.root, f"annotations/panoptic_{file_dir}")
        self.panoptic_json = os.path.join(
            self.root, f"annotations/panoptic_{file_dir}.json"
        )
        captions_json = os.path.join(
            self.root, f"annotations/captions_{file_dir}.json"
        )

        with open(self.panoptic_json, "r") as f:
            panoptic_anns = json.load(f)
        self.annotations_dict = {
            a["file_name"]: a for a in panoptic_anns["annotations"]
        }
        self.categories = panoptic_anns["categories"]
        self.cat_info = {
            c["id"]: {"name": c["name"], "isthing": c["isthing"]}
            for c in self.categories
        }

        self.captions_dict = defaultdict(list)
        if caption_type in ("caption",) and os.path.isfile(captions_json):
            with open(captions_json, "r") as f:
                captions_anns = json.load(f)
            for ann in captions_anns["annotations"]:
                self.captions_dict[ann["image_id"]].append(ann["caption"])

        self.blip_captions = None
        blip_path = os.path.join(
            os.path.dirname(__file__), "blip_captions", f"captions_{file_dir}.json"
        )
        if caption_type == "blip" and os.path.isfile(blip_path):
            with open(blip_path, "r") as f:
                self.blip_captions = json.load(f)

        lines = sorted(
            l.split(".")[0] for l in os.listdir(image_dir)
        )
        self.images, self.semsegs = [], []
        dropped = 0
        for line in lines:
            img = os.path.join(image_dir, line + ".jpg")
            seg = os.path.join(semseg_dir, line + ".png")
            info = self.annotations_dict.get(line + ".png", {}).get(
                "segments_info", []
            )
            if len(info) > 0 and not all(s["iscrowd"] == 1 for s in info):
                self.images.append(img)
                self.semsegs.append(seg)
            else:
                dropped += 1
        if overfit:
            self.images = self.images[:1000]
            self.semsegs = self.semsegs[:1000]
        print(
            f"COCO {split}: {len(self.images)} images "
            f"({dropped} without usable annotations dropped)"
        )

        self.meta_data = self.get_metadata()

    # -- metadata ---------------------------------------------------------
    def get_metadata(self) -> Dict:
        """Contiguous-id maps & eval paths (reference coco.py:540-588)."""
        meta: Dict[str, Any] = {}
        meta["thing_classes"] = [c["name"] for c in self.categories if c["isthing"]]
        meta["thing_colors"] = [
            c.get("color", [128, 128, 128]) for c in self.categories if c["isthing"]
        ]
        meta["stuff_classes"] = [c["name"] for c in self.categories]
        meta["stuff_colors"] = [
            c.get("color", [128, 128, 128]) for c in self.categories
        ]
        thing_map, stuff_map, cat2name = {}, {}, {}
        for i, c in enumerate(self.categories):
            if c["isthing"]:
                thing_map[c["id"]] = i
            stuff_map[c["id"]] = i
            cat2name[c["id"]] = c["name"]
        meta["thing_dataset_id_to_contiguous_id"] = thing_map
        meta["stuff_dataset_id_to_contiguous_id"] = stuff_map
        meta["cat2name"] = cat2name
        meta["panoptic_json"] = self.panoptic_json
        meta["panoptic_root"] = os.path.join(
            self.root, f"annotations/panoptic_{'train' if self.training else 'val'}2017"
        )
        return meta

    def get_class_names(self) -> List[str]:
        return [c["name"] for c in self.categories]

    # -- loading ----------------------------------------------------------
    def _load_img(self, index: int) -> Image.Image:
        if index in self._img_cache:
            return self._img_cache[index]
        img = Image.open(self.images[index]).convert("RGB")
        if self.decode_cache > 0:
            if len(self._img_cache) >= self.decode_cache:
                self._img_cache.pop(next(iter(self._img_cache)))
            self._img_cache[index] = img
        return img

    def _load_semseg(self, index: int):
        """PNG -> id map with small/crowd filtering + contiguous category ids
        (reference coco.py:488-538).

        Decode + filtering are deterministic per index, so the result is
        cached (``decode_cache`` items; the random remap/crop/flip happen
        downstream per read). The cached id map is returned read-only and is
        never mutated by callers (remap/astype always copy).
        """
        if index in self._sem_cache:
            return self._sem_cache[index]
        arr = np.array(Image.open(self.semsegs[index]).convert("RGB"))
        semseg = (
            arr[:, :, 0].astype(np.int64)
            + 256 * arr[:, :, 1].astype(np.int64)
            + (256 ** 2) * arr[:, :, 2].astype(np.int64)
        )

        small = set()
        if self.training and self.pixel_threshold > 0:
            ids, counts = np.unique(semseg, return_counts=True)
            small_ids = ids[counts < self.pixel_threshold]
            if small_ids.size:
                # single vectorized membership pass, not one full-image
                # masked write per small id
                semseg[np.isin(semseg, small_ids)] = self.ignore_label
                small = {int(i) for i in small_ids}

        key = os.path.basename(self.semsegs[index])
        keep = {}
        crowd_ids = []
        for seg in self.annotations_dict[key]["segments_info"]:
            if seg["id"] in small:
                continue
            if seg["iscrowd"] and self.training:
                crowd_ids.append(seg["id"])
                continue
            cat_id = seg["category_id"]
            meta = self.meta_data
            contiguous = (
                meta["thing_dataset_id_to_contiguous_id"].get(cat_id)
                if cat_id in meta["thing_dataset_id_to_contiguous_id"]
                else meta["stuff_dataset_id_to_contiguous_id"][cat_id]
            )
            keep[seg["id"]] = {
                "category_id": contiguous,
                "iscrowd": seg["iscrowd"],
                "category_name": self.cat_info[cat_id]["name"],
                "isthing": self.cat_info[cat_id]["isthing"],
            }

        if crowd_ids:
            semseg[np.isin(semseg, crowd_ids)] = self.ignore_label

        image_id = key.split(".")[0]
        captions = (
            self.captions_dict.get(int(image_id), [""])
            if image_id.isdigit() else [""]
        )
        result = (semseg, keep, captions, image_id + ".jpg")
        if self.decode_cache > 0:
            semseg.flags.writeable = False
            if len(self._sem_cache) >= self.decode_cache:
                self._sem_cache.pop(next(iter(self._sem_cache)))
            self._sem_cache[index] = result
        return result

    def validate_annotations(self, verbose: bool = False) -> int:
        """Assert every image's decoded id map matches its annotation dict
        (reference _validate_annotations_simple, coco.py:593-602): after
        small/crowd filtering, the PNG's unique non-ignore ids and the kept
        segments_info keys must be identical sets. Returns the number of
        images checked."""
        for i in range(len(self)):
            semseg, keep, _, _ = self._load_semseg(i)
            ids = np.unique(semseg)
            ids = ids[ids != self.ignore_label]
            assert len(keep) == len(ids) and set(int(v) for v in ids) == set(
                keep.keys()
            ), f"annotation mismatch for {self.semsegs[i]}: {sorted(keep)} vs {ids}"
            if verbose:
                print(f"[{i + 1}/{len(self)}] {os.path.basename(self.semsegs[i])}: "
                      f"{len(ids)} segments OK")
        return len(self)

    # -- item -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        sample: Dict[str, Any] = {}

        semseg, segments_info, captions, key_id = self._load_semseg(index)
        # An image can lose ALL its segments at load time (tiny-instance +
        # train-time crowd filtering) even though init-time filtering kept
        # it; a hard assert here would kill a long run mid-epoch. Fall
        # forward deterministically to the next index instead — but only
        # when training: substituting a neighbor into the val split would
        # silently bias PQ (one image double-counted, another never seen),
        # so eval fails loudly like the reference.
        if not segments_info and not self.training:
            raise RuntimeError(
                f"val image {self.semsegs[index]} has no segments"
            )
        attempts = 0
        while not segments_info and attempts < len(self):
            index = (index + 1) % len(self)
            attempts += 1
            semseg, segments_info, captions, key_id = self._load_semseg(index)
        if not segments_info:
            raise RuntimeError("no image with surviving segments in dataset")

        img = self._load_img(index)
        sample["image"] = img

        if self.caption_type == "caption":
            sample["text"] = (
                captions[int(self.rng.integers(len(captions)))]
                if self.training else captions[0]
            )
        elif self.caption_type == "class_label":
            sample["text"] = ", ".join(
                v["category_name"] for v in segments_info.values()
            )
        elif self.caption_type == "blip" and self.blip_captions is not None:
            sample["text"] = self.blip_captions[key_id]
        else:
            sample["text"] = ""
        if self.training and self.caption_dropout > self.rng.random():
            sample["text"] = ""

        if self.remap:
            # deterministic_remap: per-image FIXED permutation (seeded by the
            # image id) so targets are stable across epochs — overfit/debug
            # aid; the reference task resamples ids per example (coco.py:320-351)
            # seed from a stable hash of the filename stem — int(stem)
            # would raise for non-numeric (non-COCO) image names
            remap_rng = (
                np.random.default_rng(
                    zlib.crc32(key_id.split(".")[0].encode()))
                if self.deterministic_remap else self.rng
            )
            semseg, mapping = remap_labels(
                semseg, num_classes=self.num_classes,
                ignore_label=self.ignore_label, rng=remap_rng,
            )
            segments_info = {mapping[k]: v for k, v in segments_info.items()}

        assert semseg.max() < 256
        sample["semseg"] = Image.fromarray(semseg.astype(np.uint8))
        sample["mask"] = Image.fromarray(np.ones_like(semseg, dtype=np.uint8))

        if self.encoding_mode == "random_color":
            sample["image_semseg"] = Image.fromarray(
                encode_semseg_random_color(
                    semseg, ignore_label=self.ignore_label, rng=self.rng
                )
            )
        elif self.encoding_mode == "color":
            sample["image_semseg"] = Image.fromarray(
                encode_semseg_color(semseg, self.cmap, self.ignore_label)
            )

        sample["meta"] = {
            "im_size": (img.size[1], img.size[0]),
            "image_file": self.images[index],
            "image_id": image_id_from_stem(
                os.path.basename(self.images[index]).split(".")[0]),
            "segments_info": segments_info,
        }

        if self.transform is not None:
            sample = self.transform(sample)

        # bit/none encodings apply AFTER geometric transforms (coco.py:459-462)
        if self.encoding_mode == "bits":
            bits, _ = encode_bitmap(
                sample["semseg"], n=7, fill_value=self.fill_value,
                ignore_label=self.ignore_label,
            )
            sample["image_semseg"] = bits
        elif self.encoding_mode == "none":
            sample["image_semseg"] = np.repeat(
                sample["semseg"][..., None].astype(np.float32) / self.num_classes,
                3, axis=-1,
            )

        if self.tokenizer is not None:
            sample["tokens"] = np.asarray(
                self.tokenizer(
                    sample["text"], padding="max_length", max_length=77,
                    truncation=True, return_tensors="np",
                ).input_ids[0]
            )

        sample["inpainting_mask"] = self.mask_generator(
            t=self.inpainting_strength
        )
        return sample


#: synthetic-category area-bucket thresholds (fraction of image area).
#: Shared by the GT-json writer and the prediction side of class-aware
#: eval so both assign categories by the same deterministic rule — a
#: predicted segment lands in the right bucket iff its mask area is
#: approximately right, making class-aware PQ a meaningful (synthetic)
#: signal on the single-category bundled examples.
_AREA_BUCKET_THRESHOLDS = {2: (0.03,), 3: (0.01, 0.06)}


def area_bucket_category(area: int, image_area: int, num_buckets: int) -> int:
    """Deterministic synthetic dataset category id (10, 20, 30, ...) from a
    segment's relative area. Used to exercise class-aware PQ end-to-end
    (reference panoptic_evaluation.py:60-73) on the bundled examples,
    which have only one real category."""
    frac = area / max(image_area, 1)
    bucket = 0
    for th in _AREA_BUCKET_THRESHOLDS[num_buckets]:
        if frac >= th:
            bucket += 1
    return 10 * (bucket + 1)


def synthetic_category_table(num_buckets: int) -> List[dict]:
    """Categories list for the synthetic area-bucket classes. Dataset ids
    are deliberately non-contiguous (10/20/30) so the evaluator's
    contiguous<->dataset id conversion (panoptic_evaluation.py:60-73) is
    actually exercised."""
    return [
        {"id": 10 * (k + 1), "name": f"area_bucket_{k}",
         "supercategory": "object", "isthing": 1}
        for k in range(num_buckets)
    ]


class COCOExamples(COCOPanoptic):
    """The 16 bundled example images (reference data/examples/coco/) —
    no annotation json, so segments_info is derived from the PNG ids and
    a synthetic class-agnostic GT json is written for PQ eval.

    ``holdout=N`` reserves the LAST N images (sorted by name) as a
    held-out val split: split='train' serves the first ``16-N``,
    split='val' the last N. The reference always evaluates on held-out
    val2017 (reference coco.py:106, README.md:136); with only the 16
    bundled images available, this is the honest equivalent — without it,
    train set == val set and every PQ number is training-set PQ.

    ``synthetic_categories=K`` (K in {2, 3}) assigns every GT segment a
    fake category by relative-area bucket (see area_bucket_category) so
    the class-aware evaluator has a multi-category task to run on."""

    def __init__(self, examples_root: str, transform=None, split: str = "val",
                 holdout: int = 0, synthetic_categories: int = 0, **kw):
        # bypass COCOPanoptic.__init__: build minimal state directly
        self.root = examples_root
        self.split = split
        self.training = split == "train"
        self.tokenizer = kw.get("tokenizer")
        self.transform = transform
        self.remap = kw.get("remap_labels", True)
        self.deterministic_remap = kw.get("deterministic_remap", False)
        self.caption_dropout = kw.get("caption_dropout", 0.0)
        self.encoding_mode = kw.get("encoding_mode", "bits")
        self.caption_type = "none"
        self.num_classes = kw.get("num_classes", 128)
        self.fill_value = kw.get("fill_value", 0.5)
        self.ignore_label = kw.get("ignore_label", 0)
        self.inpainting_strength = kw.get("inpainting_strength", 0.0)
        self.pixel_threshold = 10 if self.training else 0
        self.rng = np.random.default_rng(kw.get("seed", 0))
        self.cmap = color_map()
        # 16 bundled images: cache all decodes by default
        self.decode_cache = int(kw.get("decode_cache", 32))
        self._sem_cache = {}
        self._img_cache = {}
        self.mask_generator = MaskingGenerator(
            input_size=kw.get("inpaint_mask_size") or (64, 64),
            mode="random_local", rng=self.rng,
        )
        img_dir = os.path.join(examples_root, "rgb_images")
        seg_dir = os.path.join(examples_root, "panoptic_images")
        names = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir))
        self.holdout = int(holdout)
        if self.holdout:
            assert 0 < self.holdout < len(names), (
                f"holdout={holdout} must leave a non-empty train split "
                f"of the {len(names)} examples"
            )
            names = (names[:-self.holdout] if self.training
                     else names[-self.holdout:])
        self.images = [os.path.join(img_dir, n + ".jpg") for n in names]
        self.semsegs = [os.path.join(seg_dir, n + ".png") for n in names]
        self.captions_dict = defaultdict(lambda: [""])
        self.synthetic_categories = int(synthetic_categories)
        if self.synthetic_categories:
            assert self.synthetic_categories in _AREA_BUCKET_THRESHOLDS, (
                f"synthetic_categories must be one of "
                f"{sorted(_AREA_BUCKET_THRESHOLDS)}"
            )
            self.categories = synthetic_category_table(self.synthetic_categories)
        else:
            self.categories = [
                {"id": 1, "name": "object", "supercategory": "object",
                 "isthing": 1}
            ]
        self.cat_info = {
            c["id"]: {"name": c["name"], "isthing": c["isthing"]}
            for c in self.categories
        }
        self.panoptic_json = self._write_gt_json(seg_dir, names)
        self.annotations_dict = self._build_annotations(names)
        self.meta_data = self.get_metadata()
        self.meta_data["panoptic_root"] = seg_dir
        self.meta_data["panoptic_json"] = self.panoptic_json

    def _build_annotations(self, names):
        anns = {}
        with open(self.panoptic_json) as f:
            data = json.load(f)
        for a in data["annotations"]:
            anns[a["file_name"]] = a
        return anns

    def _write_gt_json(self, seg_dir: str, names) -> str:
        # the filename encodes the variant so holdout/synthetic-category
        # datasets never read a stale full-split (or differently-labeled)
        # cache written by another configuration
        suffix = ""
        if self.holdout:
            suffix += f"_{self.split}{len(names)}"
        if self.synthetic_categories:
            suffix += f"_cat{self.synthetic_categories}"
        out_path = os.path.join(seg_dir, f"panoptic_examples{suffix}.json")
        if os.path.exists(out_path):
            return out_path
        annotations = []
        for n in names:
            arr = np.array(Image.open(os.path.join(seg_dir, n + ".png")).convert("RGB"))
            ids = (
                arr[:, :, 0].astype(np.int64)
                + 256 * arr[:, :, 1].astype(np.int64)
                + 256 ** 2 * arr[:, :, 2].astype(np.int64)
            )
            image_area = int(ids.size)
            segments = [
                {"id": int(i),
                 "category_id": (
                     area_bucket_category(int((ids == i).sum()), image_area,
                                          self.synthetic_categories)
                     if self.synthetic_categories else 1
                 ),
                 "iscrowd": 0,
                 "area": int((ids == i).sum())}
                for i in np.unique(ids) if i != 0
            ]
            annotations.append(
                {"image_id": image_id_from_stem(n), "file_name": n + ".png",
                 "segments_info": segments}
            )
        data = {
            "annotations": annotations,
            "categories": self.categories,
        }
        with open(out_path, "w") as f:
            json.dump(data, f)
        return out_path


def get_dataset(
    db_name: str,
    data_dir: str,
    split,
    **kwargs,
):
    """Dataset factory (reference dataset_base.py:74-141); list splits concat.

    db_name 'examples' loads the 16 bundled example images from
    ``data_dir`` (a copy of the reference data/examples/coco directory) —
    the fast end-to-end smoke-train path (BASELINE config 1).
    """
    if db_name == "examples":
        kwargs.pop("caption_dropout", None)
        kwargs.pop("caption_type", None)
        return COCOExamples(examples_root=data_dir,
                            split="train" if split == "train" else "val",
                            **kwargs)
    # examples-only knobs (real COCO has a real val split and real classes)
    kwargs.pop("holdout", None)
    kwargs.pop("synthetic_categories", None)
    if db_name != "coco":
        raise NotImplementedError(f"dataset '{db_name}'")
    if isinstance(split, (list, tuple)):
        return ConcatDataset([
            COCOPanoptic(prefix=data_dir, split=s, **kwargs) for s in split
        ])
    return COCOPanoptic(prefix=data_dir, split=split, **kwargs)


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([len(d) for d in datasets])
        # eval metadata comes from the first dataset
        self.meta_data = datasets[0].meta_data
        self.ignore_label = datasets[0].ignore_label

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index):
        ds = int(np.searchsorted(self._offsets, index, side="right"))
        prev = 0 if ds == 0 else int(self._offsets[ds - 1])
        return self.datasets[ds][index - prev]

    def get_class_names(self):
        return self.datasets[0].get_class_names()
