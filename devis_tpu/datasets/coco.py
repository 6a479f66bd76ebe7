"""COCO instance-segmentation dataset (no pycocotools dependency).

Reimplements the reference's COCO pipeline (`src/datasets/coco.py`): JSON
parsing, polygon→mask conversion (cv2), no-object image filtering, label −1
shift (reference coco.py:105), multi-scale train transforms and fixed val
resize. Samples come out as numpy dicts ready for the static-shape collate
(see `devis_tpu.datasets.collate_images`).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..evaluation import rle as rle_lib
from .transforms import ClipTransform, ValTransform, normalize_sample, resize_sample, \
    get_size_with_aspect_ratio, hflip_sample, crop_sample


def polygons_to_mask(segmentation, h: int, w: int) -> np.ndarray:
    """COCO segmentation (polygons or RLE) → binary mask (H, W) uint8."""
    if isinstance(segmentation, dict):
        if isinstance(segmentation["counts"], list):
            rle = {"size": segmentation["size"],
                   "counts": rle_lib._counts_to_string(segmentation["counts"])}
        else:
            rle = segmentation
        return rle_lib.decode(rle)
    mask = np.zeros((h, w), np.uint8)
    for poly in segmentation:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


class CocoDetection:
    """Image dataset; drops images without annotations
    (reference coco.py:17-52)."""

    def __init__(self, img_folder: str, ann_file: str, train: bool,
                 scales=None, max_size: int = 1333, min_size_test: int = 800,
                 max_size_test: int = 1333, seed: Optional[int] = None):
        with open(ann_file) as f:
            self.coco = json.load(f)
        self.img_folder = img_folder
        self.train = train
        self.imgs = {im["id"]: im for im in self.coco["images"]}
        self.anns_by_img: Dict[int, List] = {}
        for ann in self.coco["annotations"]:
            self.anns_by_img.setdefault(ann["image_id"], []).append(ann)
        self.ids = [i for i in sorted(self.imgs) if self.anns_by_img.get(i)]
        scales = scales or [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
        if train:
            self.transform = ClipTransform(
                scales=scales, max_size=max_size,
                scales_before_crop=[400, 500, 600], crop_size=(384, 600),
                create_bbx_from_mask=False, seed=seed)
        else:
            self.min_size_test, self.max_size_test = min_size_test, max_size_test

    def __len__(self):
        return len(self.ids)

    def eval_hw(self, idx: int) -> Tuple[int, int]:
        """Post-resize (h, w) of val image `idx` WITHOUT decoding it (from the
        annotation metadata) — lets the eval loop group images into canvas
        buckets for batched forwards."""
        assert not self.train
        info = self.imgs[self.ids[idx]]
        return get_size_with_aspect_ratio((info["height"], info["width"]),
                                          self.min_size_test,
                                          self.max_size_test)

    def gt_dict(self) -> Dict:
        """The full COCO annotation dict (for the evaluator)."""
        return self.coco

    def _load_image(self, info) -> np.ndarray:
        path = os.path.join(self.img_folder, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)

    def get_sample(self, idx: int) -> Dict:
        """Raw sample: image + instance targets at original resolution."""
        img_id = self.ids[idx]
        info = self.imgs[img_id]
        image = self._load_image(info)
        h, w = image.shape[:2]
        boxes, labels, masks, iscrowd, areas = [], [], [], [], []
        for ann in self.anns_by_img[img_id]:
            if ann.get("iscrowd", 0):
                continue
            x, y, bw, bh = ann["bbox"]
            x0, y0 = max(x, 0), max(y, 0)
            x1, y1 = min(x + bw, w), min(y + bh, h)
            if x1 <= x0 or y1 <= y0:
                continue
            boxes.append([x0, y0, x1, y1])
            labels.append(ann["category_id"] - 1)         # −1 shift (coco.py:105)
            masks.append(polygons_to_mask(ann.get("segmentation", []), h, w))
            areas.append(ann.get("area", (x1 - x0) * (y1 - y0)))
        return {"image": image,
                "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                "labels": np.asarray(labels, np.int32),
                "masks": (np.stack(masks) if masks
                          else np.zeros((0, h, w), np.uint8)),
                "valid": np.ones(len(boxes), bool),
                "image_id": img_id,
                "orig_size": (h, w)}

    def __getitem__(self, idx: int) -> Dict:
        sample = self.get_sample(idx)
        if self.train:
            out = self.transform([sample])[0]
        else:
            oh, ow = get_size_with_aspect_ratio(
                sample["image"].shape[:2], self.min_size_test, self.max_size_test)
            out = normalize_sample(resize_sample(sample, (oh, ow)))
            # eval keeps boxes absolute-xyxy? postprocessing rescales from
            # normalized output; targets here follow the train convention.
        out["image_id"] = sample["image_id"]
        out["orig_size"] = sample["orig_size"]
        return out


COCO_PATHS = {
    "train": ("COCO/train2017", "COCO/annotations/instances_train2017.json", 91),
    "val": ("COCO/val2017", "COCO/annotations/instances_val2017.json", 91),
}


def build_coco(image_set: str, cfg):
    split = cfg.DATASETS.TRAIN_DATASET if image_set == "TRAIN" else cfg.DATASETS.VAL_DATASET
    if split.startswith("synthetic"):
        from .synthetic import SyntheticCocoDataset
        return SyntheticCocoDataset(train=image_set == "TRAIN"), 91
    img_dir, ann, num_classes = COCO_PATHS[split]
    root = cfg.DATASETS.DATA_PATH
    sf = cfg.INPUT.SCALE_FACTOR_TRAIN
    scales = [int(sf * s) for s in
              [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]]
    ds = CocoDetection(os.path.join(root, img_dir), os.path.join(root, ann),
                       train=image_set == "TRAIN", scales=scales,
                       max_size=int(sf * 1333),
                       min_size_test=cfg.INPUT.MIN_SIZE_TEST,
                       max_size_test=cfg.INPUT.MAX_SIZE_TEST,
                       seed=cfg.SEED)
    return ds, num_classes
