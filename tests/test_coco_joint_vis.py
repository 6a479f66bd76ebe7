"""COCO→pseudo-video joint training tests (synthetic on-disk COCO)."""
import json
import os

import cv2
import numpy as np
import pytest

from devis_tpu.datasets.coco_joint_vis import (COCO_TO_YT19_CATEGORY_MAP,
                                               CocoJointVIS,
                                               ImageToSeqAugmenter)


@pytest.fixture
def tiny_coco(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    rs = np.random.RandomState(0)
    for i in range(3):
        h, w = 96, 128
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        for j in range(2):
            aid += 1
            x, y = 10 + 30 * j, 20 + 10 * j
            annotations.append({
                "id": aid, "image_id": i,
                "category_id": 1 if j == 0 else 18,     # person, dog (mapped)
                "bbox": [x, y, 25, 30], "area": 750, "iscrowd": 0,
                "segmentation": [[x, y, x + 25, y, x + 25, y + 30, x, y + 30]],
            })
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": str(c)} for c in (1, 18, 50)]}
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(ann))
    return str(img_dir), str(path)


class TestAugmenter:
    def test_warp_preserves_shapes_and_instances(self, rng):
        import random
        aug = ImageToSeqAugmenter(random.Random(0))
        img = rng.rand(64, 96, 3).astype(np.float32) * 255
        masks = np.zeros((2, 64, 96), np.uint8)
        masks[0, 10:30, 10:40] = 1
        masks[1, 40:60, 50:90] = 1
        img2, m2 = aug(img, masks)
        assert img2.shape == img.shape and m2.shape == masks.shape
        # warped masks keep most of their area (small warps)
        for i in range(2):
            assert m2[i].sum() > 0.3 * masks[i].sum()


class TestCocoJointVIS:
    def test_clip_layout(self, tiny_coco):
        img_dir, ann = tiny_coco
        ds = CocoJointVIS(img_dir, ann, num_frames=3,
                          category_map=COCO_TO_YT19_CATEGORY_MAP, seed=0)
        assert len(ds) == 3
        s = ds[0]
        T = 3
        assert s["images"].shape[0] == T
        N = len(s["labels"])
        assert N == 2
        assert s["boxes"].shape == (N, T, 4)
        assert s["masks"].shape[:2] == (N, T)
        assert s["valid"].shape == (N, T)
        assert s["exists"].all()
        # categories remapped: person(1)→1, dog(18)→8 (0-based: 0 and 7)
        assert set(int(v) for v in s["labels"]) == {0, 7}
        # boxes normalized cxcywh
        assert s["boxes"].min() >= 0.0 and s["boxes"].max() <= 1.0

    def test_unmapped_categories_dropped(self, tiny_coco, tmp_path):
        img_dir, ann = tiny_coco
        data = json.loads(open(ann).read())
        for a in data["annotations"]:
            a["category_id"] = 50                    # not in the map
        p2 = tmp_path / "ann2.json"
        p2.write_text(json.dumps(data))
        ds = CocoJointVIS(img_dir, str(p2), num_frames=2,
                          category_map=COCO_TO_YT19_CATEGORY_MAP, seed=0)
        assert len(ds) == 0
