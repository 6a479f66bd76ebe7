"""COCO evaluator golden-value tests (hand-computed COCOeval outcomes)."""
import numpy as np

from devis_tpu.evaluation import rle as rle_lib
from devis_tpu.evaluation.coco_eval import (CocoEvaluator, box_iou_xywh,
                                            evaluate_coco)


def _gt(boxes, image_id=1, cat=1, crowd=None):
    anns = []
    for i, b in enumerate(boxes):
        anns.append({"id": i + 1, "image_id": image_id, "category_id": cat,
                     "bbox": list(b), "area": b[2] * b[3],
                     "iscrowd": int(crowd[i]) if crowd else 0})
    return {"images": [{"id": image_id, "height": 100, "width": 100}],
            "annotations": anns, "categories": [{"id": cat, "name": "x"}]}


class TestBoxIoU:
    def test_basic_and_crowd(self):
        dt = np.array([[0, 0, 10, 10.0]])
        gt = np.array([[0, 0, 10, 10.0], [5, 5, 10, 10.0]])
        i = box_iou_xywh(dt, gt, [0, 0])
        np.testing.assert_allclose(i[0, 0], 1.0)
        np.testing.assert_allclose(i[0, 1], 25 / 175)
        ic = box_iou_xywh(dt, gt, [0, 1])
        np.testing.assert_allclose(ic[0, 1], 25 / 100)   # dt-area denominator


class TestEvaluateCoco:
    def test_perfect_detections(self):
        gt = _gt([[10, 10, 20, 20], [50, 50, 30, 30]])
        preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [10, 10, 20, 20]},
                 {"image_id": 1, "category_id": 1, "score": 0.8,
                  "bbox": [50, 50, 30, 30]}]
        s = evaluate_coco(gt, preds)
        for k in ("AP", "AP50", "AP75"):
            np.testing.assert_allclose(s[k], 100.0, rtol=1e-9)
        np.testing.assert_allclose(s["AR@100"], 100.0, rtol=1e-9)
        np.testing.assert_allclose(s["AR@1"], 50.0, rtol=1e-9)        # only one det allowed

    def test_high_scoring_false_positive(self):
        gt = _gt([[10, 10, 20, 20], [50, 50, 30, 30]])
        preds = [{"image_id": 1, "category_id": 1, "score": 0.95,
                  "bbox": [0, 80, 5, 5]},                      # FP, IoU 0
                 {"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [10, 10, 20, 20]},
                 {"image_id": 1, "category_id": 1, "score": 0.8,
                  "bbox": [50, 50, 30, 30]}]
        s = evaluate_coco(gt, preds)
        np.testing.assert_allclose(s["AP"], 100 * 2 / 3, rtol=1e-6)

    def test_localization_quality_thresholds(self):
        # IoU with gt = (20*10)/(400+200-200)=0.5 exactly → counts at 0.5 only
        gt = _gt([[10, 10, 20, 20]])
        preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [10, 10, 20, 10]}]
        s = evaluate_coco(gt, preds)
        np.testing.assert_allclose(s["AP50"], 100.0, rtol=1e-9)
        assert s["AP75"] == 0.0
        np.testing.assert_allclose(s["AP"], 10.0, rtol=1e-9)  # 1 of 10 thresholds

    def test_crowd_gt_ignored_not_penalized(self):
        gt = _gt([[10, 10, 20, 20], [0, 0, 100, 100]], crowd=[0, 1])
        preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [10, 10, 20, 20]},
                 # matches only the crowd region → ignored, not an FP
                 {"image_id": 1, "category_id": 1, "score": 0.85,
                  "bbox": [60, 60, 40, 40]}]
        s = evaluate_coco(gt, preds)
        np.testing.assert_allclose(s["AP"], 100.0, rtol=1e-9)

    def test_area_range_split(self):
        gt = _gt([[0, 0, 10, 10], [20, 20, 50, 50]])   # small (100) + medium (2500)
        preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [0, 0, 10, 10]},
                 {"image_id": 1, "category_id": 1, "score": 0.8,
                  "bbox": [20, 20, 50, 50]}]
        s = evaluate_coco(gt, preds)
        np.testing.assert_allclose(s["APs"], 100.0, rtol=1e-9)
        np.testing.assert_allclose(s["APm"], 100.0, rtol=1e-9)
        assert s["APl"] == -1.0          # no large gt → undefined

    def test_segm_path(self):
        m1 = np.zeros((100, 100), bool)
        m1[10:30, 10:30] = True
        m2 = np.zeros((100, 100), bool)
        m2[50:80, 50:80] = True
        gt = _gt([[10, 10, 20, 20], [50, 50, 30, 30]])
        for ann, m in zip(gt["annotations"], (m1, m2)):
            ann["segmentation"] = rle_lib.encode(m)
            ann["area"] = int(m.sum())
        preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "segmentation": rle_lib.encode(m1)},
                 {"image_id": 1, "category_id": 1, "score": 0.8,
                  "segmentation": rle_lib.encode(m2)}]
        s = evaluate_coco(gt, preds, "segm")
        np.testing.assert_allclose(s["AP"], 100.0, rtol=1e-9)


class TestCocoEvaluatorWrapper:
    def test_update_summarize(self):
        gt = _gt([[10, 10, 20, 20]])
        ev = CocoEvaluator(gt, iou_types=("bbox",))
        ev.update({1: {"scores": [0.9], "labels": [1],
                       "boxes": [[10, 10, 30, 30]]}})   # xyxy
        out = ev.summarize()
        np.testing.assert_allclose(out["bbox"]["AP"], 100.0, rtol=1e-9)
