"""Panoptic Quality evaluator golden-value tests."""
import numpy as np

from devis_tpu.datasets.coco_panoptic import png_to_segment_ids
from devis_tpu.evaluation.panoptic_eval import (PanopticEvaluator,
                                                pq_compute_single)


def _ids(h, w, rects):
    """rects: [(id, y0, y1, x0, x1)] painted in order over void (0)."""
    m = np.zeros((h, w), np.int64)
    for sid, y0, y1, x0, x1 in rects:
        m[y0:y1, x0:x1] = sid
    return m


def test_png_decoding():
    png = np.zeros((2, 2, 3), np.uint8)
    png[0, 0] = (7, 0, 0)
    png[0, 1] = (0, 1, 0)        # 256
    png[1, 1] = (1, 1, 1)        # 1 + 256 + 65536
    ids = png_to_segment_ids(png)
    assert ids[0, 0] == 7 and ids[0, 1] == 256 and ids[1, 1] == 65793


def test_perfect_prediction():
    gt = _ids(20, 20, [(1, 0, 10, 0, 10), (2, 10, 20, 10, 20)])
    segs = [{"id": 1, "category_id": 1}, {"id": 2, "category_id": 2}]
    ev = PanopticEvaluator([{"id": 1, "isthing": 1}, {"id": 2, "isthing": 0}])
    ev.update(gt, segs, gt, segs)
    s = ev.summarize()
    np.testing.assert_allclose(s["PQ"], 100.0)
    np.testing.assert_allclose(s["PQ_th"], 100.0)
    np.testing.assert_allclose(s["PQ_st"], 100.0)


def test_partial_overlap_counts_iou():
    gt = _ids(10, 10, [(1, 0, 10, 0, 10)])
    pred = _ids(10, 10, [(5, 0, 10, 0, 8)])    # IoU 0.8
    stats = pq_compute_single(gt, [{"id": 1, "category_id": 3}],
                              pred, [{"id": 5, "category_id": 3}])
    iou, tp, fp, fn = stats[3]
    assert tp == 1 and fp == 0 and fn == 0
    np.testing.assert_allclose(iou, 0.8)


def test_low_iou_is_fp_and_fn():
    gt = _ids(10, 10, [(1, 0, 10, 0, 10)])
    pred = _ids(10, 10, [(5, 0, 10, 0, 4)])    # IoU 0.4 ≤ 0.5
    stats = pq_compute_single(gt, [{"id": 1, "category_id": 3}],
                              pred, [{"id": 5, "category_id": 3}])
    iou, tp, fp, fn = stats[3]
    assert tp == 0 and fp == 1 and fn == 1


def test_crowd_gt_not_fn_and_shields_predictions():
    gt = _ids(10, 10, [(9, 0, 10, 0, 10)])
    pred = _ids(10, 10, [(5, 0, 10, 0, 10)])
    stats = pq_compute_single(
        gt, [{"id": 9, "category_id": 3, "iscrowd": 1}],
        pred, [{"id": 5, "category_id": 3}])
    iou, tp, fp, fn = stats.get(3, [0.0, 0, 0, 0])
    assert tp == 0 and fn == 0 and fp == 0    # crowd shields the prediction
