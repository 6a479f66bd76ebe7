"""TrackMAP evaluator tests with synthetic ground truth and predictions."""
import numpy as np

from devis_tpu.evaluation import rle as rle_lib
from devis_tpu.evaluation.track_map import evaluate_vis, mask_track_iou


def _rect_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return rle_lib.encode(m)


def _make_gt(n_videos=2, n_frames=4, size=(64, 64)):
    h, w = size
    videos = [{"id": i + 1, "width": w, "height": h,
               "file_names": [f"v{i}/{t}.jpg" for t in range(n_frames)]}
              for i in range(n_videos)]
    annotations = []
    aid = 0
    for vid in range(1, n_videos + 1):
        for inst, cat in ((0, 1), (1, 2)):
            aid += 1
            segs, areas = [], []
            for t in range(n_frames):
                x0 = 5 + 3 * t + 20 * inst
                segs.append(_rect_mask(h, w, 10, 30, x0, x0 + 15))
                areas.append(20 * 15)
            annotations.append({"id": aid, "video_id": vid, "category_id": cat,
                                "segmentations": segs, "areas": areas,
                                "iscrowd": 0})
    categories = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    return {"videos": videos, "annotations": annotations,
            "categories": categories}


def _perfect_predictions(gt):
    preds = []
    for ann in gt["annotations"]:
        preds.append({"video_id": ann["video_id"], "score": 0.9,
                      "category_id": ann["category_id"],
                      "segmentations": list(ann["segmentations"])})
    return preds


class TestMaskTrackIoU:
    def test_identical(self):
        t = {0: _rect_mask(10, 10, 2, 8, 2, 8), 1: _rect_mask(10, 10, 3, 9, 3, 9)}
        assert mask_track_iou(t, t) == 1.0

    def test_disjoint_frames_halve_iou(self):
        a = {0: _rect_mask(10, 10, 0, 5, 0, 5)}
        b = {0: _rect_mask(10, 10, 0, 5, 0, 5), 1: _rect_mask(10, 10, 0, 5, 0, 5)}
        assert abs(mask_track_iou(a, b) - 0.5) < 1e-9


class TestEvaluateVIS:
    def test_perfect_predictions_ap100(self):
        gt = _make_gt()
        res = evaluate_vis(gt, _perfect_predictions(gt))
        assert abs(res["AP"] - 100.0) < 1e-6, res["AP"]
        assert abs(res["AR"] - 100.0) < 1e-6

    def test_no_predictions_ap0(self):
        gt = _make_gt()
        res = evaluate_vis(gt, [])
        assert res["AP"] == 0.0

    def test_wrong_class_ap_drops(self):
        gt = _make_gt()
        preds = _perfect_predictions(gt)
        for p in preds:
            p["category_id"] = 1   # half the predictions now mislabeled
        res = evaluate_vis(gt, preds)
        # TrackEval semantics: class 2 has gt but zero detections -> AP_-1,
        # excluded from the class average; class 1 is polluted by the extra
        # mislabeled tracks, so the average drops below 100.
        assert res["AP"] < 100.0
        assert 2 not in res["per_class"] or res["per_class"][2]["AP_all"][0] == -1

    def test_partial_overlap_midrange_ap(self):
        gt = _make_gt(n_videos=1)
        preds = []
        h, w = 64, 64
        for ann in gt["annotations"]:
            segs = []
            for t, s in enumerate(ann["segmentations"]):
                m = rle_lib.decode(s).astype(bool)
                shifted = np.zeros_like(m)
                shifted[:, 5:] = m[:, :-5]     # shift right: IoU ~ 0.5
                segs.append(rle_lib.encode(shifted))
            preds.append({"video_id": ann["video_id"], "score": 0.9,
                          "category_id": ann["category_id"],
                          "segmentations": segs})
        res = evaluate_vis(gt, preds)
        assert 0.0 < res["AP"] < 100.0

    def test_crowd_gt_ignored(self):
        gt = _make_gt(n_videos=1)
        for ann in gt["annotations"]:
            ann["iscrowd"] = 1
        res = evaluate_vis(gt, _perfect_predictions(gt))
        # all gt ignored → no evaluable gt → AP stays 0/-1-ish, not crashing
        assert res["AP"] <= 0.0 or res["AP"] == 0.0

    def test_score_ranking_matters(self):
        gt = _make_gt(n_videos=1)
        preds = _perfect_predictions(gt)
        # add a high-scoring false positive per class
        h, w = 64, 64
        for cat in (1, 2):
            preds.append({"video_id": 1, "score": 0.95, "category_id": cat,
                          "segmentations": [_rect_mask(h, w, 50, 60, 50, 60)
                                            for _ in range(4)]})
        res = evaluate_vis(gt, preds)
        assert res["AP"] < 100.0
        # lower-scoring FP hurts less
        for p in preds[-2:]:
            p["score"] = 0.01
        res2 = evaluate_vis(gt, preds)
        assert res2["AP"] > res["AP"]
