"""COCO evaluator golden-value tests (hand-computed COCOeval outcomes)."""
import numpy as np
import pytest

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


class TestEvaluateCocoLoop:
    """End-to-end evaluate_coco loop: val-loss logging (reference
    engine.py:98-150) and the cross-rank prediction merge
    (reference coco_eval.py:172-208)."""

    def _setup(self):
        import jax
        from devis_tpu.config import get_cfg_defaults
        from devis_tpu.datasets.synthetic import SyntheticCocoDataset
        from devis_tpu.models import build_model

        cfg = get_cfg_defaults()
        cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
        cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 1
        cfg.MODEL.LOSS.MASK_AUX_LOSS = []
        cfg.MODEL.NUM_QUERIES = 8
        cfg.MODEL.MASK_ON = True
        cfg.TEST.NUM_OUT = 4
        cfg.INPUT.MIN_SIZE_TEST = 64
        cfg.INPUT.MAX_SIZE_TEST = 96
        cfg.freeze()
        ds = SyntheticCocoDataset(train=False, n_images=3, size=(64, 96))
        model = build_model(num_classes=91, cfg=cfg)
        import jax.numpy as jnp
        imgs = jnp.zeros((1, 64, 128, 3), jnp.float32)
        mask = jnp.zeros((1, 64, 128), bool)
        variables = model.init(jax.random.PRNGKey(0), imgs, mask, train=False)
        return cfg, ds, model, variables

    @pytest.mark.slow
    def test_val_losses_logged(self):
        import numpy as np
        from devis_tpu.inference import evaluate_coco as eval_loop

        cfg, ds, model, variables = self._setup()
        summary = eval_loop(model, variables, ds, cfg, verbose=False,
                            log_losses=True)
        assert "losses" in summary
        for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_mask",
                  "loss_dice"):
            assert k in summary["losses"], k
            assert np.isfinite(summary["losses"][k])
        assert "bbox" in summary and "AP" in summary["bbox"]

    @pytest.mark.slow
    def test_two_rank_shard_and_merge(self, monkeypatch):
        """Simulated 2-process run: each rank evaluates its interleaved
        shard; gathered predictions are de-duplicated before summarize."""
        import jax
        import devis_tpu.parallel.multihost as mh
        from devis_tpu.inference import evaluate_coco as eval_loop

        cfg, ds, model, variables = self._setup()

        rank_preds = {}
        rank_holder = {"r": 0}
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: rank_holder["r"])

        def fake_gather(obj):
            rank_preds[rank_holder["r"]] = obj
            # both ranks' contributions once both have run
            return [rank_preds.get(0, obj), rank_preds.get(1, obj)]

        monkeypatch.setattr(mh, "all_gather_objects", fake_gather)

        rank_holder["r"] = 0
        s0 = eval_loop(model, variables, ds, cfg, verbose=False)
        rank_holder["r"] = 1
        s1 = eval_loop(model, variables, ds, cfg, verbose=False)
        # after both ranks ran, the merged prediction set covers all 3 images
        ids = {p["image_id"] for preds in rank_preds.values() for p in preds}
        assert ids == {0, 1, 2}
        # rank shards are interleaved + padded: rank0 gets {0,2}, rank1 {1,0}
        ids0 = {p["image_id"] for p in rank_preds[0]}
        ids1 = {p["image_id"] for p in rank_preds[1]}
        assert ids0 & ids1, "padded shard must overlap for dedup coverage"
        assert "AP" in s1["bbox"]

    @pytest.mark.slow
    def test_bucket_batched_matches_serial(self):
        """TEST.EVAL_BATCH_SIZE>1 groups same-canvas images into one static
        forward (tail chunk padded); predictions must match B=1 exactly."""
        from devis_tpu.inference import evaluate_coco as eval_loop

        cfg, ds, model, variables = self._setup()
        s1 = eval_loop(model, variables, ds, cfg, verbose=False)

        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.TEST.EVAL_BATCH_SIZE = 2       # 3 images -> chunks of 2 + 1(pad)
        cfg2.freeze()
        s2 = eval_loop(model, variables, ds, cfg2, verbose=False)
        for iou_type in ("bbox", "segm"):
            for k, v in s1[iou_type].items():
                np.testing.assert_allclose(s2[iou_type][k], v, atol=1e-6,
                                           err_msg=f"{iou_type}/{k}")

    def test_merge_rank_predictions_dedup(self):
        from devis_tpu.inference import merge_rank_predictions
        a = [{"image_id": 1, "score": 0.9}, {"image_id": 2, "score": 0.8}]
        b = [{"image_id": 2, "score": 0.8}, {"image_id": 3, "score": 0.7}]
        merged = merge_rank_predictions([a, b])
        assert sorted(p["image_id"] for p in merged) == [1, 2, 3]
