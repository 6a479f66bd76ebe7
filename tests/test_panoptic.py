"""Panoptic Quality evaluator golden-value tests."""
import numpy as np
import pytest

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


@pytest.mark.slow
def test_panoptic_pipeline_end_to_end(tmp_path, rng):
    """`DATASETS.TYPE: coco_panoptic` dispatches through build_dataset and a
    tiny mask-head model runs evaluate_panoptic end-to-end (the reference
    flags its own panoptic path untested, src/datasets/__init__.py:33)."""
    import json
    import os

    import cv2
    import jax
    import jax.numpy as jnp

    from devis_tpu.config import get_cfg_defaults, sanity_check
    from devis_tpu.datasets import build_dataset
    from devis_tpu.inference import evaluate_panoptic
    from devis_tpu.models import build_model

    img_dir = tmp_path / "COCO" / "val2017"
    pan_dir = tmp_path / "coco_panoptic" / "panoptic_val2017"
    ann_dir = tmp_path / "coco_panoptic" / "annotations"
    for d in (img_dir, pan_dir, ann_dir):
        os.makedirs(d)

    H, W = 64, 96
    images, annotations = [], []
    for i in range(2):
        name = f"{i:012d}"
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{name}.jpg"), img)
        ids = np.zeros((H, W), np.int64)
        ids[8:40, 8:48] = 1
        ids[45:60, 50:90] = 2
        png = np.stack([ids % 256, ids // 256, ids // 65536],
                       axis=-1).astype(np.uint8)
        cv2.imwrite(str(pan_dir / f"{name}.png"),
                    cv2.cvtColor(png, cv2.COLOR_RGB2BGR))
        images.append({"id": i, "file_name": f"{name}.jpg",
                       "height": H, "width": W})
        annotations.append({
            "image_id": i, "file_name": f"{name}.png",
            "segments_info": [
                {"id": 1, "category_id": 1, "iscrowd": 0, "area": 32 * 40},
                {"id": 2, "category_id": 2, "iscrowd": 0, "area": 15 * 40}]})
    with open(ann_dir / "panoptic_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "isthing": 1},
                                  {"id": 2, "isthing": 0}]}, f)

    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "coco_panoptic"
    cfg.DATASETS.DATA_PATH = str(tmp_path)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 1
    cfg.MODEL.LOSS.MASK_AUX_LOSS = []
    cfg.MODEL.NUM_QUERIES = 8
    cfg.MODEL.MASK_ON = True
    cfg.TEST.NUM_OUT = 4
    cfg.freeze()
    sanity_check(cfg)

    ds, num_classes = build_dataset("VAL", cfg)
    assert len(ds) == 2 and num_classes == 250
    sample = ds[0]
    assert sample["masks"].shape[0] == 2

    model = build_model(num_classes=num_classes, cfg=cfg)
    imgs = jnp.zeros((1, 64, 128, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask, train=False)
    summary = evaluate_panoptic(model, variables, ds, cfg, verbose=False)
    for k in ("PQ", "SQ", "RQ", "PQ_th", "PQ_st"):
        assert k in summary and np.isfinite(summary[k])
