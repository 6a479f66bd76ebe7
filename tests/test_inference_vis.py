"""End-to-end VIS inference pipeline test (tiny model, CPU).

Covers the production path the Tracker tests stub out: `VISInferFn`
(uint8 clip → device-side normalization + pad-mask construction → jitted
eval forward → f16 mask transfer) staged through the 3-thread pipeline in
`Tracker.__call__`, then `inference_vis` over `SyntheticVISValDataset`
with TrackMAP evaluation (reference engine.py:206-262)."""
import numpy as np

import jax

from devis_tpu.config import get_cfg_defaults
from devis_tpu.datasets.synthetic import SyntheticVISValDataset
from devis_tpu.inference import build_tracker, inference_vis
from devis_tpu.models import build_model


def _tiny_cfg(binary_iou: bool = False):
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.TEST.CLIP_TRACKING.USE_BINARY_MASK_IOU = binary_iou
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.HIDDEN_DIM = 32
    cfg.MODEL.TRANSFORMER.FEEDFORWARD_DIM = 64
    cfg.MODEL.TRANSFORMER.NHEADS = 4
    cfg.MODEL.NUM_QUERIES = 12          # 4 per frame
    cfg.MODEL.DEVIS.NUM_FRAMES = 3
    cfg.TEST.NUM_OUT = 4
    cfg.TEST.CLIP_TRACKING.STRIDE = 2
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.freeze()
    return cfg


import pytest


@pytest.mark.parametrize("binary_iou", [False, True],
                         ids=["soft_iou", "binary_rle_iou"])
def test_inference_vis_end_to_end(binary_iou):
    cfg = _tiny_cfg(binary_iou)
    model = build_model(num_classes=6, cfg=cfg)
    T = cfg.MODEL.DEVIS.NUM_FRAMES
    imgs = np.zeros((T, 64, 128, 3), np.float32)
    mask = np.zeros((T, 64, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask, train=False)

    dataset = SyntheticVISValDataset(
        num_frames=T, stride=cfg.TEST.CLIP_TRACKING.STRIDE, n_videos=1,
        video_len=7, size=(48, 64), min_size=cfg.INPUT.MIN_SIZE_TEST,
        max_size=cfg.INPUT.MAX_SIZE_TEST)
    # raw-uint8 clips: normalization must happen on device
    clip = dataset[0].load_clip(0)
    assert clip.dtype == np.uint8

    tracker = build_tracker(cfg, model, variables)
    out = inference_vis(tracker, dataset, verbose=False)
    assert out["fps"] > 0
    assert "eval" in out and np.isfinite(out["eval"]["AP"])
    assert isinstance(out["results"], list)
    for r in out["results"]:
        assert set(r) >= {"video_id", "score", "category_id", "segmentations"}
        for s in r["segmentations"]:
            assert s is None or isinstance(s["counts"], str)
