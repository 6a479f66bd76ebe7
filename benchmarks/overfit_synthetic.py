"""End-to-end learning check: overfit DeVIS on synthetic clips (real TPU).

Trains a small DeVIS on the deterministic synthetic videos and then runs the
full tracking + TrackMAP evaluation on the same videos. A healthy pipeline
drives the loss down sharply and reaches high AP — this exercises the whole
stack (pallas kernels fwd+bwd, matcher, criterion, optimizer groups, tracker,
RLE, TrackMAP) the way the reference's mini_train smoke runs do
(SURVEY.md §4.2).

Usage: python benchmarks/overfit_synthetic.py [steps=1000]
1000 steps reach TrackMAP AP ~72 (AP50/75 = 100) in ~6 min on v5e;
attention-map specialization needs ~500 steps, so short runs give 0 AP.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main(steps: int = 150):
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import (SyntheticVISDataset,
                                              SyntheticVISValDataset)
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.inference import build_tracker, inference_vis
    from devis_tpu.models import build_model

    T, H, W = 4, 128, 192
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 2
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
    cfg.MODEL.DEVIS.NUM_FRAMES = T
    cfg.MODEL.NUM_QUERIES = 24
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.TEST.NUM_OUT = 6
    cfg.TEST.CLIP_TRACKING.STRIDE = 2
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 192
    cfg.SOLVER.BASE_LR = 4e-4
    if "--no-mdc" in sys.argv:       # plain-conv mask head (banded-DCNv2 A/B)
        cfg.MODEL.MASK_HEAD.USE_MDC = False
    cfg.freeze()

    model = build_model(num_classes=41, cfg=cfg)
    train_ds = SyntheticVISDataset(num_frames=T, n_videos=2, video_len=8,
                                   size=(H, W))
    clips = [collate_clip(train_ds[i], (H, W), max_instances=4)
             for i in range(len(train_ds))]

    batch0 = jax.tree.map(lambda *x: np.stack(x), *clips[:1])
    variables = jax.jit(model.init, backend="cpu",
                    static_argnames=("train",))(
        jax.random.PRNGKey(0), batch0["images"][0],
        jnp.asarray(batch0["pad_mask"][0]),
        targets=jax.tree.map(lambda x: x[0], batch0["targets"]), train=True)
    state = create_train_state(cfg, variables, steps_per_epoch=len(clips))
    state = jax.device_put(state, jax.devices()[0])
    step_fn = make_train_step(model, cfg, num_classes=41)
    rng = jax.random.PRNGKey(7)

    losses = []
    t0 = time.time()
    for i in range(steps):
        batch = jax.tree.map(lambda *x: np.stack(x),
                             *[clips[i % len(clips)]])
        state, m = step_fn(state, batch, rng)
        if i % 10 == 0 or i == steps - 1:
            loss = float(m["loss"])
            losses.append(loss)
            print(f"step {i}: loss {loss:.4f} "
                  f"({(time.time() - t0) / (i + 1):.2f}s/step)", flush=True)
    assert losses[-1] < losses[0] * 0.5, \
        f"loss did not halve: {losses[0]:.3f} -> {losses[-1]:.3f}"

    host_vars = {"params": jax.device_get(state.params),
                 **jax.device_get(state.frozen)}
    val = SyntheticVISValDataset(num_frames=T, stride=2, n_videos=2,
                                 video_len=8, size=(H, W),
                                 min_size=128, max_size=192)
    if cfg.MODEL.MASK_HEAD.USE_MDC:
        # The aggressive overfit regime (LR 4e-4, 1000 steps, 2 videos)
        # drives the zero-init offset fields far out of the banded kernel's
        # window — exactly the situation the band-coverage audit exists for
        # (docs/PERFORMANCE.md §Band-truncation risk). Run it and report.
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from accuracy_gate import audit_band_coverage
        cov_ok = audit_band_coverage(
            cfg, 41, host_vars,
            (batch0["images"][0], jnp.asarray(batch0["pad_mask"][0])), 0.99)
        print(f"band-coverage audit after overfit: "
              f"{'PASS' if cov_ok else 'LOW (expected: offsets drifted)'}")
    eval_model = model
    if "--exact-eval" in sys.argv:   # exact XLA DCNv2 twin (same param tree)
        eval_model = build_model(num_classes=41, cfg=cfg, impl="xla")
    tracker = build_tracker(cfg, eval_model, host_vars)
    out = inference_vis(tracker, val, verbose=True)
    ap = out["eval"]["AP"]

    # ---- diagnostics ----
    from devis_tpu.evaluation import rle as rle_lib
    gt = val.gt_dict()
    print(f"DIAG: {len(out['results'])} predicted tracks, "
          f"{len(gt['annotations'])} gt tracks")
    for r in out["results"][:6]:
        segs = [s for s in r["segmentations"] if s]
        print(f"  pred vid={r['video_id']} cat={r['category_id']} "
              f"score={r['score']:.3f} frames_with_mask={len(segs)}"
              f" area0={rle_lib.area(segs[0]) if segs else 0}")
    for a in gt["annotations"][:4]:
        segs = [s for s in a["segmentations"] if s]
        print(f"  gt   vid={a['video_id']} cat={a['category_id']} "
              f"frames={len(segs)} area0={rle_lib.area(segs[0]) if segs else 0}")
    if out["results"]:
        from devis_tpu.evaluation.track_map import (_track_from_segmentations,
                                                    mask_track_iou)
        for r in out["results"][:3]:
            best = max((mask_track_iou(
                _track_from_segmentations(r["segmentations"]),
                _track_from_segmentations(a["segmentations"]))
                for a in gt["annotations"]
                if a["video_id"] == r["video_id"]), default=0.0)
            print(f"  pred cat={r['category_id']} best gt IoU: {best:.3f}")
        if len(out["results"]) >= 2:
            a, b = out["results"][0], out["results"][1]
            if a["video_id"] == b["video_id"]:
                iou_pp = mask_track_iou(
                    _track_from_segmentations(a["segmentations"]),
                    _track_from_segmentations(b["segmentations"]))
                print(f"  pred-vs-pred track IoU (identical-mask check): "
                      f"{iou_pp:.3f}")

    # train-path mask quality: run the TRAIN forward (matched trajectories)
    # on a train clip and compare pred_masks to targets.
    clip = clips[0]
    tgt = clip["targets"]
    out_tr = model.apply(host_vars,
                         jnp.asarray(clip["images"]),
                         jnp.asarray(clip["pad_mask"]),
                         targets=jax.tree.map(jnp.asarray, tgt), train=True,
                         deterministic=True,
                         rngs={"dropout": jax.random.PRNGKey(0)})
    pm = np.asarray(out_tr["pred_masks"])          # (N, T, h, w) logits
    tm = np.asarray(tgt["masks"])                  # (N, T, hm, wm)
    import cv2
    for n in range(min(3, pm.shape[0])):
        pred = (1 / (1 + np.exp(-pm[n, 0])) > 0.5)
        gtm = cv2.resize(tm[n, 0], (pm.shape[3], pm.shape[2]),
                         interpolation=cv2.INTER_NEAREST) > 0.5
        inter = (pred & gtm).sum(); union = (pred | gtm).sum()
        print(f"  TRAIN-path inst {n}: mask IoU "
              f"{inter / max(union, 1):.3f} area {pred.sum()}")
    print(f"RESULT loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"overfit TrackMAP AP {ap:.1f}")
    assert ap > 50.0, f"overfit AP too low: {ap}"
    print("OVERFIT OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
