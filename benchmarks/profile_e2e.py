"""Instrumented end-to-end VIS pipeline profile.

Breaks the per-clip wall time of the real tracker pipeline into:
  * result-wait   — `pending.result()` block in the tracker loop
  * device        — dispatch→ready time of the jitted forward alone
  * fetch         — device→host transfer (jax.device_get) of the outputs
  * prep          — clip load + canvas pad (loader thread)
  * masks         — host `_process_masks` (cv2 resize + sigmoid/RLE)
  * stitch        — Hungarian inference matcher + track append

Run: python benchmarks/profile_e2e.py
"""
from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TIMES = defaultdict(list)


def timed(name, fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    TIMES[name].append(time.perf_counter() - t0)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model
    from devis_tpu.datasets.synthetic import SyntheticVISValDataset
    from devis_tpu.inference import VISInferFn, build_tracker, inference_vis
    from devis_tpu.tracking import tracker as trk_mod

    T, STRIDE = 6, 4
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.MODEL.NUM_QUERIES = 60
    cfg.MODEL.BBX_GRADIENT_PROP = True
    cfg.MODEL.DEVIS.NUM_FRAMES = T
    cfg.TEST.NUM_OUT = 20
    cfg.INPUT.MIN_SIZE_TEST = 360
    cfg.INPUT.MAX_SIZE_TEST = 640
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model = build_model(num_classes=41, cfg=cfg)

    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(T, 360, 640, 3), jnp.float32)
    mask = jnp.zeros((T, 360, 640), bool)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0), imgs, mask, train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    # --- monkeypatch instrumentation -------------------------------------
    orig_prepare = VISInferFn.prepare
    orig_dispatch = VISInferFn.dispatch
    orig_fetch = VISInferFn.fetch

    def prepare(self, video, clip_idx):
        return timed("prep", orig_prepare, self, video, clip_idx)

    def dispatch(self, prepared):
        return timed("dispatch", orig_dispatch, self, prepared)

    def fetch(self, dispatched):
        out = timed("fetch", orig_fetch, self, dispatched)
        TIMES["fetch_bytes"].append(
            out["mask_logits"].nbytes + out["scores"].nbytes)
        return out

    VISInferFn.prepare = prepare
    VISInferFn.dispatch = dispatch
    VISInferFn.fetch = fetch

    orig_masks = trk_mod.Tracker._process_masks

    def _process_masks(self, *a, **k):
        return timed("masks", orig_masks, self, *a, **k)

    trk_mod.Tracker._process_masks = _process_masks

    from devis_tpu.tracking.inference_matcher import HungarianInferenceMatcher
    orig_match = HungarianInferenceMatcher.__call__

    def match(self, *a, **k):
        return timed("stitch", orig_match, self, *a, **k)

    HungarianInferenceMatcher.__call__ = match

    # The bench.py corpus: 2 canvas buckets, 20 instances, 4×36 frames —
    # numbers here decompose the e2e figure BENCH_rNN.json reports.
    dataset = SyntheticVISValDataset(
        num_frames=T, stride=STRIDE, n_videos=4, video_len=36,
        sizes=[(360, 640), (480, 320)], n_inst=20,
        min_size=360, max_size=640)
    tracker = build_tracker(cfg, model, variables)
    inference_vis(tracker, dataset, verbose=False)   # warm
    TIMES.clear()
    tracker.wait_time = tracker.stitch_time = 0.0
    tracker.wait_series = []
    t0 = time.perf_counter()
    out = inference_vis(tracker, dataset, verbose=False)
    wall = time.perf_counter() - t0
    n_frames = dataset.get_total_num_frames()

    print(f"\ne2e fps (timed accounting) : {out['fps']:.2f}")
    print(f"wall fps (total wall)      : {n_frames / wall:.2f}")
    print(f"frames={n_frames}  wall={wall:.2f}s  "
          f"wait={tracker.wait_time:.2f}s  stitch={tracker.stitch_time:.2f}s")
    for k in ("prep", "dispatch", "fetch", "masks", "stitch"):
        v = TIMES.get(k, [])
        if not v:
            continue
        print(f"{k:8s}: n={len(v):3d} total={sum(v)*1e3:8.1f}ms "
              f"mean={np.mean(v)*1e3:7.2f}ms max={np.max(v)*1e3:7.2f}ms")
    if TIMES.get("fetch_bytes"):
        mb = np.mean(TIMES["fetch_bytes"]) / 2**20
        bw = mb / 2**0 / max(np.mean(TIMES["fetch"]), 1e-9)
        print(f"fetch payload: {mb:.1f} MiB/clip  -> {bw:.0f} MiB/s")

    # Per-clip wait series: exposes WHERE the non-floor wait goes
    # (steady-state vs video-boundary vs canvas-switch clips).
    print("\nper-clip result-wait series (ms):")
    prev_vid = None
    for vid, clip_idx, w in tracker.wait_series:
        tag = ""
        if vid != prev_vid:
            tag = " <- first clip of video"
            prev_vid = vid
        print(f"  video {vid} clip {clip_idx:2d}: {w*1e3:7.1f}{tag}")


if __name__ == "__main__":
    main()
