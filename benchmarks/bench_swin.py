"""SwinL clip-inference + train-step benchmark on one chip.

BASELINE.md lists SwinL rows (57.1 AP YT-19, train memory 26-40 GB) but the
reference publishes no SwinL FPS; this grounds our own SwinL throughput and
memory claims (reference config `configs/devis/YT-19/devis_Swin_L_YT-19.yaml`,
backbone `src/models/swin_backbone.py`).

Usage: python benchmarks/bench_swin.py [--train] [--no-remat]
  default      eval clip latency (T=6, 360x640, top-20), like bench.py
  --train      one optimized train step (T=6, 384x640) + device memory stats
  --no-remat   disable TPU.SWIN_GRADIENT_CHECKPOINT for the train variant
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T, STRIDE = 6, 4
H, W = 360, 640


def _cfg(train: bool, remat: bool):
    from devis_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "devis", "YT-19",
                                     "devis_Swin_L_YT-19.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if train:
        cfg.TPU.SWIN_GRADIENT_CHECKPOINT = remat
        # the 6+6 transformer's activations alone exceed one v5e's 16 GB at
        # SwinL train shapes (reference peak 26-40 GB); remat per layer
        cfg.TPU.TRANSFORMER_GRADIENT_CHECKPOINT = remat
    cfg.freeze()
    return cfg


def _build(cfg):
    import jax
    from devis_tpu.models import build_model
    model = build_model(num_classes=41, cfg=cfg)
    rs = np.random.RandomState(0)
    imgs = np.asarray(rs.rand(T, H, W, 3), np.float32)
    mask = np.zeros((T, H, W), bool)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(model.init, backend="cpu",
                            static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, mask, train=False)
    return model, variables, imgs, mask


def bench_eval():
    import jax
    import jax.numpy as jnp
    cfg = _cfg(train=False, remat=False)
    model, variables, imgs, mask = _build(cfg)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    imgs = jax.device_put(jnp.asarray(imgs), dev)
    mask = jax.device_put(jnp.asarray(mask), dev)

    @jax.jit
    def step(v, images, pad_mask):
        out, res = model.apply(v, images, pad_mask, train=False)
        perturb = (res["scores"].sum() * 1e-12).astype(images.dtype)
        return images + perturb, res

    imgs, res = step(variables, imgs, mask)
    float(res["scores"][0, 0])
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        imgs, res = step(variables, imgs, mask)
    float(res["scores"][0, 0])
    dt = (time.perf_counter() - t0) / n_iter
    print(json.dumps({"metric": "yt19_swinl_clip_inference_fps",
                      "value": round(STRIDE / dt, 2), "unit": "frames/s",
                      "clip_latency_ms": round(dt * 1e3, 1)}))


def bench_train(remat: bool):
    import jax
    import jax.numpy as jnp
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import SyntheticVISDataset
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.models import build_model

    Ht, Wt = 384, 640
    cfg = _cfg(train=True, remat=remat)
    model = build_model(num_classes=41, cfg=cfg)
    ds = SyntheticVISDataset(num_frames=T, n_videos=1, video_len=T + 1,
                             size=(Ht, Wt))
    clip = collate_clip(ds[0], (Ht, Wt), max_instances=10)
    batch = jax.tree.map(lambda x: np.stack([x]), clip)

    variables = jax.jit(model.init, backend="cpu",
                        static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"][0],
        jnp.asarray(batch["pad_mask"][0]),
        targets=jax.tree.map(lambda x: x[0], batch["targets"]), train=True)
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    step_fn = make_train_step(model, cfg, num_classes=41)
    rng = jax.random.PRNGKey(7)

    state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iter

    mem = {}
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        mem = {"peak_bytes_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)}
    print(json.dumps({"metric": "yt19_swinl_train_step_s",
                      "value": round(dt, 3), "unit": "s/clip",
                      "gradient_checkpoint": remat, **mem}))


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--train" in sys.argv:
        bench_train(remat="--no-remat" not in sys.argv)
    else:
        bench_eval()
