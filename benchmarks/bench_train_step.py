"""Training-step benchmark: DeVIS R50 train step on one chip.

The reference trains YT-19 R50 in ~120 GPU-hours (4×RTX A6000, batch 4,
docs/TRAIN.md:28). This measures our per-step cost at the same logical
configuration (T=6 clip, ~480-shorter-side crop scale, 60 queries) so
training-cost claims are grounded.

Usage: python benchmarks/bench_train_step.py [steps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(steps: int = 10):
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import SyntheticVISDataset
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.models import build_model

    T, H, W = 6, 384, 640           # typical train crop at scale ~480
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.NUM_QUERIES = 60
    cfg.MODEL.DEVIS.NUM_FRAMES = T
    cfg.MODEL.BBX_GRADIENT_PROP = True
    cfg.MODEL.LOSS.AUX_LOSS_WEIGHTING = True
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()

    model = build_model(num_classes=41, cfg=cfg)
    ds = SyntheticVISDataset(num_frames=T, n_videos=1, video_len=T + 1,
                             size=(H, W))
    clip = collate_clip(ds[0], (H, W), max_instances=10)
    batch = jax.tree.map(lambda x: np.stack([x]), clip)

    variables = jax.jit(model.init, backend="cpu",
                        static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"][0],
        jnp.asarray(batch["pad_mask"][0]),
        targets=jax.tree.map(lambda x: x[0], batch["targets"]), train=True)
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    state = jax.device_put(state, jax.devices()[0])
    step_fn = make_train_step(model, cfg, num_classes=41)
    rng = jax.random.PRNGKey(7)

    state, m = step_fn(state, batch, rng)
    print(f"compile+first step done, loss {float(m['loss']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    print(f"train step: {dt * 1000:.0f} ms  "
          f"({3600 / dt:.0f} clips/hour/chip, batch 1 clip of T={T})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
