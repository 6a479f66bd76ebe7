"""COCO eval-loop throughput on one chip (VERDICT r3 #7).

Times the full `evaluate_coco` pipeline — loader thread, canvas-bucket
batched jitted forward, pipelined host postprocess (mask threshold/resize),
COCOeval accumulate — over synthetic images at the reference eval sizing
(shorter side 800, max 1333), and projects a COCO val2017 (5k images) wall
time. Predictions come from random weights (timing is shape-driven, not
content-driven).

Usage: python benchmarks/bench_coco_eval.py [n_images] [batch ...]
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


def main(n_images=64, batches=(1, 4)):
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets.synthetic import SyntheticCocoDataset
    from devis_tpu.inference import evaluate_coco
    from devis_tpu.models import build_model

    for B in batches:
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(
            os.path.dirname(__file__), "..", "configs",
            "deformable_mask_head", "deformable_mask_head_R_50.yaml"))
        cfg.DATASETS.TYPE = "coco"
        cfg.MODEL.MASK_ON = True
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TEST.EVAL_BATCH_SIZE = B
        cfg.freeze()
        model = build_model(num_classes=91, cfg=cfg)
        # images generated at the 800/1333 eval canvas (bench_coco sizing)
        ds = SyntheticCocoDataset(train=False, n_images=n_images,
                                  size=(800, 1216))
        sample = ds[0]
        h, w = sample["image"].shape[:2]
        variables = jax.jit(model.init, backend="cpu",
                            static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((1, 64, 64), bool), train=False)
        variables = jax.device_put(variables, jax.devices()[0])
        # warm pass compiles every canvas bucket; timed pass is steady-state
        evaluate_coco(model, variables, ds, cfg, verbose=False)
        t0 = time.perf_counter()
        evaluate_coco(model, variables, ds, cfg, verbose=False)
        dt = time.perf_counter() - t0
        ips = n_images / dt
        print(f"B={B}: {n_images} images in {dt:.1f} s = {ips:.2f} img/s "
              f"(val2017 5k ≈ {5000 / ips / 60:.1f} min)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bs = tuple(int(b) for b in sys.argv[2:]) or (1, 4)
    main(n, bs)
