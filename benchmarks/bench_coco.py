"""Image-model (COCO instance segmentation) inference benchmark on one chip.

The reference reports 12.1 FPS for the Deformable-DETR R50 mask-head model on
COCO (`/root/reference/README.md:25`, GPU unspecified). This measures our
single-image forward (backbone + deformable transformer + mask head +
postprocess inputs) at the reference eval sizing (shorter side 800, max 1333
— bucketed to 800×1216 here).

Run on the real TPU:  python benchmarks/bench_coco.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REFERENCE_FPS = 12.1


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model

    cfg = get_cfg_defaults()
    yaml_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "deformable_mask_head",
        "deformable_mask_head_R_50.yaml")
    if not os.path.exists(yaml_path):
        raise FileNotFoundError(yaml_path)
    cfg.merge_from_file(yaml_path)
    cfg.DATASETS.TYPE = "coco"
    cfg.MODEL.MASK_ON = True
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model = build_model(num_classes=91, cfg=cfg)

    H, W = 800, 1216
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(1, H, W, 3), jnp.float32)
    mask = jnp.zeros((1, H, W), bool)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, mask, train=False)

    fn = jax.jit(lambda v, im, mk: model.apply(v, im, mk, train=False))
    out = fn(variables, imgs, mask)
    jax.block_until_ready(out)

    n = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(variables, imgs, mask)
        _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
        best = min(best, (time.perf_counter() - t0) / n)
    fps = 1.0 / best
    print(f"image latency: {best * 1000:.1f} ms  "
          f"({fps:.1f} FPS vs reference {REFERENCE_FPS})")


if __name__ == "__main__":
    main()
