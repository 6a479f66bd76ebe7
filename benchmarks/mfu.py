"""Analytic FLOP / MFU accounting for the flagship configurations.

"Useful" FLOPs are counted over the `impl='xla'` twin of the model
(`build_model(..., impl='xla')` — same math, identical parameter tree, no
Pallas custom-calls a counter can't see and no one-hot expansion work that
isn't part of the model's math). Counting walks the *lowered*
(pre-optimization) StableHLO (`benchmarks/stablehlo_flops.py`), so it is
platform-independent and needs no device compile.

MFU = useful FLOPs / (device_time × peak). Peak for one TPU v5e chip is
197 TFLOP/s (bf16). Device times come from `bench.py` / `profile_clip.py`
traces; pass them with --ms to get the implied MFU printed directly.

Usage:
    python benchmarks/mfu.py clip  [--ms 197]
    python benchmarks/mfu.py coco  [--ms 108.6]
    python benchmarks/mfu.py train [--ms 1350]

Reference context: the reference publishes no FLOP model at all; this is the
denominator for every perf claim in docs/PERFORMANCE.md (§MFU).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_PEAK_BF16 = 197e12          # FLOP/s, one chip


def _flops(lowered) -> float:
    # `Lowered.cost_analysis()` is None on this backend and compiling each
    # config for `Compiled.cost_analysis()` costs minutes of XLA:CPU time per
    # config (and counts the *optimized* HLO, which over-counts rewritten
    # convs by 9-25%); count the textbook math (2 x output x taps per
    # matmul/conv) straight from the lowered StableHLO instead.
    from stablehlo_flops import flops_of_lowered
    return flops_of_lowered(lowered)


def _vis_cfg():
    from devis_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.MODEL.NUM_QUERIES = 60
    cfg.MODEL.BBX_GRADIENT_PROP = True
    cfg.MODEL.DEVIS.NUM_FRAMES = 6
    cfg.TEST.NUM_OUT = 20
    cfg.INPUT.MIN_SIZE_TEST = 360
    cfg.INPUT.MAX_SIZE_TEST = 640
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    return cfg


def clip_flops(report=print):
    """Flagship DeVIS R50 clip forward (T=6, 360x640) + backbone share."""
    import jax
    import jax.numpy as jnp
    from devis_tpu.models import build_backbone, build_model

    cfg = _vis_cfg()
    cfg.freeze()
    T, H, W = 6, 360, 640
    model = build_model(num_classes=41, cfg=cfg, impl="xla")
    imgs = jnp.zeros((T, H, W, 3), jnp.float32)
    mask = jnp.zeros((T, H, W), bool)
    variables = jax.eval_shape(
        lambda k: model.init(k, imgs, mask, train=False),
        jax.random.PRNGKey(0))

    total = _flops(jax.jit(
        lambda v, i, m: model.apply(v, i, m, train=False)
    ).lower(variables, imgs, mask))

    backbone, _ = build_backbone(cfg, jnp.bfloat16)
    bvars = {"params": variables["params"]["detr"]["backbone"],
             "frozen": variables["frozen"]["detr"]["backbone"]}
    bb = _flops(jax.jit(
        lambda v, i: backbone.apply(v, i)
    ).lower(bvars, imgs.astype(jnp.bfloat16)))

    report(f"clip_forward_useful_gflops {total / 1e9:.1f}")
    report(f"  backbone_gflops {bb / 1e9:.1f}")
    report(f"  transformer+maskhead_gflops {(total - bb) / 1e9:.1f}")
    return total


def coco_flops(report=print):
    """COCO Deformable-DETR R50 + mask head, 800x1216 eval canvas."""
    import jax
    import jax.numpy as jnp
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model

    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "coco"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.NUM_QUERIES = 300
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    H, W = 800, 1216
    model = build_model(num_classes=91, cfg=cfg, impl="xla")
    imgs = jnp.zeros((1, H, W, 3), jnp.float32)
    mask = jnp.zeros((1, H, W), bool)
    variables = jax.eval_shape(
        lambda k: model.init(k, imgs, mask, train=False),
        jax.random.PRNGKey(0))
    total = _flops(jax.jit(
        lambda v, i, m: model.apply(v, i, m, train=False)
    ).lower(variables, imgs, mask))
    report(f"coco_forward_useful_gflops {total / 1e9:.1f}")
    return total


def train_flops(report=print):
    """DeVIS R50 train step (fwd+bwd+optimizer), T=6 at 384x640."""
    import jax
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import SyntheticVISDataset
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.models import build_model

    T, H, W = 6, 384, 640
    cfg = _vis_cfg()
    cfg.MODEL.LOSS.AUX_LOSS_WEIGHTING = True
    cfg.freeze()
    model = build_model(num_classes=41, cfg=cfg, impl="xla")
    ds = SyntheticVISDataset(num_frames=T, n_videos=1, video_len=T + 1,
                             size=(H, W))
    batch = jax.tree.map(lambda x: np.stack([x]),
                         collate_clip(ds[0], (H, W), max_instances=10))
    import jax.numpy as jnp
    variables = jax.eval_shape(
        lambda k: model.init(
            k, batch["images"][0], jnp.asarray(batch["pad_mask"][0]),
            targets=jax.tree.map(lambda x: x[0], batch["targets"]),
            train=True),
        jax.random.PRNGKey(0))
    state = jax.eval_shape(
        lambda v: create_train_state(cfg, v, steps_per_epoch=100), variables)
    step = make_train_step(model, cfg, num_classes=41)
    total = _flops(jax.jit(step).lower(state, batch, jax.random.PRNGKey(1)))
    report(f"train_step_useful_gflops {total / 1e9:.1f}")
    return total


def main():
    # Force the CPU platform in-process (the environment latches JAX_PLATFORMS
    # to the TPU plugin at interpreter start): counting must see the XLA twin,
    # and `resolve_impl('auto')` must not route any op to Pallas custom calls
    # the counter can't open.
    import jax
    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "clip"
    ms = None
    if "--ms" in sys.argv:
        ms = float(sys.argv[sys.argv.index("--ms") + 1])
    fn = {"clip": clip_flops, "coco": coco_flops, "train": train_flops}[which]
    total = fn()
    if ms is not None:
        mfu = total / (ms * 1e-3) / V5E_PEAK_BF16
        print(f"{which}: {total / 1e9:.1f} GFLOP / {ms:.1f} ms "
              f"-> {total / (ms * 1e-3) / 1e12:.2f} TFLOP/s "
              f"= {100 * mfu:.2f}% MFU (v5e bf16 peak 197 TFLOP/s)")


if __name__ == "__main__":
    main()
