"""Device-time breakdown of the flagship clip forward (and optionally the
COCO image model / train step) from a jax.profiler trace.

Run on the real TPU:  python benchmarks/profile_clip.py [clip|coco|train]

Parses the Chrome trace ("/tmp/devis_trace/**/*.trace.json.gz") and prints the
total device time per op-name bucket, sorted. Wall-clock through the axon
tunnel is unreliable (~5 ms dispatch latency); only the trace's device
timeline is trusted (see docs/PERFORMANCE.md).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRACE_DIR = "/tmp/devis_trace"


def run_clip():
    import jax, jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model
    T, H, W = 6, 360, 640
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
    imgs = jnp.asarray(rs.rand(T, H, W, 3), jnp.float32)
    mask = jnp.zeros((T, H, W), bool)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(model.init, backend="cpu",
                            static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, mask, train=False)
    dev = jax.devices()[0]
    variables, imgs, mask = jax.device_put((variables, imgs, mask), dev)

    @jax.jit
    def step(v, images, pad_mask):
        out, res = model.apply(v, images, pad_mask, train=False)
        return res

    res = step(variables, imgs, mask)
    jax.block_until_ready(res)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            res = step(variables, imgs, mask)
        jax.block_until_ready(res)
    return 3


def run_coco():
    import jax, jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model
    H, W = 800, 1216
    cfg = get_cfg_defaults()
    # mirror benchmarks/bench_coco.py exactly (NUM_OUT=50 per the reference
    # recipe) so trace breakdowns explain the benchmark number
    yaml_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "deformable_mask_head",
        "deformable_mask_head_R_50.yaml")
    cfg.merge_from_file(yaml_path)
    cfg.DATASETS.TYPE = "coco"
    cfg.MODEL.MASK_ON = True
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model = build_model(num_classes=91, cfg=cfg)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(1, H, W, 3), jnp.float32)
    mask = jnp.zeros((1, H, W), bool)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(model.init, backend="cpu",
                            static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, mask, train=False)
    dev = jax.devices()[0]
    variables, imgs, mask = jax.device_put((variables, imgs, mask), dev)

    @jax.jit
    def step(v, images, pad_mask):
        out = model.apply(v, images, pad_mask, train=False)
        return out["top_k"]

    res = step(variables, imgs, mask)
    jax.block_until_ready(res)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            res = step(variables, imgs, mask)
        jax.block_until_ready(res)
    return 3


def run_train():
    """Trace the DeVIS R50 train step (mirrors bench_train_step.py) —
    the backward-op table for docs/PERFORMANCE.md §Training."""
    import jax, jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import SyntheticVISDataset
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.models import build_model
    T, H, W = 6, 384, 640
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
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    step_fn = make_train_step(model, cfg, num_classes=41)
    rng = jax.random.PRNGKey(7)
    state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, metrics = step_fn(state, batch, rng)
        float(metrics["loss"])
    return 3


def summarize(n_iter: int, top: int = 40):
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, "no trace written"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    # device-lane events: pick pids whose process name mentions TPU/device XLA
    pid_name = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    buckets = collections.Counter()
    families = collections.Counter()
    fam_counts = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us → ms
        if name.startswith("jit_step"):
            continue  # envelope event double-counts everything inside
        buckets[name] += dur
        fam = name.split(".")[0].rstrip("0123456789")
        families[fam] += dur
        fam_counts[fam] += 1
        total += dur
    print(f"\ntrace: {path}")
    print(f"device total: {total / n_iter:.1f} ms/iter over {n_iter} iters")
    print(f"\n-- by family --\n{'family':45s} {'ms/iter':>9s} {'%':>6s} {'n/iter':>7s}")
    for name, ms in families.most_common(top):
        print(f"{name[:45]:45s} {ms / n_iter:9.3f} {100 * ms / total:6.2f} "
              f"{fam_counts[name] // n_iter:7d}")
    print(f"\n-- by op --\n{'op':70s} {'ms/iter':>9s} {'%':>6s}")
    for name, ms in buckets.most_common(top):
        print(f"{name[:70]:70s} {ms / n_iter:9.3f} {100 * ms / total:6.2f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "clip"
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    n = {"clip": run_clip, "coco": run_coco, "train": run_train}[mode]()
    summarize(n)
