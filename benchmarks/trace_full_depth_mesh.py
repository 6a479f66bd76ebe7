"""Full-depth multichip compile evidence (VERDICT r4 #4).

The automated driver dryrun shards every subsystem but at reduced depth
(1 enc + 2 dec layers — XLA:CPU compile-time bound, TRAIN.md §Multi-chip).
This traces and executes the FLAGSHIP-DEPTH graph — the full 6 encoder +
6 decoder DeVIS train step, T=6, mask head + aux losses — through the real
mesh machinery (`make_mesh` / `replicate` / `shard_batch` /
`make_train_step`, i.e. the exact production parallel layout with dp=1)
on the real TPU chip, proving the full-depth SPMD step compiles and runs
where the CPU dryrun cannot afford to.

Run on the real TPU:  python benchmarks/trace_full_depth_mesh.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets import collate_clip
    from devis_tpu.datasets.synthetic import SyntheticVISDataset
    from devis_tpu.engine import create_train_state, make_train_step
    from devis_tpu.models import build_model
    from devis_tpu.parallel import make_mesh, replicate, shard_batch

    # flagship depth: 6+6 layers, T=6, 60 queries, mask head + one aux level
    T, H, W, NUM_CLASSES = 6, 128, 192, 41
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.NUM_QUERIES = 60
    cfg.MODEL.DEVIS.NUM_FRAMES = T
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model = build_model(num_classes=NUM_CLASSES, cfg=cfg)

    ds = SyntheticVISDataset(num_frames=T, n_videos=1, video_len=T + 1,
                             size=(H, W))
    clip = collate_clip(ds[0], (H, W), max_instances=10)
    batch = jax.tree.map(lambda x: np.stack([x]), clip)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(model.init, backend="cpu",
                            static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["images"][0],
            jnp.asarray(batch["pad_mask"][0]),
            targets=jax.tree.map(lambda x: x[0], batch["targets"]),
            train=True)
    state = create_train_state(cfg, variables, steps_per_epoch=10)

    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, num_classes=NUM_CLASSES)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    t1 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss2 = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss) and np.isfinite(loss2), (loss, loss2)
    print(f"full-depth 6+6 mesh step: ok on {jax.devices()} mesh={mesh}; "
          f"compile+step1 {t1 - t0:.1f}s, loss {loss:.4f} -> {loss2:.4f}")


if __name__ == "__main__":
    main()
