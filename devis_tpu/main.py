"""CLI driver — reference `main.py` equivalent.

Usage:
    python -m devis_tpu.main --config-file configs/devis_R_50.yaml [--eval-only]
        [KEY VALUE ...]

Flow (reference main.py:97-407): YACS config merge + sanity check → seeding →
dataset/model/tracker build → optimizer with 5 LR groups → weight loading
(+ cross-model adaptation) → epoch loop with periodic eval + checkpointing,
or the eval-only paths (COCO eval / VIS tracking + TrackMAP).

TPU-native deltas: DDP/NCCL → one SPMD train step over a `jax.sharding.Mesh`
(multi-host via `jax.distributed.initialize` when JAX_COORDINATOR is set);
torch checkpoints load through the torch→flax converter; native checkpoints
use orbax.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import time
from typing import Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("DeVIS-TPU")
    p.add_argument("--config-file", default="", help="YACS YAML config")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", default="", help="checkpoint dir to resume")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY VALUE config overrides")
    return p.parse_args(argv)


def setup_cfg(args):
    from .config import get_cfg_defaults, sanity_check
    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    sanity_check(cfg)
    return cfg


def seed_everything(seed: int):
    """Determinism knobs (reference main.py:104-118). XLA reductions are
    deterministic on TPU, so seeding host RNGs + jax PRNG keys suffices."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def load_initial_weights(cfg, model, variables):
    """MODEL.WEIGHTS loading incl. cross-model adaptation
    (reference main.py:269-328 + weights_loading_utils.py)."""
    import jax
    from .util import checkpoint as ckpt_lib

    path = cfg.MODEL.WEIGHTS
    if not path:
        return variables
    if os.path.isdir(path):                       # native orbax checkpoint
        return ckpt_lib.restore_checkpoint(path, variables)
    state = ckpt_lib.load_torch_checkpoint(path)
    if cfg.MODEL.SHIFT_CLASS_NEURON:
        state = ckpt_lib.shift_class_neurons(state)
    if cfg.MODEL.MASK_ON and not any(k.startswith("def_detr") for k in state):
        state = ckpt_lib.prefix_def_detr(state)
    if cfg.DATASETS.TYPE == "vis":
        da = cfg.MODEL.DEVIS.DEFORMABLE_ATTENTION
        model_keys = ckpt_lib.flax_variables_to_torch_keys(variables)
        state = ckpt_lib.adapt_weights_devis(
            state, model_keys, lvl_res=cfg.MODEL.NUM_FEATURE_LEVELS,
            focal_loss=cfg.MODEL.LOSS.FOCAL_LOSS,
            finetune_class_logits=cfg.SOLVER.DEVIS.FINETUNE_CLASS_LOGITS,
            num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            finetune_query_embds=cfg.SOLVER.DEVIS.FINETUNE_QUERY_EMBEDDINGS,
            finetune_temporal_modules=cfg.SOLVER.DEVIS.FINETUNE_TEMPORAL_MODULES,
            enc_connect_all_frames=da.ENC_CONNECT_ALL_FRAMES,
            enc_temporal_window=da.ENC_TEMPORAL_WINDOW,
            enc_n_temporal_points=da.ENC_N_POINTS_TEMPORAL_FRAME,
            dec_n_temporal_points=da.DEC_N_POINTS_TEMPORAL_FRAME)
    variables, missing, unused = ckpt_lib.torch_to_flax_variables(
        state, variables, strict=False, verbose=True)
    if missing:
        print(f"{len(missing)} params initialized from scratch")
    return variables


def main(argv=None):
    args = parse_args(argv)
    cfg = setup_cfg(args)
    seed_everything(cfg.SEED)

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_COORDINATOR"):          # multi-host rendezvous
        jax.distributed.initialize()

    from .datasets import TrainLoader, build_dataset, make_buckets
    from .engine import create_train_state, make_train_step, train_one_epoch
    from .inference import (build_tracker, evaluate_coco, evaluate_panoptic,
                            inference_vis)
    from .models import build_model
    from .parallel import make_mesh, replicate
    from .util import checkpoint as ckpt_lib

    is_vis = cfg.DATASETS.TYPE == "vis"
    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    dataset_val, num_classes = build_dataset("VAL", cfg)
    model = build_model(num_classes=num_classes, cfg=cfg)

    # template init on tiny shapes (params are shape-independent)
    T = cfg.MODEL.DEVIS.NUM_FRAMES if is_vis else 1
    dummy_imgs = jnp.zeros((T if is_vis else 2, 64, 64, 3), jnp.float32)
    dummy_mask = jnp.zeros(dummy_imgs.shape[:3], bool)
    # CPU-lowered trace must not touch Pallas: init on an explicit impl='xla'
    # template twin (identical param tree by construction).
    init_model = build_model(num_classes=num_classes, cfg=cfg, impl="xla")
    variables = jax.jit(init_model.init, static_argnames=("train",),
                        backend="cpu")(jax.random.PRNGKey(cfg.SEED),
                                       dummy_imgs, dummy_mask, train=False)
    variables = load_initial_weights(cfg, model, variables)
    # The CPU-side init leaves the params CPU-committed, and jit follows
    # committed inputs — move them to the default (accelerator) device so
    # every downstream forward runs there.
    variables = jax.device_put(variables, jax.devices()[0])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    print(f"model: {cfg.MODEL.BACKBONE} | params {n_params / 1e6:.1f}M "
          f"| devices {jax.device_count()}")

    if args.eval_only:
        def run_eval(vs, tag=""):
            if is_vis:
                tracker = build_tracker(cfg, model, vs)
                out = inference_vis(tracker, dataset_val,
                                    output_dir=os.path.join(
                                        output_dir, cfg.TEST.SAVE_PATH + tag),
                                    selected_videos=(
                                        cfg.TEST.VIZ.VIDEO_NAMES.split(",")
                                        if cfg.TEST.VIZ.VIDEO_NAMES else None))
                if "eval" in out:
                    print(tag, json.dumps({k: v for k, v in out["eval"].items()
                                           if isinstance(v, float)}))
                return out.get("eval", {}).get("AP", 0.0)
            if cfg.DATASETS.TYPE == "coco_panoptic":
                stats = evaluate_panoptic(model, vs, dataset_val, cfg)
                print(tag, json.dumps(stats))
                return stats["PQ"]
            stats = evaluate_coco(model, vs, dataset_val, cfg)
            print(tag, json.dumps(stats))
            return stats["bbox"]["AP"]

        if cfg.TEST.INPUT_FOLDER:
            # multi-checkpoint folder eval (reference main.py:163-193)
            best, best_ep = -1.0, None
            for ep in cfg.TEST.EPOCHS_TO_EVAL:
                path = os.path.join(cfg.TEST.INPUT_FOLDER,
                                    f"checkpoint_epoch_{ep}")
                if not os.path.exists(path):
                    print(f"skip missing {path}")
                    continue
                ckpt = ckpt_lib.restore_checkpoint(path, None)
                vs = ({"params": ckpt["params"], **ckpt["frozen"]}
                      if isinstance(ckpt, dict) and "params" in ckpt
                      else ckpt)
                ap = run_eval(vs, tag=f"_epoch{ep}")
                if ap > best:
                    best, best_ep = ap, ep
            print(f"best epoch {best_ep}: AP {best:.2f}")
        else:
            run_eval(variables)
        return

    # ---- training -----------------------------------------------------
    dataset_train, _ = build_dataset("TRAIN", cfg)
    mesh = make_mesh(cfg.TPU.MESH_DP)
    n_dev = mesh.devices.size
    global_batch = cfg.SOLVER.BATCH_SIZE * n_dev if is_vis \
        else cfg.SOLVER.BATCH_SIZE
    scales = [480, 512, 544, 576, 608, 640]
    buckets = make_buckets([int(cfg.INPUT.SCALE_FACTOR_TRAIN * s)
                            for s in scales],
                           int(cfg.INPUT.SCALE_FACTOR_TRAIN * 1333))
    # target-slot capacity must not exceed assignable queries (per frame)
    queries = cfg.MODEL.NUM_QUERIES // (T if is_vis else 1)
    max_instances = min(cfg.TPU.MAX_INSTANCES, queries)
    loader = TrainLoader(dataset_train, global_batch, vis=is_vis,
                         buckets=buckets, max_instances=max_instances,
                         seed=cfg.SEED)
    steps_per_epoch = max(len(loader), 1)
    state = create_train_state(cfg, variables, steps_per_epoch)

    start_epoch = 0
    best_stats = {}
    if args.resume:
        state = ckpt_lib.restore_checkpoint(args.resume, state)
        meta_path = os.path.join(args.resume, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            start_epoch = meta.get("epoch", -1) + 1
            best_stats = meta.get("best_stats", {})

    state = replicate(state, mesh)
    step_fn = make_train_step(model, cfg, num_classes=num_classes)
    rng = jax.random.PRNGKey(cfg.SEED)

    from .util.logging_utils import (build_metrics, build_visdom,
                                     device_memory_stats)
    metrics = build_metrics(cfg)
    visdom = build_visdom(cfg)

    for epoch in range(start_epoch, cfg.SOLVER.EPOCHS):
        loader.set_epoch(epoch)
        t0 = time.time()
        state, train_stats = train_one_epoch(
            step_fn, state, loader, rng, epoch, mesh=mesh)
        print(f"epoch {epoch}: {time.time() - t0:.1f}s "
              f"loss {train_stats.get('loss', float('nan')):.4f}")
        metrics.write(epoch, {**train_stats, **device_memory_stats()},
                      kind="train_epoch")
        if visdom:
            visdom.plot("train", epoch,
                        {k: v for k, v in train_stats.items()
                         if k in ("loss", "loss_ce", "loss_bbox", "loss_giou",
                                  "loss_mask", "loss_dice", "class_error")})

        # periodic eval (reference main.py:349-361)
        if (epoch + 1) >= cfg.TEST.START_EVAL_EPOCH and \
                (epoch + 1) % cfg.TEST.EVAL_PERIOD == 0:
            host_vars = {"params": jax.device_get(state.params),
                         **jax.device_get(state.frozen)}
            if is_vis:
                tracker = build_tracker(cfg, model, host_vars)
                out = inference_vis(tracker, dataset_val, output_dir=None)
                stat = out.get("eval", {}).get("AP", 0.0)
                key = "vis_ap"
            else:
                stats = evaluate_coco(model, host_vars, dataset_val, cfg)
                stat = stats["bbox"]["AP"]
                key = "coco_ap"
            if stat > best_stats.get(key, -1):
                best_stats[key] = stat
                ckpt_lib.save_checkpoint(
                    os.path.join(output_dir, f"checkpoint_best_{key}"),
                    jax.device_get(state))
            print(f"eval epoch {epoch}: {key}={stat:.2f} "
                  f"(best {best_stats[key]:.2f})")

        # checkpointing (reference main.py:332-385)
        ckpt_lib.save_checkpoint(os.path.join(output_dir, "checkpoint"),
                                 jax.device_get(state))
        with open(os.path.join(output_dir, "checkpoint", "meta.json"),
                  "w") as f:
            json.dump({"epoch": epoch, "best_stats": best_stats}, f)
        if (epoch + 1) % cfg.SOLVER.CHECKPOINT_INTERVAL == 0:
            ckpt_lib.save_checkpoint(
                os.path.join(output_dir, f"checkpoint_epoch_{epoch}"),
                jax.device_get(state))


if __name__ == "__main__":
    main()
