"""Render decoder deformable-attention sampling maps — reference
`visualize_att_maps.py` (TrackerAttMaps + run_demo).

Runs the DeVIS model on validation clips with the `intermediates` collection
enabled (the decoder cross-attention sows its sampling locations/weights),
then scatters the top trajectories' sampling points over the frames.

Usage: python -m devis_tpu.visualize_att_maps --config-file cfg.yaml \
           [--videos N] [--queries K] [--out-dir DIR] [KEY VALUE ...]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("visualize-att-maps")
    p.add_argument("--config-file", default="")
    p.add_argument("--videos", type=int, default=1)
    p.add_argument("--queries", type=int, default=3)
    p.add_argument("--layer", type=int, default=-1)
    p.add_argument("--per-level", action="store_true",
                   help="additionally write one overlay per resolution "
                        "level (reference att_maps_viz.py:208-818 per-level "
                        "mode) next to the merged overlay")
    p.add_argument("--out-dir", default="att_maps_viz")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import get_cfg_defaults
    from .datasets import build_dataset, pick_canvas
    from .inference import make_eval_buckets
    from .main import load_initial_weights
    from .models import build_model
    from .util.visualization import (extract_decoder_attention,
                                     render_sampling_points)

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    assert cfg.DATASETS.TYPE == "vis", "attention maps are a VIS-mode tool"

    dataset, num_classes = build_dataset("VAL", cfg)
    model = build_model(num_classes=num_classes, cfg=cfg)
    T = cfg.MODEL.DEVIS.NUM_FRAMES
    buckets = make_eval_buckets(cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)

    variables = None
    os.makedirs(args.out_dir, exist_ok=True)
    for vi in range(min(args.videos, len(dataset))):
        video = dataset[vi]
        frames = video.load_clip(0)
        h, w = frames.shape[1:3]
        Hc, Wc = pick_canvas(h, w, buckets)
        images = np.zeros((T, Hc, Wc, 3), np.float32)
        pad_mask = np.ones((T, Hc, Wc), bool)
        images[:, :h, :w] = frames
        pad_mask[:, :h, :w] = False
        if variables is None:
            # CPU-lowered trace must not touch Pallas: init on an explicit
            # impl='xla' template twin (identical param tree).
            init_model = build_model(num_classes=num_classes, cfg=cfg,
                                     impl="xla")
            variables = jax.jit(init_model.init, backend="cpu")(
                jax.random.PRNGKey(cfg.SEED), jnp.asarray(images),
                jnp.asarray(pad_mask), train=False)
            variables = load_initial_weights(cfg, model, variables)
        (out, res), inter = model.apply(
            variables, jnp.asarray(images), jnp.asarray(pad_mask),
            train=False, mutable=["intermediates"])
        loc, att = extract_decoder_attention(inter["intermediates"],
                                             layer=args.layer)
        res = jax.device_get(res)
        top_queries = np.asarray(res["query_top_k_indexes"])[:args.queries]
        mean = np.asarray([0.485, 0.456, 0.406])
        std = np.asarray([0.229, 0.224, 0.225])
        import cv2
        n_levels = loc.shape[3]
        for qi, q in enumerate(top_queries):
            for t in range(T):
                img = np.clip((frames[t] * std + mean) * 255, 0, 255)
                vis = render_sampling_points(img, loc, att, int(q), t)
                path = os.path.join(args.out_dir,
                                    f"v{video.video_id}_q{qi}_t{t}.jpg")
                cv2.imwrite(path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
                if args.per_level:
                    # reference att_maps_viz.py:208-818: one overlay per
                    # resolution level next to the merged one
                    for lvl in range(n_levels):
                        vis_l = render_sampling_points(img, loc, att,
                                                       int(q), t, level=lvl)
                        path_l = os.path.join(
                            args.out_dir,
                            f"v{video.video_id}_q{qi}_t{t}_lvl{lvl}.jpg")
                        cv2.imwrite(path_l,
                                    cv2.cvtColor(vis_l, cv2.COLOR_RGB2BGR))
        print(f"video {video.video_id}: wrote attention maps for "
              f"{len(top_queries)} queries to {args.out_dir}")


if __name__ == "__main__":
    main()
