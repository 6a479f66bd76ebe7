"""Render augmented GT training clips — reference `visualize_dataset.py`.

Usage: python -m devis_tpu.visualize_dataset --config-file cfg.yaml \
           [--samples N] [--out-dir DIR] [KEY VALUE ...]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("visualize-dataset")
    p.add_argument("--config-file", default="")
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--out-dir", default="dataset_viz")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    from .config import get_cfg_defaults
    from .datasets import build_dataset
    from .util.visualization import visualize_dataset_sample

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    dataset, _ = build_dataset("TRAIN", cfg)
    for i in range(min(args.samples, len(dataset))):
        sample = dataset[i]
        if "images" not in sample:          # image dataset → fake 1-frame clip
            sample = {"images": sample["image"][None],
                      "labels": sample["labels"],
                      "boxes": sample["boxes"][:, None],
                      "masks": sample["masks"][:, None],
                      "valid": sample["valid"][:, None]}
        paths = visualize_dataset_sample(sample, args.out_dir, idx=i)
        print(f"sample {i}: wrote {len(paths)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
