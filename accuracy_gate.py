"""Accuracy gate: one command that reproduces the reference eval table.

Given a checkpoint and a data path, this script runs the full evaluation
pipeline — torch→flax conversion (incl. cross-model weight adaptation),
banded-DCNv2 coverage audit, COCO/VIS eval loop — and compares the result
against the reference's published numbers (BASELINE.md; reference sources
`/root/reference/README.md:19-73`, `/root/reference/docs/TRAIN.md:22-36`).
Exit code 0 iff every metric lands within `--tolerance` (default 0.3 AP,
the BASELINE.json contract).

Usage:
    # real weights + data (the actual gate):
    python accuracy_gate.py yt21_r50 --weights devis_yt21_r50.pth \
        --data-path /data/ytvis21
    python accuracy_gate.py coco_r50 --weights r50_mask_head.pth \
        --data-path /data/coco

    # executability proof without weights/data (runs in CI):
    python accuracy_gate.py --smoke

The smoke path builds a tiny model, synthesizes a torch-format *image-model*
checkpoint (the same format the reference releases), pushes it through the
exact production loading chain (`load_initial_weights`: shift_class_neurons
→ prefix_def_detr → adapt_weights_devis → torch_to_flax_variables), audits
band coverage, and evaluates on the synthetic VIS dataset — proving every
link of the gate is executable before real weights/data exist.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# name → (config, dataset override, expected metrics from BASELINE.md)
BENCHMARKS = {
    "coco_r50": ("configs/deformable_mask_head/deformable_mask_head_R_50.yaml",
                 None, {"box_AP": 46.3, "mask_AP": 38.0}),
    "coco_r101": ("configs/deformable_mask_head/deformable_mask_head_R_101.yaml",
                  None, {"box_AP": 47.9, "mask_AP": 39.9}),
    "coco_swinl": ("configs/deformable_mask_head/deformable_mask_head_SwinL.yaml",
                   None, {"box_AP": 54.6, "mask_AP": 45.2}),
    "yt19_r50": ("configs/devis/YT-19/devis_R_50_YT-19.yaml", None,
                 {"AP": 44.4, "AP50": 67.9, "AP75": 48.6}),
    "yt19_swinl": ("configs/devis/YT-19/devis_Swin_L_YT-19.yaml", None,
                   {"AP": 57.1, "AP50": 80.8, "AP75": 66.3}),
    "yt21_r50": ("configs/devis/YT-21/devis_R_50_YT-21.yaml", None,
                 {"AP": 43.1, "AP50": 66.8, "AP75": 46.6}),
    "yt21_swinl": ("configs/devis/YT-21/devis_Swin_L_YT-21.yaml", None,
                   {"AP": 54.4, "AP50": 77.7, "AP75": 59.8}),
    "ovis_r50": ("configs/devis/OVIS/devis_R_50_OVIS.yaml", None,
                 {"AP": 23.7, "AP50": 47.6, "AP75": 20.8}),
    "ovis_swinl": ("configs/devis/OVIS/devis_Swin_L_OVIS.yaml", None,
                   {"AP": 35.5, "AP50": 59.3, "AP75": 38.3}),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser("DeVIS-TPU accuracy gate")
    p.add_argument("benchmark", nargs="?", choices=sorted(BENCHMARKS),
                   help="reference eval-table row to reproduce")
    p.add_argument("--weights", default="",
                   help="checkpoint (.pth torch or orbax dir)")
    p.add_argument("--data-path", default="", help="DATASETS.DATA_PATH root")
    p.add_argument("--tolerance", type=float, default=0.3,
                   help="max |ours - reference| per metric (AP points)")
    p.add_argument("--coverage-floor", type=float, default=0.99,
                   help="min banded-DCNv2 covered_mass before auto-widening "
                        "guidance fires (docs/PERFORMANCE.md §Widening policy)")
    p.add_argument("--smoke", action="store_true",
                   help="synthetic executability proof (no weights/data)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="extra KEY VALUE config overrides")
    return p.parse_args(argv)


def audit_band_coverage(cfg, num_classes, variables, sample_batch,
                        floor: float) -> bool:
    """Run `band_coverage_report` on one real batch for EVERY MDC layer
    (docs/PERFORMANCE.md §Band-truncation risk: the widening policy's
    automatic check). Returns True iff all layers clear `floor`."""
    import jax

    from devis_tpu.models import build_model
    from devis_tpu.ops.deform_conv_banded import band_coverage_report

    if not cfg.MODEL.MASK_HEAD.USE_MDC:
        print("band-coverage audit: skipped (MASK_HEAD.USE_MDC=False)")
        return True

    # The audit twin runs impl='xla' (identical param tree; exact field
    # convs) so it works on any backend; the sow in
    # ModulatedDeformableConv captures each MDC layer's input.
    audit_model = build_model(num_classes=num_classes, cfg=cfg, impl="xla")
    images, pad_mask = sample_batch
    _, inter = audit_model.apply(variables, images, pad_mask, train=False,
                                 mutable=["intermediates"])

    def walk(tree, path=()):
        for k, v in tree.items():
            if k == "mdc_input":
                yield path, v[0]
            elif isinstance(v, dict):
                yield from walk(v, path + (k,))

    params = variables["params"]
    nc_x, nc_y = cfg.TPU.MASKHEAD_BAND_NCAND
    ok = True
    found = 0
    for path, x in walk(inter["intermediates"]):
        node = params
        for k in path:
            node = node[k]
        rep = band_coverage_report(
            x, node["offset_conv"]["kernel"], node["offset_conv"]["bias"],
            node["modulator_conv"]["kernel"], node["modulator_conv"]["bias"],
            padding=1, ncand=nc_x, ncand_y=nc_y)
        found += 1
        layer = "/".join(path)
        status = "ok" if rep["covered_mass"] >= floor else "LOW"
        print(f"band coverage {layer}: covered_mass="
              f"{rep['covered_mass']:.4f} p99_resid=({rep['p99_resid_y']:.2f},"
              f"{rep['p99_resid_x']:.2f}) [{status}]")
        if rep["covered_mass"] < floor:
            ok = False
    if not found:
        print("band-coverage audit: no MDC layers found")
    if not ok:
        print(f"band coverage below {floor}: widen TPU.MASKHEAD_BAND_NCAND "
              f"(current {list(cfg.TPU.MASKHEAD_BAND_NCAND)}; cost grows "
              "linearly in ncand_x*ncand_y) or set MODEL.MASK_HEAD.USE_MDC "
              "False / impl='xla' for the exact route "
              "(docs/PERFORMANCE.md §Widening policy)")
    return ok


def run_gate(cfg, expected, tolerance, coverage_floor,
             dataset_val=None, coverage_informational=False) -> int:
    """Build model, load weights through the production chain, audit band
    coverage, evaluate, compare. Returns a process exit code."""
    import jax
    import jax.numpy as jnp

    from devis_tpu.datasets import build_dataset, pick_canvas
    from devis_tpu.inference import (build_tracker, evaluate_coco,
                                     inference_vis, make_eval_buckets)
    from devis_tpu.main import load_initial_weights
    from devis_tpu.models import build_model

    is_vis = cfg.DATASETS.TYPE == "vis"
    if dataset_val is None:
        dataset_val, num_classes = build_dataset("VAL", cfg)
    else:
        dataset_val, num_classes = dataset_val

    model = build_model(num_classes=num_classes, cfg=cfg)
    T = cfg.MODEL.DEVIS.NUM_FRAMES if is_vis else 1
    dummy_imgs = jnp.zeros((T if is_vis else 2, 64, 64, 3), jnp.float32)
    dummy_mask = jnp.zeros(dummy_imgs.shape[:3], bool)
    init_model = build_model(num_classes=num_classes, cfg=cfg, impl="xla")
    variables = jax.jit(init_model.init, static_argnames=("train",),
                        backend="cpu")(jax.random.PRNGKey(cfg.SEED),
                                       dummy_imgs, dummy_mask, train=False)
    variables = load_initial_weights(cfg, model, variables)
    variables = jax.device_put(variables, jax.devices()[0])

    # --- band-coverage audit on one real val batch -------------------------
    buckets = make_eval_buckets(cfg.INPUT.MIN_SIZE_TEST,
                                cfg.INPUT.MAX_SIZE_TEST)
    if is_vis:
        video = dataset_val[0]
        frames = video.load_clip(0).astype(np.float32)
        if frames.max() > 2.0:                       # raw uint8-scale clip
            from devis_tpu.datasets.transforms import normalize_sample
            frames = np.stack([normalize_sample({"image": f})["image"]
                               for f in frames])
        t, h, w = frames.shape[:3]
        Hc, Wc = pick_canvas(h, w, buckets)
        images = np.zeros((t, Hc, Wc, 3), np.float32)
        images[:, :h, :w] = frames
        pad = np.ones((t, Hc, Wc), bool)
        pad[:, :h, :w] = False
    else:
        sample = dataset_val[0]
        img = sample["image"]
        h, w = img.shape[:2]
        Hc, Wc = pick_canvas(h, w, buckets)
        images = np.zeros((1, Hc, Wc, 3), np.float32)
        images[0, :h, :w] = img
        pad = np.ones((1, Hc, Wc), bool)
        pad[0, :h, :w] = False
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        cov_ok = audit_band_coverage(
            cfg, num_classes, jax.device_get(variables),
            (jnp.asarray(images), jnp.asarray(pad)), coverage_floor)

    # --- evaluation ---------------------------------------------------------
    got = {}
    if is_vis:
        tracker = build_tracker(cfg, model, variables)
        out = inference_vis(tracker, dataset_val, verbose=True)
        if "eval" not in out:
            print("dataset has no GT: gate needs a GT-bearing val split")
            return 2
        got = {k: float(v) for k, v in out["eval"].items()
               if isinstance(v, (int, float))}
    else:
        stats = evaluate_coco(model, variables, dataset_val, cfg)
        got["box_AP"] = float(stats["bbox"]["AP"])
        if "segm" in stats:
            got["mask_AP"] = float(stats["segm"]["AP"])

    # --- verdict -------------------------------------------------------------
    print("\n== accuracy gate ==")
    if coverage_informational and not cov_ok:
        # smoke mode: a LOW verdict on a random checkpoint is the audit
        # WORKING — what the smoke proves is that it ran.
        print("(coverage audit fired LOW on the synthetic random checkpoint "
              "— correct behavior, informational in smoke mode)")
        cov_ok = True
    rc = 0 if cov_ok else 1
    if expected is None:
        print(json.dumps(got))
        print("(smoke mode: no reference numbers to compare; "
              "gate path executed end-to-end)")
        return rc
    for k, ref in expected.items():
        ours = got.get(k)
        if ours is None:
            print(f"  {k:8s} reference {ref:5.1f}  ours MISSING        FAIL")
            rc = 1
            continue
        ok = abs(ours - ref) <= tolerance
        print(f"  {k:8s} reference {ref:5.1f}  ours {ours:5.1f}  "
              f"delta {ours - ref:+.2f}  {'PASS' if ok else 'FAIL'}")
        if not ok:
            rc = 1
    print("gate:", "PASS" if rc == 0 else "FAIL")
    return rc


def run_smoke() -> int:
    """Executability proof: synthetic checkpoint + synthetic data through
    the exact production gate path."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import torch

    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.datasets.synthetic import SyntheticVISValDataset
    from devis_tpu.models import build_model
    from devis_tpu.util.checkpoint import flax_variables_to_torch_keys

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__),
                                     "configs", "synthetic_smoke.yaml"))
    cfg.MODEL.MASK_HEAD.USE_MDC = True          # exercise the coverage audit

    # Synthesize the torch-format *image-model* checkpoint the reference
    # releases (COCO mask-head model): keys come from an image-mode twin of
    # the config, so `adapt_weights_devis` performs the real temporal
    # cloning/slicing surgery on load.
    img_cfg = cfg.clone()
    img_cfg.DATASETS.TYPE = "coco"
    img_cfg.MODEL.NUM_QUERIES = 60              # ÷ n_traj(12) → subsampling
    img_model = build_model(num_classes=91, cfg=img_cfg, impl="xla")
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    msk = jnp.zeros((2, 64, 64), bool)
    template = jax.eval_shape(img_model.init, jax.random.PRNGKey(0),
                              imgs, msk)
    torch_keys = flax_variables_to_torch_keys(template)
    rng = np.random.RandomState(0)

    def fake(k, s):
        v = (rng.randn(*s) * 0.02).astype(np.float32)
        if "running_var" in k:                 # variances must be positive
            v = np.abs(v) + 0.5
        if k.endswith((".weight",)) and len(s) == 1:
            v += 1.0                           # norm scales near identity
        return torch.from_numpy(v)

    state = {k: fake(k, s) for k, s in torch_keys.items()}

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "smoke_image_model.pth")
        torch.save({"model": state}, path)
        cfg.MODEL.WEIGHTS = path
        cfg.freeze()
        dataset = SyntheticVISValDataset(
            num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            stride=cfg.TEST.CLIP_TRACKING.STRIDE, n_videos=2, video_len=8,
            size=(96, 128), min_size=cfg.INPUT.MIN_SIZE_TEST,
            max_size=cfg.INPUT.MAX_SIZE_TEST)
        rc = run_gate(cfg, expected=None, tolerance=0.3, coverage_floor=0.99,
                      dataset_val=(dataset, 41), coverage_informational=True)
    print("smoke:", "PASS" if rc == 0 else "FAIL")
    return rc


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.smoke:
        return run_smoke()
    if not args.benchmark:
        print("usage: accuracy_gate.py BENCHMARK --weights W --data-path D "
              "| --smoke")
        return 2
    from devis_tpu.config import get_cfg_defaults, sanity_check
    config_file, _, expected = BENCHMARKS[args.benchmark]
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), config_file))
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    if args.data_path:
        cfg.DATASETS.DATA_PATH = args.data_path
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    sanity_check(cfg)
    return run_gate(cfg, expected, args.tolerance, args.coverage_floor)


if __name__ == "__main__":
    sys.exit(main())
