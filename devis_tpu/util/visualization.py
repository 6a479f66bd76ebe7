"""Result visualization: track overlays and attention-map rendering.

Counterpart of the reference's `src/util/viz_utils.py:153-353` (per-clip /
merged track overlays) and `src/util/att_maps_viz.py:208-818` (decoder
sampling-point scatter), re-done with cv2 only.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from ..evaluation import rle as rle_lib

_COLORS = np.array(
    [[244, 67, 54], [33, 150, 243], [76, 175, 80], [255, 193, 7],
     [156, 39, 176], [0, 188, 212], [255, 87, 34], [63, 81, 181],
     [139, 195, 74], [233, 30, 99], [0, 150, 136], [121, 85, 72]],
    np.float32)


def color_for(track_id: int) -> np.ndarray:
    return _COLORS[track_id % len(_COLORS)]


def overlay_tracks_on_frame(frame: np.ndarray, results: List[Dict], t: int,
                            cat_names: Optional[Dict[int, str]] = None,
                            alpha: float = 0.45,
                            score_threshold: float = 0.0) -> np.ndarray:
    """Draw every track's mask + label for frame `t` of a video.

    frame: (H, W, 3) uint8 RGB; results: tracker output records
    ({video_id, score, category_id, segmentations})."""
    out = frame.astype(np.float32).copy()
    boxes = []
    for tid, rec in enumerate(results):
        if rec.get("score", 1.0) < score_threshold:
            continue
        seg = rec["segmentations"][t] if t < len(rec["segmentations"]) else None
        if not seg:
            continue
        mask = rle_lib.decode(seg).astype(bool)
        color = color_for(tid)
        out[mask] = (1 - alpha) * out[mask] + alpha * color
        ys, xs = np.nonzero(mask)
        if len(ys):
            name = (cat_names or {}).get(rec.get("category_id", 0),
                                         str(rec.get("category_id", "?")))
            label = f"{tid}:{name} {rec.get('score', 0):.2f}"
            boxes.append((int(xs.min()), int(ys.min()), int(xs.max()),
                          int(ys.max()), color, label))
    out = np.ascontiguousarray(np.clip(out, 0, 255).astype(np.uint8))
    for x0, y0, x1, y1, color, label in boxes:
        cv2.rectangle(out, (x0, y0), (x1, y1), color.tolist(), 1)
        cv2.putText(out, label, (x0, max(y0 - 3, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, color.tolist(), 1,
                    cv2.LINE_AA)
    return out


def save_video_visualization(video, results: List[Dict], out_dir: str,
                             cat_names: Optional[Dict[int, str]] = None,
                             score_threshold: float = 0.1) -> List[str]:
    """Render every frame of a `VideoClips` video with its final tracks
    (reference viz_utils 'merged tracks' mode). Returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t, name in enumerate(video.file_names):
        img = cv2.imread(os.path.join(video.images_folder, name))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        vis = overlay_tracks_on_frame(img, results, t, cat_names,
                                      score_threshold=score_threshold)
        path = os.path.join(out_dir, f"{video.video_id}_{t:04d}.jpg")
        cv2.imwrite(path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        paths.append(path)
    return paths


def render_sampling_points(frame: np.ndarray,
                           sampling_locations: np.ndarray,
                           attention_weights: np.ndarray,
                           query_idx: int, frame_idx: int,
                           level_colors: bool = True) -> np.ndarray:
    """Scatter one query's deformable sampling points over a frame
    (reference att_maps_viz.py: per-level colored points, size ∝ weight).

    sampling_locations: (T, Lq, M, L, P, 2) normalized; attention_weights:
    (T, Lq, M, L, P)."""
    out = np.ascontiguousarray(np.clip(frame, 0, 255).astype(np.uint8))
    h, w = frame.shape[:2]
    loc = np.asarray(sampling_locations)[frame_idx, query_idx]   # (M, L, P, 2)
    att = np.asarray(attention_weights)[frame_idx, query_idx]    # (M, L, P)
    M, L, P, _ = loc.shape
    amax = max(att.max(), 1e-6)
    for m in range(M):
        for lvl in range(L):
            color = _COLORS[(lvl if level_colors else m) % len(_COLORS)]
            for p in range(P):
                x = int(np.clip(loc[m, lvl, p, 0], 0, 1) * (w - 1))
                y = int(np.clip(loc[m, lvl, p, 1], 0, 1) * (h - 1))
                r = max(1, int(round(4 * att[m, lvl, p] / amax)))
                cv2.circle(out, (x, y), r, color.tolist(), -1)
    return out


def extract_decoder_attention(intermediates: Dict, layer: int = -1):
    """Pull the decoder cross-attention capture out of a flax
    `mutable=['intermediates']` tree (sown by TemporalMSDeformAttnDecoder).

    Returns (sampling_locations (T, Lq, M, L, P, 2),
             attention_weights (T, Lq, M, L, P)) for the requested layer."""
    layers = []

    def walk(tree, path=()):
        if isinstance(tree, dict):
            if "viz_sampling_locations" in tree:
                layers.append((path, tree))
            for k, v in tree.items():
                walk(v, path + (k,))

    walk(intermediates)
    layers.sort(key=lambda kv: kv[0])
    _, node = layers[layer]
    loc = np.asarray(node["viz_sampling_locations"][0])
    att = np.asarray(node["viz_attention_weights"][0])
    # (T, Lq, M, L, P, 2) — attention module runs frames as batch
    return loc, att


def visualize_dataset_sample(sample: Dict, out_dir: str, idx: int = 0,
                             mean=(0.485, 0.456, 0.406),
                             std=(0.229, 0.224, 0.225)) -> List[str]:
    """Render an augmented train clip with its GT (reference
    visualize_dataset.py): un-normalize images, draw GT masks/boxes."""
    os.makedirs(out_dir, exist_ok=True)
    images = sample["images"]                          # (T, H, W, 3) normalized
    T = images.shape[0]
    h, w = images.shape[1:3]
    paths = []
    for t in range(T):
        img = (images[t] * np.asarray(std) + np.asarray(mean)) * 255.0
        img = np.clip(img, 0, 255).astype(np.float32)
        for n in range(len(sample["labels"])):
            if not sample["valid"][n, t]:
                continue
            color = color_for(n)
            mask = sample["masks"][n, t].astype(bool)
            img[mask] = 0.55 * img[mask] + 0.45 * color
        img = np.ascontiguousarray(img.astype(np.uint8))
        for n in range(len(sample["labels"])):
            if not sample["valid"][n, t]:
                continue
            color = color_for(n)
            cx, cy, bw, bh = sample["boxes"][n, t]
            x0, y0 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x1, y1 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            cv2.rectangle(img, (x0, y0), (x1, y1), color.tolist(), 1)
            cv2.putText(img, str(int(sample["labels"][n])),
                        (x0, max(y0 - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color.tolist(), 1)
        path = os.path.join(out_dir, f"sample{idx}_t{t}.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(path)
    return paths
