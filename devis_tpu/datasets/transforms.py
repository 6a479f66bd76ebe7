"""Host-side image/clip transforms (numpy + cv2).

Functional equivalents of the reference transform libraries
(`src/datasets/coco_transforms.py`, `src/datasets/vis_transforms.py`): resize
with min-side/max-side rule, random horizontal flip, random sized crop,
photometric distortion, and normalization with cxcywh box conversion. Clip
variants draw the random parameters ONCE and apply them to all T frames
(reference vis_transforms.py `VISTransformsApplier`, L428).

A sample is a dict:
  image  (H, W, 3) float32 RGB in [0, 255]
  boxes  (N, 4) xyxy absolute (until Normalize)
  labels (N,)
  masks  (N, H, W) uint8
  valid  (N,) or (N,) per-frame lists for clips
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def get_size_with_aspect_ratio(image_size: Tuple[int, int], size: int,
                               max_size: Optional[int] = None) -> Tuple[int, int]:
    """min-side resize rule (reference coco_transforms.py:109-130)."""
    h, w = image_size
    if max_size is not None:
        min_original = float(min(h, w))
        max_original = float(max(h, w))
        if max_original / min_original * size > max_size:
            size = int(round(max_size * min_original / max_original))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


def resize_sample(sample: Dict, size: Tuple[int, int]) -> Dict:
    h, w = sample["image"].shape[:2]
    oh, ow = size
    image = cv2.resize(sample["image"], (ow, oh), interpolation=cv2.INTER_LINEAR)
    out = dict(sample, image=image)
    if "boxes" in sample and len(sample["boxes"]):
        scale = np.array([ow / w, oh / h, ow / w, oh / h], np.float32)
        out["boxes"] = sample["boxes"] * scale
    if "masks" in sample and len(sample["masks"]):
        masks = np.stack([cv2.resize(m.astype(np.uint8), (ow, oh),
                                     interpolation=cv2.INTER_NEAREST)
                          for m in sample["masks"]])
        out["masks"] = masks
    return out


def hflip_sample(sample: Dict) -> Dict:
    w = sample["image"].shape[1]
    out = dict(sample, image=sample["image"][:, ::-1].copy())
    if "boxes" in sample and len(sample["boxes"]):
        b = sample["boxes"].copy()
        b[:, [0, 2]] = w - b[:, [2, 0]]
        out["boxes"] = b
    if "masks" in sample and len(sample["masks"]):
        out["masks"] = sample["masks"][:, :, ::-1].copy()
    return out


def crop_sample(sample: Dict, region: Tuple[int, int, int, int]) -> Dict:
    """region = (y0, x0, h, w). Boxes clamped; emptied instances invalidated
    (reference coco_transforms.py:22-76)."""
    y0, x0, h, w = region
    out = dict(sample, image=sample["image"][y0:y0 + h, x0:x0 + w].copy())
    if "boxes" in sample and len(sample["boxes"]):
        b = sample["boxes"] - np.array([x0, y0, x0, y0], np.float32)
        b[:, 0::2] = np.clip(b[:, 0::2], 0, w)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
        out["boxes"] = b
    if "masks" in sample and len(sample["masks"]):
        out["masks"] = sample["masks"][:, y0:y0 + h, x0:x0 + w].copy()
    if "valid" in sample and "masks" in out and len(out.get("masks", [])):
        keep = out["masks"].reshape(len(out["masks"]), -1).sum(1) > 0
        out["valid"] = np.logical_and(sample["valid"], keep)
    return out


# channel permutations for lighting noise (reference coco_transforms.py:336-347)
_LIGHTING_PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
                   (2, 1, 0))


def photometric_distort(image: np.ndarray, rng: random.Random,
                        brightness_delta: float = 0.0,
                        contrast: Tuple[float, float] = (0.5, 1.3),
                        contrast_post: Tuple[float, float] = (0.5, 1.5),
                        saturation: Tuple[float, float] = (0.7, 1.3),
                        hue_delta: float = 8.0,
                        lighting_noise: bool = True) -> np.ndarray:
    """Photometric distortion matching the reference's `VISPhotometricDistort`
    (`vis_transforms.py:348-376`) / `PhotometricDistort`
    (`coco_transforms.py:283-402`): optional brightness shift, random contrast
    applied either BEFORE or AFTER the HSV chain (one coin flip), saturation
    scale + hue rotation in float HSV space, and lighting noise = a random
    channel permutation. Defaults are the VIS recipe's parameters."""
    img = image.astype(np.float32)
    if brightness_delta and rng.random() < 0.5:
        img += rng.uniform(-brightness_delta, brightness_delta)

    # The reference's pre-HSV contrast uses the recipe's upper bound, the
    # post-HSV one the default 1.5 (vis_transforms.py:350-357).
    contrast_first = rng.random() < 0.5
    if contrast_first and rng.random() < 0.5:
        img *= rng.uniform(contrast[0], contrast[1])

    # float32 HSV: H in [0, 360), S scale-invariant — matches the reference's
    # float-image cv2 conversions (hue delta is in degrees).
    hsv = cv2.cvtColor(np.clip(img, 0, 255) / 255.0, cv2.COLOR_RGB2HSV)
    if rng.random() < 0.5:
        hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(*saturation), 0, 1)
    if rng.random() < 0.5:
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 360
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB) * 255.0

    if not contrast_first and rng.random() < 0.5:
        img *= rng.uniform(*contrast_post)

    if lighting_noise and rng.random() < 0.5:
        perm = _LIGHTING_PERMS[rng.randrange(len(_LIGHTING_PERMS))]
        img = img[:, :, perm]
    return np.clip(img, 0, 255)


def random_erasing_sample(sample: Dict, rng: random.Random, p: float = 0.5,
                          scale: Tuple[float, float] = (0.02, 0.33),
                          ratio: Tuple[float, float] = (0.3, 3.3),
                          value: float = 0.0,
                          drop_overlap: float = 0.7) -> Dict:
    """RandomErasing (reference coco_transforms.py:569-608, available in the
    reference library but not wired into its recipes): erase a random
    rectangle and drop instances whose box overlaps the erased region by more
    than `drop_overlap` of their area (marked invalid here — static shapes)."""
    if rng.random() >= p:
        return sample
    img = sample["image"]
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        eh = int(round(np.sqrt(target_area * aspect)))
        ew = int(round(np.sqrt(target_area / aspect)))
        if eh < h and ew < w:
            y0 = rng.randint(0, h - eh)
            x0 = rng.randint(0, w - ew)
            break
    else:
        return sample
    out_img = img.copy()
    out_img[y0:y0 + eh, x0:x0 + ew] = value
    out = dict(sample, image=out_img)
    if "boxes" in sample and len(sample["boxes"]):
        b = sample["boxes"]
        ix = (np.minimum(b[:, 2], x0 + ew) - np.maximum(b[:, 0], x0)).clip(min=0)
        iy = (np.minimum(b[:, 3], y0 + eh) - np.maximum(b[:, 1], y0)).clip(min=0)
        inter = ix * iy
        box_area = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])).clip(min=1e-9)
        keep = inter <= drop_overlap * box_area
        if "valid" in sample:
            out["valid"] = np.logical_and(sample["valid"], keep)
    return out


def normalize_sample(sample: Dict) -> Dict:
    """/255, imagenet-normalize; boxes → normalized cxcywh
    (reference coco_transforms.py:640+)."""
    image = sample["image"].astype(np.float32) / 255.0
    image = (image - IMAGENET_MEAN) / IMAGENET_STD
    out = dict(sample, image=image)
    h, w = image.shape[:2]
    if "boxes" in sample and len(sample["boxes"]):
        b = sample["boxes"].astype(np.float32)
        cxcywh = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                           b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1)
        cxcywh /= np.array([w, h, w, h], np.float32)
        out["boxes"] = cxcywh
    return out


# ---------------------------------------------------------------------------
# Clip-level application: one random draw for all T frames
# ---------------------------------------------------------------------------

class ClipTransform:
    """Random multi-scale resize + hflip + optional crop + photometric
    distortion, consistent across the clip; then normalize."""

    def __init__(self, scales: Sequence[int], max_size: int = 768,
                 flip_prob: float = 0.5,
                 scales_before_crop: Sequence[int] = (400, 500, 600),
                 crop_size: Optional[Tuple[int, int]] = (384, 600),
                 crop_prob: float = 0.5,
                 photometric: bool = True,
                 create_bbx_from_mask: bool = True,
                 seed: Optional[int] = None):
        self.scales = list(scales)
        self.max_size = max_size
        self.flip_prob = flip_prob
        self.scales_before_crop = list(scales_before_crop)
        self.crop_size = crop_size
        self.crop_prob = crop_prob
        self.photometric = photometric
        self.create_bbx_from_mask = create_bbx_from_mask
        self.rng = random.Random(seed)

    def __call__(self, frames: List[Dict]) -> List[Dict]:
        rng = self.rng
        do_flip = rng.random() < self.flip_prob
        do_crop = self.crop_size is not None and rng.random() < self.crop_prob
        scale = rng.choice(self.scales)

        if do_flip:
            frames = [hflip_sample(f) for f in frames]
        if do_crop:
            pre = rng.choice(self.scales_before_crop)
            frames = [resize_sample(f, get_size_with_aspect_ratio(
                f["image"].shape[:2], pre)) for f in frames]
            h, w = frames[0]["image"].shape[:2]
            ch = rng.randint(self.crop_size[0], min(h, self.crop_size[1]))
            cw = rng.randint(self.crop_size[0], min(w, self.crop_size[1]))
            ch, cw = min(ch, h), min(cw, w)
            y0 = rng.randint(0, h - ch)
            x0 = rng.randint(0, w - cw)
            frames = [crop_sample(f, (y0, x0, ch, cw)) for f in frames]
        frames = [resize_sample(f, get_size_with_aspect_ratio(
            f["image"].shape[:2], scale, self.max_size)) for f in frames]
        if self.photometric:
            # One random draw shared by every frame (clip consistency); the
            # per-op probabilities live inside photometric_distort, so no
            # outer gate (reference applies VISPhotometricDistort
            # unconditionally, vis.py:241).
            seed = rng.random()
            for f in frames:
                f["image"] = photometric_distort(f["image"], random.Random(seed))
        out = []
        for f in frames:
            if self.create_bbx_from_mask and len(f.get("masks", [])):
                f = dict(f, boxes=boxes_from_masks(f["masks"]))
            out.append(normalize_sample(f))
        return out


def boxes_from_masks(masks: np.ndarray) -> np.ndarray:
    """Recompute xyxy boxes from masks (reference vis_transforms.py:197-242)."""
    out = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out


class ValTransform:
    """Deterministic min/max-side resize + normalize.

    With `normalize=False` the resized image is returned as raw uint8 — the
    imagenet normalization then runs ON DEVICE inside the jitted forward
    (`inference.VISInferFn`), quartering the host→device image payload."""

    def __init__(self, min_size: int, max_size: int, normalize: bool = True):
        self.min_size = min_size
        self.max_size = max_size
        self.normalize = normalize

    def __call__(self, image: np.ndarray) -> np.ndarray:
        oh, ow = get_size_with_aspect_ratio(image.shape[:2], self.min_size,
                                            self.max_size)
        image = cv2.resize(image, (ow, oh), interpolation=cv2.INTER_LINEAR)
        if not self.normalize:
            return np.ascontiguousarray(image, np.uint8)
        return normalize_sample({"image": image})["image"]
