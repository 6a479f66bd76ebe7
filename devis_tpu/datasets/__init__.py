"""Dataset dispatch + static-shape collation.

`build_dataset` mirrors the reference (`src/datasets/__init__.py:28-46`).
The collate helpers turn ragged host samples into the padded, fixed-capacity
device arrays the jitted model consumes (canvas-bucketed images, capped
instance slots with validity masks) — the TPU replacement for NestedTensor.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_canvas(h: int, w: int, buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest bucket that fits (h, w)."""
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return round_up(h, 64), round_up(w, 64)


def make_buckets(scales: Sequence[int], max_size: int) -> List[Tuple[int, int]]:
    """Two orientation buckets covering the multi-scale training range."""
    s = round_up(max(scales), 64)
    m = round_up(max_size, 64)
    return [(s, m), (m, s)] if m != s else [(s, s)]


def collate_images(samples: List[Dict], canvas: Tuple[int, int],
                   max_instances: int, mask_stride: int = 4) -> Dict:
    """Image batch → padded device arrays.

    Returns images (B, H, W, 3), pad_mask (B, H, W), targets with
    labels/boxes/valid padded to `max_instances` and masks at
    canvas/mask_stride resolution."""
    B = len(samples)
    H, W = canvas
    N = max_instances
    hm, wm = H // mask_stride, W // mask_stride
    images = np.zeros((B, H, W, 3), np.float32)
    pad_mask = np.ones((B, H, W), bool)
    labels = np.zeros((B, N), np.int32)
    boxes = np.full((B, N, 4), 0.5, np.float32)
    valid = np.zeros((B, N), bool)
    masks = np.zeros((B, N, hm, wm), np.float32)
    sizes = np.zeros((B, 2), np.int32)
    for b, s in enumerate(samples):
        h, w = s["image"].shape[:2]
        images[b, :h, :w] = s["image"]
        pad_mask[b, :h, :w] = False
        sizes[b] = (h, w)
        n = min(len(s["labels"]), N)
        if n:
            labels[b, :n] = s["labels"][:n]
            # Boxes stay normalized to the UN-PADDED image (the reference
            # convention: predictions live in image-normalized space and the
            # valid-ratio machinery maps them onto the padded canvas).
            boxes[b, :n] = s["boxes"][:n]
            valid[b, :n] = s["valid"][:n]
            if "masks" in s and len(s["masks"]):
                import cv2
                for i in range(n):
                    m = s["masks"][i].astype(np.float32)
                    mh, mw = round(h / mask_stride), round(w / mask_stride)
                    mh, mw = max(mh, 1), max(mw, 1)
                    small = cv2.resize(m, (mw, mh),
                                       interpolation=cv2.INTER_NEAREST)
                    masks[b, i, :mh, :mw] = small
    return {"images": images, "pad_mask": pad_mask, "sizes": sizes,
            "targets": {"labels": labels, "boxes": boxes, "valid": valid,
                        "masks": masks}}


def collate_clip(sample: Dict, canvas: Tuple[int, int], max_instances: int,
                 mask_stride: int = 4) -> Dict:
    """Single clip (VIS trains with batch 1) → padded device arrays."""
    T = sample["images"].shape[0]
    H, W = canvas
    N = max_instances
    hm, wm = H // mask_stride, W // mask_stride
    h, w = sample["images"].shape[1:3]
    images = np.zeros((T, H, W, 3), np.float32)
    pad_mask = np.ones((T, H, W), bool)
    images[:, :h, :w] = sample["images"]
    pad_mask[:, :h, :w] = False

    labels = np.zeros((N,), np.int32)
    boxes = np.full((N, T, 4), 0.5, np.float32)
    valid = np.zeros((N, T), bool)
    exists = np.zeros((N,), bool)
    masks = np.zeros((N, T, hm, wm), np.float32)
    n = min(len(sample["labels"]), N)
    if n:
        labels[:n] = sample["labels"][:n]
        boxes[:n] = sample["boxes"][:n]        # image-normalized (see above)
        valid[:n] = sample["valid"][:n]
        exists[:n] = sample["exists"][:n]
        import cv2
        mh, mw = max(round(h / mask_stride), 1), max(round(w / mask_stride), 1)
        for i in range(n):
            for t in range(T):
                small = cv2.resize(sample["masks"][i, t].astype(np.float32),
                                   (mw, mh), interpolation=cv2.INTER_NEAREST)
                masks[i, t, :mh, :mw] = small
    return {"images": images, "pad_mask": pad_mask, "sizes": np.asarray([h, w]),
            "targets": {"labels": labels, "boxes": boxes, "valid": valid,
                        "exists": exists, "masks": masks}}


class TrainLoader:
    """Host-side batching loader with static-shape collation.

    Replaces the reference's torch DataLoader + DistributedSampler
    (`main.py:142-158`): each epoch yields device-ready padded batches.
    Images are bucketed to a small static canvas set so jit compiles once
    per bucket (the TPU replacement for ragged NestedTensor batches).
    Background prefetch (one worker thread) overlaps host decode/augment
    with device steps.
    """

    def __init__(self, dataset, batch_size: int, vis: bool,
                 buckets: Sequence[Tuple[int, int]], max_instances: int = 25,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.vis = vis
        self.buckets = list(buckets)
        self.max_instances = max_instances
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch(self, idxs) -> Dict:
        if self.vis:
            samples = [self.dataset[i] for i in idxs]
            # one canvas per batch: the largest bucket needed by any member
            hw = [(s["images"].shape[1], s["images"].shape[2]) for s in samples]
            canvas = pick_canvas(max(h for h, _ in hw), max(w for _, w in hw),
                                 self.buckets)
            clips = [collate_clip(s, canvas, self.max_instances)
                     for s in samples]
            return {k: np.stack([c[k] for c in clips]) if not isinstance(
                        clips[0][k], dict)
                    else {kk: np.stack([c[k][kk] for c in clips])
                          for kk in clips[0][k]}
                    for k in clips[0]}
        samples = [self.dataset[i] for i in idxs]
        hw = [s["image"].shape[:2] for s in samples]
        canvas = pick_canvas(max(h for h, _ in hw), max(w for _, w in hw),
                             self.buckets)
        return collate_images(samples, canvas, self.max_instances)

    def __iter__(self):
        import queue
        import threading
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._batch(b))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item


def build_dataset(image_set: str, cfg):
    """Returns (dataset, num_classes) (reference datasets/__init__.py:28-46)."""
    if cfg.DATASETS.TYPE == "vis":
        from .vis import build_vis
        return build_vis(image_set, cfg)
    if cfg.DATASETS.TYPE == "coco_panoptic":
        from .coco_panoptic import build_coco_panoptic
        return build_coco_panoptic(image_set, cfg)
    from .coco import build_coco
    return build_coco(image_set, cfg)
