"""Box utilities in jax.numpy.

Functional equivalents of the reference's `src/util/box_ops.py` (cxcywh/xyxy
conversions, IoU / generalized IoU, batched multi-frame variants, masks→boxes).
All functions are jit-compatible and operate on float arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (..., 4) -> (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M) iou, union."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / jnp.clip(union, 1e-9, None)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) between xyxy boxes -> (N, M)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-9, None)


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU between equal-shaped (..., 4) xyxy boxes -> (...)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.clip(union, 1e-9, None)
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.clip(area_c, 1e-9, None)


def multi_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Broadcasted IoU over leading dims (reference: box_ops.py:21-31).

    boxes1: (..., T, 4), boxes2: (..., T, 4) broadcastable; returns (..., T).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.clip(union, 1e-9, None)
    return iou, union


def multi_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Broadcasted GIoU over leading dims (reference: box_ops.py:34-44)."""
    iou, union = multi_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-9, None)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks (N, H, W) -> (N, 4).

    Empty masks produce zero boxes (reference: box_ops.py:101-124).
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    any_mask = m.sum(axis=(1, 2)) > 0
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    boxes = jnp.stack([x_min, y_min, x_max + 1, y_max + 1], axis=-1)
    return jnp.where(any_mask[:, None], boxes, jnp.zeros_like(boxes))


def nms(boxes: jnp.ndarray, scores: jnp.ndarray,
        iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy non-maximum suppression (reference box_ops.py:127).

    boxes: (N, 4) xyxy; scores: (N,). Returns a boolean keep mask (static
    shape — jit-friendly; callers index host-side where needed)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou_mat = box_iou(boxes_sorted, boxes_sorted)[0]

    def body(i, keep):
        # suppress j > i overlapping a kept i
        suppress = (iou_mat[i] > iou_threshold) & \
            (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    # un-sort back to input order
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    return keep[inv]
