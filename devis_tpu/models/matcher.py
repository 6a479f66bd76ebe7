"""Hungarian matching (training-time), TPU-native formulation.

Reimplements `src/models/matcher.py:17-226`. Cost matrices are computed on
device inside jit; the linear sum assignment runs host-side through
`jax.pure_callback` (the reference also runs scipy's LSA on CPU,
matcher.py:106/210). Targets are padded to a static capacity with validity
masks, so every shape is static:

  * image targets:  labels (B, N), boxes (B, N, 4), valid (B, N)
  * clip targets:   labels (N,), boxes (N, T, 4), valid (N, T) — per-trajectory

The match is returned *target-aligned*: ``src_idx[b, n]`` is the query matched
to target slot ``n`` (undefined where ``valid`` is False). This padded
formulation replaces the reference's variable-length index tuples and plays
the role of its `(index_i, index_j, index_valid)` triples (matcher.py:108-119).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hungarian import lsa_batched
from ..util import box_ops

BIG_COST = 1e5


def run_lsa(cost: jnp.ndarray, valid_cols: jnp.ndarray) -> jnp.ndarray:
    """Exact assignment fully on device (see ops/hungarian.py — the axon TPU
    runtime has no host callbacks, and the jittable solver avoids the
    device→host bounce the reference pays at matcher.py:106/210).

    cost: (B, Q, N); invalid target columns are neutralized with a constant
    BIG cost (their assignment is arbitrary and masked out downstream).
    Returns target-aligned query indices (B, N)."""
    B, Q, N = cost.shape
    cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)
    cost = jnp.where(valid_cols[:, None, :], cost, BIG_COST)
    # rows must be the smaller side: rows = targets, cols = queries.
    return lsa_batched(jnp.transpose(cost, (0, 2, 1)))


def focal_class_cost(out_prob: jnp.ndarray, alpha: float = 0.25,
                     gamma: float = 2.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Positive/negative focal classification costs (reference L188-192)."""
    neg = (1 - alpha) * (out_prob ** gamma) * (-jnp.log(1 - out_prob + 1e-8))
    pos = alpha * ((1 - out_prob) ** gamma) * (-jnp.log(out_prob + 1e-8))
    return pos, neg


def hungarian_match_image(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                          tgt_labels: jnp.ndarray, tgt_boxes: jnp.ndarray,
                          tgt_valid: jnp.ndarray,
                          cost_class: float = 2.0, cost_bbox: float = 5.0,
                          cost_giou: float = 2.0, focal_loss: bool = True,
                          focal_alpha: float = 0.25) -> jnp.ndarray:
    """Image-level matcher (reference HungarianMatcher, matcher.py:124-212).

    Returns src_idx (B, N): query matched to each target slot."""
    B, Q, K = pred_logits.shape
    N = tgt_labels.shape[1]
    safe_labels = jnp.clip(tgt_labels, 0, K - 1)

    if focal_loss:
        prob = jax.nn.sigmoid(pred_logits)
        pos, neg = focal_class_cost(prob, focal_alpha)
        # (B, Q, N): cost at each target's label
        cls = (jnp.take_along_axis(pos, safe_labels[:, None, :], axis=2)
               - jnp.take_along_axis(neg, safe_labels[:, None, :], axis=2))
    else:
        prob = jax.nn.softmax(pred_logits, axis=-1)
        cls = -jnp.take_along_axis(prob, safe_labels[:, None, :], axis=2)

    l1 = jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]).sum(-1)
    giou = -box_ops.multi_giou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes)[:, :, None, :],
        box_ops.box_cxcywh_to_xyxy(tgt_boxes)[:, None, :, :])

    cost = cost_bbox * l1 + cost_class * cls + cost_giou * giou
    return run_lsa(cost, tgt_valid)


def hungarian_match_clip(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                         tgt_labels: jnp.ndarray, tgt_boxes: jnp.ndarray,
                         tgt_valid: jnp.ndarray, num_frames: int,
                         cost_class: float = 2.0, cost_bbox: float = 5.0,
                         cost_giou: float = 2.0, focal_alpha: float = 0.25,
                         use_l1_distance_sum: bool = False) -> jnp.ndarray:
    """Clip-level trajectory matcher (reference DeVISHungarianMatcher, L17-121).

    pred_logits/pred_boxes: (1, T*Nq, ·) frame-major (frame t queries at
    t*Nq..(t+1)*Nq). tgt_labels: (N,), tgt_boxes: (N, T, 4), tgt_valid: (N, T).
    Costs are averaged over frames per trajectory. Returns traj_idx (N,):
    the query-trajectory matched to each target-trajectory slot.
    """
    T = num_frames
    _, TQ, K = pred_logits.shape
    Nq = TQ // T
    N = tgt_labels.shape[0]
    logits = pred_logits[0].reshape(T, Nq, K)
    boxes = pred_boxes[0].reshape(T, Nq, 4)
    safe_labels = jnp.clip(tgt_labels, 0, K - 1)

    prob = jax.nn.sigmoid(logits)                        # (T, Nq, K)
    pos, neg = focal_class_cost(prob, focal_alpha)
    cls_cost = pos - neg                                 # (T, Nq, K)
    # (Nq, N): mean over frames of cost at the trajectory's label
    cls = cls_cost[:, :, safe_labels].mean(axis=0)

    # boxes: (T, Nq, 4) vs (N, T, 4)
    diff = jnp.abs(boxes[:, :, None, :] - jnp.transpose(tgt_boxes, (1, 0, 2))[:, None])
    if use_l1_distance_sum:
        l1 = diff.sum(-1).mean(0)                        # cdist(p=1) then frame mean
    else:
        l1 = diff.mean((0, -1))                          # mean over frames & coords
    giou = -box_ops.multi_giou(
        box_ops.box_cxcywh_to_xyxy(boxes)[:, :, None, :],
        box_ops.box_cxcywh_to_xyxy(jnp.transpose(tgt_boxes, (1, 0, 2)))[:, None]
    ).mean(axis=0)                                       # (Nq, N)

    cost = cost_class * cls + cost_bbox * l1 + cost_giou * giou   # (Nq, N)
    traj_valid = tgt_valid.any(axis=1)
    return run_lsa(cost[None], traj_valid[None])[0]      # (N,)
