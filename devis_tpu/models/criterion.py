"""Set-prediction losses (focal classification, L1+GIoU boxes, focal+dice masks).

Reimplements `src/models/criterion.py:24-300` in a fully-masked, static-shape
formulation: targets are padded to capacity with validity masks, matches are
target-aligned index arrays (see matcher.py), and every loss is a masked
reduction — no boolean indexing, so everything jits.

Reference semantics preserved exactly:
  * classification: sigmoid focal over num_classes+1 logits where the
    "no-object" logit is a positive class for unmatched queries
    (criterion.py:121-130); loss scaled by num_queries.
  * DeVIS validity handling: label loss only on valid (trajectory, frame)
    pairs; box/mask losses on ALL frames of matched trajectories
    (criterion.py:143-150/174-180).
  * num_boxes normalization all-reduced across data-parallel devices
    (criterion.py:222-226) — here a lax.psum when inside pmap/shard_map.
  * aux-loss weighting table AUX_LOSS_WEIGHTING_COEF (criterion.py:14-21).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear
from ..util import box_ops
from . import matcher as matcher_lib

AUX_LOSS_WEIGHTING_COEF = {5: 1 / 2, 4: 5 / 30, 3: 4 / 30, 2: 3 / 30,
                           1: 2 / 30, 0: 1 / 30}


def sigmoid_focal_loss(inputs, targets, num_boxes, alpha: float = 0.25,
                       gamma: float = 2.0, valid=None):
    """Focal loss, `mean(1).sum()/num_boxes` reduction (reference
    deformable_segmentation.py:401-428). inputs/targets: (N, ...)."""
    prob = jax.nn.sigmoid(inputs)
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    # torch reduction `loss.mean(1).sum()`: mean over axis 1 ONLY, sum the rest.
    loss = loss.mean(axis=1).reshape(loss.shape[0], -1).sum(axis=1)
    if valid is not None:
        loss = loss * valid
    return loss.sum() / num_boxes


def dice_loss(inputs, targets, num_boxes, valid=None):
    """Dice loss (reference deformable_segmentation.py:383-398)."""
    inputs = jax.nn.sigmoid(inputs).reshape(inputs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2 * (inputs * targets).sum(axis=1)
    denominator = inputs.sum(axis=1) + targets.sum(axis=1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if valid is not None:
        loss = loss * valid
    return loss.sum() / num_boxes


def reduce_num_boxes(count: jnp.ndarray, axis_name: Optional[str] = None):
    """All-reduce the target count across data-parallel devices and clamp."""
    count = count.astype(jnp.float32)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name) / jax.lax.psum(1.0, axis_name)
    return jnp.clip(count, 1.0, None)


# ---------------------------------------------------------------------------
# Image (COCO) criterion
# ---------------------------------------------------------------------------

def image_losses(outputs: Dict, targets: Dict, src_idx: jnp.ndarray,
                 num_boxes, num_classes: int, focal_alpha: float = 0.25,
                 compute_masks: bool = False) -> Dict[str, jnp.ndarray]:
    """Losses for one output level of the image model.

    targets: labels (B, N), boxes (B, N, 4), valid (B, N)
             [+ masks (B, N, H, W) when compute_masks].
    src_idx: (B, N) matched query per target slot.
    outputs['pred_masks'] when compute_masks: (B, N, h, w) target-slot-aligned.
    """
    logits = outputs["pred_logits"]                      # (B, Q, K+1)
    B, Q, Kp1 = logits.shape
    labels, boxes, valid = targets["labels"], targets["boxes"], targets["valid"]

    # --- classification (focal) ---
    # Scatter matched labels into a (B, Q) class map. Background = index Kp1,
    # which lands in the DROPPED one-hot column (the reference fills
    # `self.num_classes`, which equals its logit count — criterion.py:121-128 —
    # so background rows are all-zero targets).
    scatter_rows = jnp.where(valid, src_idx, Q)          # invalid -> dropped
    target_classes = jnp.full((B, Q + 1), Kp1, dtype=jnp.int32)
    target_classes = jax.vmap(
        lambda tc, rows, lab: tc.at[rows].set(lab, mode="drop"))(
        target_classes, scatter_rows, labels)[:, :Q]
    onehot = jax.nn.one_hot(target_classes, Kp1 + 1)[..., :-1]   # (B, Q, K+1)
    loss_ce = sigmoid_focal_loss(logits, onehot.astype(logits.dtype), num_boxes,
                                 alpha=focal_alpha) * Q

    # class_error on matched predictions (reference criterion.py:134)
    matched_logits = jnp.take_along_axis(
        logits, src_idx[..., None], axis=1)              # (B, N, K+1)
    correct = (jnp.argmax(matched_logits, -1) == labels) & valid
    n_valid = jnp.clip(valid.sum(), 1, None)
    class_error = 100.0 * (1.0 - correct.sum() / n_valid)

    # --- boxes ---
    src_boxes = jnp.take_along_axis(outputs["pred_boxes"], src_idx[..., None],
                                    axis=1)              # (B, N, 4)
    vmask = valid.astype(jnp.float32)
    l1 = jnp.abs(src_boxes - boxes).sum(-1) * vmask
    loss_bbox = l1.sum() / num_boxes
    giou = box_ops.elementwise_generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(src_boxes), box_ops.box_cxcywh_to_xyxy(boxes))
    loss_giou = ((1 - giou) * vmask).sum() / num_boxes

    losses = {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
              "loss_giou": loss_giou, "class_error": class_error}

    # --- masks ---
    if compute_masks and "pred_masks" in outputs:
        src_masks = outputs["pred_masks"]                # (B, N, h, w)
        tgt_masks = targets["masks"].astype(jnp.float32)
        Bm, Nm = src_masks.shape[:2]
        up = resize_bilinear(src_masks[..., None],
                             tgt_masks.shape[-2:])[..., 0]
        up = up.reshape(Bm * Nm, -1)
        tm = tgt_masks.reshape(Bm * Nm, -1)
        vm = valid.reshape(Bm * Nm).astype(jnp.float32)
        losses["loss_mask"] = sigmoid_focal_loss(up, tm, num_boxes, valid=vm)
        losses["loss_dice"] = dice_loss(up, tm, num_boxes, valid=vm)
    return losses


def image_criterion(outputs: Dict, targets: Dict, num_classes: int,
                    matcher_cfg: Dict, focal_alpha: float = 0.25,
                    axis_name: Optional[str] = None,
                    mask_on: bool = False) -> Dict[str, jnp.ndarray]:
    """Full criterion over final + aux outputs (reference criterion.py:208-252)."""
    num_boxes = reduce_num_boxes(targets["valid"].sum(), axis_name)

    def match(out):
        return matcher_lib.hungarian_match_image(
            out["pred_logits"], out["pred_boxes"], targets["labels"],
            targets["boxes"], targets["valid"], **matcher_cfg)

    src_idx = outputs.get("indices")
    if src_idx is None:
        src_idx = match(outputs)
    losses = image_losses(outputs, targets, src_idx, num_boxes, num_classes,
                          focal_alpha, compute_masks=mask_on)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_idx = aux.get("indices")
        if aux_idx is None:
            aux_idx = match(aux)
        l = image_losses(aux, targets, aux_idx, num_boxes, num_classes,
                         focal_alpha, compute_masks="pred_masks" in aux)
        l.pop("class_error", None)
        losses.update({f"{k}_{i}": v for k, v in l.items()})
    return losses


# ---------------------------------------------------------------------------
# DeVIS (clip) criterion
# ---------------------------------------------------------------------------

def clip_losses(outputs: Dict, targets: Dict, traj_idx: jnp.ndarray,
                num_boxes, num_classes: int, num_frames: int,
                focal_alpha: float = 0.25,
                compute_masks: bool = False) -> Dict[str, jnp.ndarray]:
    """Losses for one output level of the clip model.

    targets: labels (N,), boxes (N, T, 4), valid (N, T), exists (N,)
             [+ masks (N, T, H, W)].
    traj_idx: (N,) matched query-trajectory per target slot.
    outputs['pred_masks'] when compute_masks: (N, T, h, w) slot-aligned.
    """
    T = num_frames
    logits = outputs["pred_logits"]                      # (1, T*Nq, K+1)
    _, TQ, Kp1 = logits.shape
    Nq = TQ // T
    N = targets["labels"].shape[0]
    labels = targets["labels"]
    valid = targets["valid"]                             # (N, T)
    exists = targets["exists"]                           # (N,)

    # --- classification: valid (traj, frame) pairs are foreground ---
    # position of traj j at frame t = t*Nq + traj_idx[j]
    frame_pos = (jnp.arange(T)[None, :] * Nq) + traj_idx[:, None]   # (N, T)
    rows = jnp.where(valid & exists[:, None], frame_pos, TQ).reshape(-1)
    lab = jnp.broadcast_to(labels[:, None], (N, T)).reshape(-1)
    # Background = Kp1 → dropped one-hot column (see image_losses).
    target_classes = jnp.full((TQ + 1,), Kp1, dtype=jnp.int32)
    target_classes = target_classes.at[rows].set(lab, mode="drop")[:TQ]
    onehot = jax.nn.one_hot(target_classes, Kp1 + 1)[None, ..., :-1]
    loss_ce = sigmoid_focal_loss(logits, onehot.astype(logits.dtype), num_boxes,
                                 alpha=focal_alpha) * TQ

    matched_logits = logits[0][jnp.clip(frame_pos, 0, TQ - 1)]      # (N, T, K+1)
    vmask_ce = (valid & exists[:, None])
    correct = (jnp.argmax(matched_logits, -1) == labels[:, None]) & vmask_ce
    class_error = 100.0 * (1.0 - correct.sum() / jnp.clip(vmask_ce.sum(), 1, None))

    # --- boxes: ALL frames of matched trajectories (reference quirk,
    # criterion.py:143-150) ---
    pred_boxes = outputs["pred_boxes"][0].reshape(T, Nq, 4)
    src_boxes = jnp.transpose(pred_boxes[:, traj_idx], (1, 0, 2))   # (N, T, 4)
    bmask = exists[:, None].astype(jnp.float32) * jnp.ones((1, T))
    l1 = jnp.abs(src_boxes - targets["boxes"]).sum(-1) * bmask
    loss_bbox = l1.sum() / num_boxes
    giou = box_ops.elementwise_generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(src_boxes),
        box_ops.box_cxcywh_to_xyxy(targets["boxes"]))
    loss_giou = ((1 - giou) * bmask).sum() / num_boxes

    losses = {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
              "loss_giou": loss_giou, "class_error": class_error}

    if compute_masks and "pred_masks" in outputs:
        src_masks = outputs["pred_masks"]                # (N, T, h, w)
        tgt_masks = targets["masks"].astype(jnp.float32)
        up = resize_bilinear(src_masks[..., None], tgt_masks.shape[-2:])[..., 0]
        up = up.reshape(N * T, -1)
        tm = tgt_masks.reshape(N * T, -1)
        vm = bmask.reshape(N * T)
        losses["loss_mask"] = sigmoid_focal_loss(up, tm, num_boxes, valid=vm)
        losses["loss_dice"] = dice_loss(up, tm, num_boxes, valid=vm)
    return losses


def clip_criterion(outputs: Dict, targets: Dict, num_classes: int,
                   num_frames: int, matcher_cfg: Dict,
                   focal_alpha: float = 0.25,
                   axis_name: Optional[str] = None,
                   mask_on: bool = False) -> Dict[str, jnp.ndarray]:
    """Full clip criterion; num_boxes = #instances × T (reference counts the
    flattened instance-frame labels, criterion.py:222)."""
    num_boxes = reduce_num_boxes(targets["exists"].sum() * num_frames, axis_name)

    def match(out):
        return matcher_lib.hungarian_match_clip(
            out["pred_logits"], out["pred_boxes"], targets["labels"],
            targets["boxes"], targets["valid"] & targets["exists"][:, None],
            num_frames, **matcher_cfg)

    traj_idx = outputs.get("indices")
    if traj_idx is None:
        traj_idx = match(outputs)
    losses = clip_losses(outputs, targets, traj_idx, num_boxes, num_classes,
                         num_frames, focal_alpha, compute_masks=mask_on)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_idx = aux.get("indices")
        if aux_idx is None:
            aux_idx = match(aux)
        l = clip_losses(aux, targets, aux_idx, num_boxes, num_classes,
                        num_frames, focal_alpha,
                        compute_masks="pred_masks" in aux)
        l.pop("class_error", None)
        losses.update({f"{k}_{i}": v for k, v in l.items()})
    return losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """Loss weights incl. the aux weighting ladder (reference criterion.py:255-288)."""
    weight_dict = {"loss_ce": cfg.MODEL.LOSS.CLASS_COEF,
                   "loss_bbox": cfg.MODEL.LOSS.BBX_L1_COEF,
                   "loss_giou": cfg.MODEL.LOSS.BBX_GIOU_COEF}
    n_dec = cfg.MODEL.TRANSFORMER.DECODER_LAYERS
    if cfg.MODEL.LOSS.AUX_LOSS:
        aux = {}
        if cfg.MODEL.LOSS.AUX_LOSS_WEIGHTING:
            for i in range(n_dec - 1):
                aux.update({f"{k}_{i}": v * AUX_LOSS_WEIGHTING_COEF[i]
                            for k, v in weight_dict.items()})
            top = AUX_LOSS_WEIGHTING_COEF[n_dec - 1]
            weight_dict = {k: v * top for k, v in weight_dict.items()}
        else:
            for i in range(n_dec - 1):
                aux.update({f"{k}_{i}": v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    if cfg.MODEL.MASK_ON:
        weight_dict["loss_mask"] = cfg.MODEL.LOSS.SEGM_MASK_COEF
        weight_dict["loss_dice"] = cfg.MODEL.LOSS.SEGM_DICE_COEF
        for i in cfg.MODEL.LOSS.MASK_AUX_LOSS:
            weight_dict[f"loss_mask_{i}"] = cfg.MODEL.LOSS.SEGM_MASK_COEF
            weight_dict[f"loss_dice_{i}"] = cfg.MODEL.LOSS.SEGM_DICE_COEF
    return weight_dict


def weighted_total(losses: Dict[str, jnp.ndarray],
                   weight_dict: Dict[str, float]) -> jnp.ndarray:
    return sum(losses[k] * w for k, w in weight_dict.items() if k in losses)
