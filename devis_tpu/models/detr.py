"""Deformable DETR detection model (flax.linen).

Reimplements `src/models/deformable_detr.py:28-303`: backbone → per-level 1×1
input projections (+ extra stride-2 /64 level) → deformable transformer →
per-layer class/box heads with iterative refinement, plus the top-k
postprocessor (reference L229-288).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import downsample_mask
from ..util.misc import inverse_sigmoid
from ..util import box_ops
from .transformer import DeformableTransformer


class MLP(nn.Module):
    """Simple ReLU MLP (reference deformable_detr.py:291-303)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    last_layer_init_zero: bool = False
    last_bias_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            features = self.output_dim if last else self.hidden_dim
            kernel_init = (nn.initializers.zeros if (last and self.last_layer_init_zero)
                           else nn.initializers.lecun_normal())
            if last and self.last_bias_init is not None:
                bias_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                    self.last_bias_init, dtype)
            else:
                bias_init = nn.initializers.zeros
            x = nn.Dense(features, kernel_init=kernel_init, bias_init=bias_init,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class InputProj(nn.Module):
    """1×1 conv + GroupNorm(32) level projection (reference L61-84)."""
    hidden_dim: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.hidden_dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_init=nn.initializers.xavier_uniform(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv")(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                            name="norm")(x)


def class_bias_init(num_classes_plus_one: int) -> np.ndarray:
    """Focal-loss prior bias (reference L89-91)."""
    prior_prob = 0.01
    v = -math.log((1 - prior_prob) / prior_prob)
    return np.full((num_classes_plus_one,), v, dtype=np.float32)


def bbox_bias_init() -> np.ndarray:
    """wh logits start at -2 (reference L104/108)."""
    return np.array([0.0, 0.0, -2.0, -2.0], dtype=np.float32)


class DeformableDETR(nn.Module):
    """Detection model; `backbone` and `position_encoding` are bound submodules."""
    backbone: nn.Module
    position_encoding: nn.Module
    num_classes: int
    num_queries: int = 300
    num_feature_levels: int = 4
    hidden_dim: int = 256
    aux_loss: bool = True
    with_box_refine: bool = True
    with_ref_point_refine: bool = False
    with_gradient: bool = False
    backbone_num_channels: Sequence[int] = (256, 512, 1024, 2048)
    transformer_kwargs: dict = None
    dtype: Any = jnp.float32

    def setup(self):
        tk = dict(self.transformer_kwargs or {})
        self.transformer = DeformableTransformer(
            d_model=self.hidden_dim, num_feature_levels=self.num_feature_levels,
            with_gradient=self.with_gradient, dtype=self.dtype, **tk)

        num_pred = self.transformer.num_decoder_layers
        if self.num_feature_levels == 1:
            in_channels = [self.backbone_num_channels[3]]
        else:
            in_channels = list(self.backbone_num_channels[-3:])

        projs = []
        num_backbone_outs = (len(in_channels) if self.num_feature_levels == 1
                             else len(self.backbone_num_channels) - 1)
        if self.num_feature_levels > 1:
            for i in range(num_backbone_outs):
                projs.append(InputProj(self.hidden_dim, kernel=1, dtype=self.dtype,
                                       name=f"input_proj_{i}"))
            for i in range(num_backbone_outs, self.num_feature_levels):
                projs.append(InputProj(self.hidden_dim, kernel=3, stride=2,
                                       dtype=self.dtype, name=f"input_proj_{i}"))
        else:
            projs.append(InputProj(self.hidden_dim, kernel=1, dtype=self.dtype,
                                   name="input_proj_0"))
        self.input_proj = projs

        self.query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                      (self.num_queries, self.hidden_dim * 2))

        # Per-layer heads: cloned when box refine, shared otherwise
        # (reference L100-117). Distinct flax modules model the clones; the
        # shared case reuses one module for every layer.
        cb = class_bias_init(self.num_classes + 1)
        if self.with_box_refine:
            self.class_embed = [
                nn.Dense(self.num_classes + 1,
                         bias_init=lambda k, s, d=jnp.float32: jnp.asarray(cb, d),
                         dtype=self.dtype, name=f"class_embed_{i}")
                for i in range(num_pred)]
            self.bbox_embed = [
                MLP(self.hidden_dim, 4, 3, last_layer_init_zero=True,
                    last_bias_init=bbox_bias_init() if i == 0 else np.zeros(4, np.float32),
                    dtype=self.dtype, name=f"bbox_embed_{i}")
                for i in range(num_pred)]
        else:
            shared_cls = nn.Dense(
                self.num_classes + 1,
                bias_init=lambda k, s, d=jnp.float32: jnp.asarray(cb, d),
                dtype=self.dtype, name="class_embed_0")
            shared_box = MLP(self.hidden_dim, 4, 3, last_layer_init_zero=True,
                             last_bias_init=bbox_bias_init(), dtype=self.dtype,
                             name="bbox_embed_0")
            self.class_embed = [shared_cls] * num_pred
            self.bbox_embed = [shared_box] * num_pred
        if self.with_ref_point_refine:
            self.ref_point_embed = [
                MLP(self.hidden_dim, 2, 3, last_layer_init_zero=True,
                    dtype=self.dtype, name=f"ref_point_embed_{i}")
                for i in range(num_pred)]
        else:
            self.ref_point_embed = None

    def __call__(self, images: jnp.ndarray, pad_mask: jnp.ndarray,
                 deterministic: bool = True):
        """images: (B, H, W, 3) NHWC; pad_mask: (B, H, W) bool (True = padding).

        Returns (out, intermediates) where out has pred_logits/pred_boxes
        (+ aux_outputs) and intermediates carries everything the mask head
        consumes (reference forward's 12-tuple, deformable_detr.py:203-207).
        """
        features = self.backbone(images,
                                 deterministic=deterministic)  # 4 NHWC levels
        feature_masks = [downsample_mask(pad_mask, (f.shape[1], f.shape[2]))
                         for f in features]
        pos = [self.position_encoding(m).astype(features[0].dtype)
               for m in feature_masks]

        if self.num_feature_levels == 1:
            use_feats, use_masks, use_pos = features[-1:], feature_masks[-1:], pos[-1:]
        else:
            use_feats, use_masks, use_pos = features[1:], feature_masks[1:], pos[1:]

        srcs, masks = [], []
        for l, feat in enumerate(use_feats):
            srcs.append(self.input_proj[l](feat))
            masks.append(use_masks[l])
        pos_embeds = list(use_pos)
        if self.num_feature_levels > len(use_feats):
            for l in range(len(use_feats), self.num_feature_levels):
                base = use_feats[-1] if l == len(use_feats) else srcs[-1]
                src = self.input_proj[l](base)
                mask = downsample_mask(pad_mask, (src.shape[1], src.shape[2]))
                srcs.append(src)
                masks.append(mask)
                pos_embeds.append(self.position_encoding(mask).astype(src.dtype))

        bbox_embed_for_refine = self.bbox_embed if self.with_box_refine else None
        t = self.transformer(srcs, masks, pos_embeds, self.query_embed,
                             bbox_embed=bbox_embed_for_refine,
                             ref_point_embed=self.ref_point_embed,
                             deterministic=deterministic)

        hs = t["hs"]
        init_reference = t["init_reference"]
        inter_references = t["inter_references"]

        outputs_classes, outputs_coords = [], []
        for lvl in range(hs.shape[0]):
            outputs_classes.append(self.class_embed[lvl](hs[lvl]))
            if self.with_gradient:
                outputs_coord = inter_references[lvl]
            else:
                reference = init_reference if lvl == 0 else inter_references[lvl - 1]
                reference = inverse_sigmoid(reference)
                tmp = self.bbox_embed[lvl](hs[lvl])
                if reference.shape[-1] == 4:
                    tmp = tmp + reference
                else:
                    tmp = jnp.concatenate([tmp[..., :2] + reference, tmp[..., 2:]],
                                          axis=-1)
                outputs_coord = jax.nn.sigmoid(tmp)
            outputs_coords.append(outputs_coord)

        outputs_class = jnp.stack(outputs_classes)
        outputs_coord = jnp.stack(outputs_coords)

        out = {"pred_logits": outputs_class[-1], "pred_boxes": outputs_coord[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i], "pred_boxes": outputs_coord[i]}
                for i in range(hs.shape[0] - 1)]

        intermediates = dict(
            backbone_feats=features, feature_masks=feature_masks,
            memories=t["memories"], hs=hs, query_pos=t["query_pos"],
            srcs=srcs, masks=masks, init_reference=init_reference,
            inter_references=inter_references, valid_ratios=t["valid_ratios"],
            spatial_shapes=t["spatial_shapes"])
        return out, intermediates


# ---------------------------------------------------------------------------
# Postprocessing (reference deformable_detr.py:218-288) — pure functions.
# ---------------------------------------------------------------------------

def top_k_process(output_prob: jnp.ndarray, boxes: jnp.ndarray, num_out: int):
    """Top-k over the flattened (query × class) axis (reference L236-241)."""
    B, Q, K = output_prob.shape
    flat = output_prob.reshape(B, Q * K)
    scores, top_idx = jax.lax.top_k(flat, min(num_out, Q * K))
    query_idx = top_idx // K
    labels = top_idx % K
    boxes = jnp.take_along_axis(boxes, query_idx[..., None], axis=1)
    return scores, labels, boxes, query_idx


def process_boxes(boxes: jnp.ndarray, target_sizes: jnp.ndarray) -> jnp.ndarray:
    """cxcywh[0,1] → absolute xyxy (reference L218-226)."""
    boxes = box_ops.box_cxcywh_to_xyxy(boxes)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)
    return boxes * scale[:, None, :]


def postprocess_detections(outputs: dict, target_sizes: jnp.ndarray,
                           num_out: int, focal_loss: bool = True):
    """DefDETRPostProcessor.forward equivalent. Returns dict of arrays."""
    logits = outputs["pred_logits"]
    if focal_loss:
        prob = jax.nn.sigmoid(logits)
    else:
        prob = jax.nn.softmax(logits, axis=-1)[..., :-1]
    scores, labels, boxes, query_idx = top_k_process(prob, outputs["pred_boxes"],
                                                     num_out)
    boxes = process_boxes(boxes, target_sizes)
    return {"scores": scores, "labels": labels, "boxes": boxes,
            "query_top_k_indexes": query_idx}
