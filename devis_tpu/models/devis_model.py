"""DeVIS video instance-segmentation model.

Reimplements `src/models/devis_segmentation.py:13-178`: clip-level forward on
T frames, trajectory matching during training, top-k trajectory selection +
per-trajectory mask inference at eval.

TPU-first re-design of the eval path: the reference computes masks for the
`torch.unique` set of top-k trajectories (dynamic shape, L51). Here masks are
computed for a *static* trajectory set — all Nq trajectories when
Nq ≤ num_out (cheaper than the reference: for the YT-19 R50 config Nq=10 vs
num_out=20 duplicated), otherwise the top-num_out set with duplicates. The
clip-length trim and box rescaling happen host-side in the tracker.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import matcher as matcher_lib
from .detr import DeformableDETR
from .segmentation import (MaskHeadConv, MultiScaleMHAttentionMap, RES_TO_IDX,
                           mask_head_feat_dims, select_mask_head_features)


class Conv3DHead(nn.Module):
    """VisTR-style 3D conv mask head, ablation only (reference L167-178)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, T, H, W, C)
        for i in range(3):
            x = nn.Conv(12, (3, 3, 3), padding=[(2, 2)] * 3,
                        kernel_dilation=(2, 2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        return nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="out")(x)


class DeVIS(nn.Module):
    """Clip model: batch axis = T frames; queries = T * Nq_per_frame."""
    detr: DeformableDETR
    num_frames: int = 6
    mask_head_used_features: Sequence = (("/32", "encoded"), ("/16", "encoded"),
                                         ("/8", "encoded"), ("/4", "backbone"))
    att_maps_used_res: Sequence[str] = ("/32", "/16", "/8")
    use_deformable_conv: bool = True
    mask_aux_loss: Sequence[int] = (2,)
    matcher_cfg: Optional[dict] = None
    num_out: int = 20
    focal_loss: bool = True
    add_3d_conv_head: bool = False
    band_ncand: Tuple[int, int] = (4, 3)
    impl: str = "auto"
    dtype: Any = jnp.float32

    def setup(self):
        hidden_dim = self.detr.hidden_dim
        nheads = 8
        self.bbox_attention = MultiScaleMHAttentionMap(
            hidden_dim, nheads, num_levels=len(self.att_maps_used_res),
            dtype=self.dtype)
        fpn_dims = mask_head_feat_dims(self.mask_head_used_features,
                                       self.detr.backbone_num_channels,
                                       hidden_dim)
        self.mask_head = MaskHeadConv(hidden_dim, fpn_dims, nheads,
                                      self.use_deformable_conv,
                                      num_att_levels=len(self.att_maps_used_res),
                                      out_layer=not self.add_3d_conv_head,
                                      expand_mode="tile",
                                      band_ncand=self.band_ncand,
                                      impl=self.impl,
                                      dtype=self.dtype)
        if self.add_3d_conv_head:
            self.conv_head_3d = Conv3DHead(dtype=self.dtype)
        else:
            self.conv_head_3d = None

    def _select_features(self, inter):
        memories, srcs, masks = inter["memories"], inter["srcs"], inter["masks"]
        if len(memories) != 1:
            mem_att = [memories[RES_TO_IDX[r]] for r in self.att_maps_used_res]
            mask_att = [masks[RES_TO_IDX[r]] for r in self.att_maps_used_res]
        else:
            mem_att, mask_att = [memories[0]], [masks[0]]
        feats = select_mask_head_features(inter["backbone_feats"], srcs,
                                          memories, self.mask_head_used_features)
        return mem_att, mask_att, feats

    def _masks_for_trajectories(self, traj_embeddings, mem_att, mask_att, feats):
        """traj_embeddings: (T, N, C) → (N, T, h, w) mask logits per
        trajectory per frame (reference `_module_inference`, L57-67)."""
        T, N, _ = traj_embeddings.shape
        bbox_masks = self.bbox_attention(traj_embeddings, mem_att, mask_att)
        # (T, N, heads, H, W) → instance-major (N*T, heads, H, W) (ref L59)
        bbox_masks = [jnp.transpose(b, (1, 0, 2, 3, 4)).reshape(
            (N * T,) + b.shape[2:]) for b in bbox_masks]
        m = self.mask_head(feats, bbox_masks, expand=N)   # (N*T, h, w, 1|C)
        if self.conv_head_3d is not None:
            m = m.reshape((N, T) + m.shape[1:])           # (N, T, h, w, C)
            m = self.conv_head_3d(m)[..., 0]              # (N, T, h, w)
            return m
        return m[..., 0].reshape(N, T, m.shape[1], m.shape[2])

    def __call__(self, images, pad_mask, targets=None, train: bool = False,
                 clip_length: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """images: (T, H, W, 3); pad_mask: (T, H, W).
        clip_length: traced scalar — number of real (non-padded) frames."""
        T = self.num_frames
        out, inter = self.detr(images, pad_mask, deterministic=deterministic)
        mem_att, mask_att, feats = self._select_features(inter)
        hs = inter["hs"]                                  # (n_layers, 1, T*Nq, C)
        TQ = hs.shape[2]
        Nq = TQ // T
        mcfg = dict(self.matcher_cfg or {})

        def match_and_mask(level_out, lvl):
            traj_idx = matcher_lib.hungarian_match_clip(
                level_out["pred_logits"], level_out["pred_boxes"],
                targets["labels"], targets["boxes"],
                targets["valid"] & targets["exists"][:, None], T, **mcfg)
            level_out["indices"] = traj_idx
            hs_t = hs[lvl][0].reshape(T, Nq, -1)
            emb = hs_t[:, traj_idx]                       # (T, N, C)
            level_out["pred_masks"] = self._masks_for_trajectories(
                emb, mem_att, mask_att, feats)

        if targets is not None and train:
            for lvl in [-1] + list(self.mask_aux_loss):
                level_out = out if lvl == -1 else out["aux_outputs"][lvl]
                match_and_mask(level_out, lvl)
            return out

        # ---- inference (reference DeVISPostProcessor, L110-164) ----
        logits = jax.nn.sigmoid(out["pred_logits"][0]).reshape(T, Nq, -1)
        K = logits.shape[-1]
        if clip_length is None:
            clip_length = jnp.asarray(T)
        frame_ok = (jnp.arange(T) < clip_length).astype(logits.dtype)
        traj_probs = ((logits * frame_ok[:, None, None]).sum(0)
                      / jnp.clip(clip_length, 1, None)).reshape(-1)   # (Nq*K,)
        num_out = min(self.num_out, traj_probs.shape[0])
        top_scores, top_idx = jax.lax.top_k(traj_probs, num_out)
        query_idx = top_idx // K                          # trajectory ids
        labels = top_idx % K
        scores = logits[:, query_idx, labels]             # (T, num_out)

        boxes = out["pred_boxes"][0].reshape(T, Nq, 4)
        top_boxes = boxes[:, query_idx]                   # (T, num_out, 4) cxcywh
        centers = boxes[:, :, :2][:, query_idx]           # (T, num_out, 2)

        # Masks on a static trajectory set.
        hs_t = hs[-1][0].reshape(T, Nq, -1)
        if Nq <= num_out:
            emb = hs_t                                    # all trajectories
            mask_gather = query_idx                       # top-k → row in masks
        else:
            emb = hs_t[:, query_idx]
            mask_gather = jnp.arange(num_out)
        masks = self._masks_for_trajectories(emb, mem_att, mask_att, feats)

        results = {"scores": scores, "labels": labels, "boxes": top_boxes,
                   "center_points": centers, "masks": masks,
                   "mask_gather": mask_gather, "query_top_k_indexes": query_idx,
                   "spatial_shapes": inter["spatial_shapes"]}
        if targets is not None:
            # validation-loss path also wants matching (engine computes losses)
            pass
        return out, results
