"""Instance segmentation heads and the image segmentation model.

Reimplements `src/models/deformable_segmentation.py`:
  * ``MultiScaleMHAttentionMap``  — per-level bbox attention maps (L276-320).
  * ``MaskHeadConv``              — FPN-style conv mask head with optional
                                    modulated deformable convs (L323-380).
  * ``DeformableDETRSegm``        — training computes masks for matched target
                                    slots; eval additionally for top-k
                                    detections (L138-241).

TPU-first re-design of the ragged parts: the reference gathers only matched
embeddings and pads batches with random unmatched ones (`tmp_batch_fill`,
L157-172). Here targets are padded to a static capacity N and masks are
computed for every slot — invalid slots are masked in the loss. Shapes stay
static; no recompilation across steps.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d
from ..ops.interpolate import resize_nearest, resize_nearest_hw
from . import matcher as matcher_lib
from .detr import DeformableDETR, top_k_process

# Feature-source index tables (reference L20-32). srcs/memories are ordered
# [/8, /16, /32, /64]; backbone features [/4, /8, /16, /32].
RES_TO_IDX = {"/64": 3, "/32": 2, "/16": 1, "/8": 0}
BACKBONE_RES_TO_IDX = {"/32": 3, "/16": 2, "/8": 1, "/4": 0}


class _ConvParams(nn.Module):
    """Declares `nn.Conv`-identical params (kernel (K,K,Cin,F), bias (F,))
    without applying the conv — the fused DCNv2 kernel consumes the raw
    weights. Checkpoint trees are interchangeable with `nn.Conv`."""
    features: int
    kernel: int
    cin: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.zeros,
                       (self.kernel, self.kernel, self.cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ModulatedDeformableConv(nn.Module):
    """DCNv2 layer (reference L244-267): zero-init offset/modulator convs.

    On the TPU inference path the whole layer (field convs + deformable
    conv) runs as ONE fused banded kernel (`modulated_deform_conv2d`);
    elsewhere the fields are ordinary XLA convs feeding `deform_conv2d`."""
    features: int
    kernel: int = 3
    padding: int = 1
    band_ncand: Tuple[int, int] = (4, 4)   # banded-kernel window (x, y)
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, channel_first: bool = False):
        from ..ops.deform_conv import (conv2d_nhwc, modulated_deform_conv2d,
                                       modulated_deform_conv2d_cf)
        from ..ops.ms_deform_attn import resolve_impl
        K = self.kernel
        Cin = x.shape[1] if channel_first else x.shape[-1]
        w_off, b_off = _ConvParams(2 * K * K, K, Cin, name="offset_conv")()
        w_mod, b_mod = _ConvParams(K * K, K, Cin, name="modulator_conv")()
        # Layer-input capture for the accuracy-gate band-coverage audit
        # (`accuracy_gate.py`): a no-op unless 'intermediates' is mutable.
        self.sow("intermediates", "mdc_input",
                 jnp.transpose(x, (0, 2, 3, 1)) if channel_first else x)
        weight = self.param("weight", nn.initializers.he_uniform(),
                            (K, K, Cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        nc_x, nc_y = self.band_ncand
        if channel_first:
            # channel-first spine: always the fused banded route
            # (interpret-mode on CPU), CF in and out.
            return modulated_deform_conv2d_cf(
                x, w_off.astype(dt), b_off.astype(dt), w_mod.astype(dt),
                b_mod.astype(dt), weight.astype(x.dtype),
                bias.astype(x.dtype), self.padding, nc_x, nc_y)
        if resolve_impl(self.impl) == "pallas":
            return modulated_deform_conv2d(
                x, w_off.astype(dt), b_off.astype(dt), w_mod.astype(dt),
                b_mod.astype(dt), weight.astype(x.dtype),
                bias.astype(x.dtype), self.padding, nc_x, nc_y)
        offset = conv2d_nhwc(x, w_off.astype(dt), b_off.astype(dt),
                             self.padding)
        modulator = 2.0 * jax.nn.sigmoid(
            conv2d_nhwc(x, w_mod.astype(dt), b_mod.astype(dt), self.padding))
        return deform_conv2d(x, offset, modulator, weight.astype(x.dtype),
                             bias.astype(x.dtype), padding=self.padding,
                             impl=self.impl)


class GroupNormCF(nn.Module):
    """`nn.GroupNorm`-equivalent on channel-first (B, C, H, W) input.

    The parameter tree (scale/bias of shape (C,)) matches `nn.GroupNorm`, so
    checkpoints are interchangeable between the NHWC and channel-first
    mask-head spines. Numerics mirror flax defaults: f32 statistics,
    fast-variance E[x²]−E[x]²."""
    num_groups: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        xf = x.astype(jnp.float32).reshape(B, self.num_groups, -1)
        mean = jnp.mean(xf, axis=2, keepdims=True)
        var = jnp.mean(xf * xf, axis=2, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(B, C, H, W)
        y = (y * scale.astype(jnp.float32)[None, :, None, None]
             + bias.astype(jnp.float32)[None, :, None, None])
        return y.astype(self.dtype)


class PlainConv(nn.Module):
    """3×3 conv with kaiming-uniform init (reference L270-274)."""
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding=[(self.padding,) * 2] * 2,
                       kernel_init=nn.initializers.he_uniform(),
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv")(x)


class MultiScaleMHAttentionMap(nn.Module):
    """Per-level multi-head attention maps between query embeddings and
    encoder memories (reference L276-320)."""
    hidden_dim: int
    num_heads: int
    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, memories: List[jnp.ndarray],
                 masks: Optional[List[jnp.ndarray]] = None):
        """q: (B, N, C); memories: per level (B, H, W, C) NHWC;
        masks: per level (B, H, W) True=pad. Returns per level
        (B, N, heads, H, W) softmax attention maps."""
        out = []
        Dh = self.hidden_dim // self.num_heads
        norm = Dh ** -0.5
        for i, mem in enumerate(memories):
            suffix = "" if i == 0 else f"_{i}"
            q_l = nn.Dense(self.hidden_dim, dtype=self.dtype,
                           name=f"q_linear{suffix}")(q)
            k_l = nn.Dense(self.hidden_dim, dtype=self.dtype,
                           name=f"k_linear{suffix}")(mem)
            B, N, _ = q_l.shape
            H, W = mem.shape[1], mem.shape[2]
            qh = q_l.reshape(B, N, self.num_heads, Dh)
            kh = k_l.reshape(B, H, W, self.num_heads, Dh)
            logits = jnp.einsum("bnhc,bxyhc->bnhxy", qh * norm, kh)
            if masks is not None:
                logits = jnp.where(masks[i][:, None, None], -jnp.inf, logits)
            # softmax JOINTLY over heads × space (`weights.flatten(2)` in the
            # reference, L316 — the DETR MHAttentionMap convention), not per
            # head.
            att = jax.nn.softmax(
                logits.reshape(B, N, self.num_heads * H * W).astype(jnp.float32),
                axis=-1).astype(logits.dtype)
            out.append(att.reshape(B, N, self.num_heads, H, W))
        return out


class MaskHeadConv(nn.Module):
    """FPN-style mask head (reference L323-380). Operates on NHWC batches of
    (images×instances). ``fpn_dims`` are the channel counts of the finer
    features; attention maps are concatenated at the first
    ``num_att_levels`` scales."""
    dim: int
    fpn_dims: Sequence[int]
    nheads: int
    use_deformable_conv: bool
    num_att_levels: int
    out_layer: bool = True
    expand_mode: str = "repeat"   # "repeat": image-major (b*N+n, reference
                                  # L140-147); "tile": instance-major (n*T+t,
                                  # reference devis L34-35)
    channel_first_spine: Optional[bool] = None  # None → auto (CF on the
                                  # Pallas/deformable path; see __call__)
    band_ncand: Tuple[int, int] = (4, 3)  # banded DCNv2 window (x, y)
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], bbox_masks: List[jnp.ndarray],
                 expand: int):
        """features[0]: (B, H, W, C) coarsest; features[i>0]: finer maps.
        bbox_masks: per level (B*expand, heads, H, W). ``expand`` = instances
        per image; features are tiled instance-major to (B*expand, ...).

        On the deformable/Pallas path the spine runs CHANNEL-FIRST end to
        end: the banded DCNv2 kernel wants (C, rows) layout, so chaining
        layers channel-first deletes a per-layer NHWC↔NCHW round trip of the
        ~GB expanded activation (and the attention maps arrive channel-first
        already). Parameters are layout-independent (same trees either way)."""
        from ..ops.ms_deform_attn import resolve_impl
        cf = self.channel_first_spine
        if cf is None:
            cf = (self.use_deformable_conv
                  and resolve_impl(self.impl) == "pallas")
        cf = cf and self.use_deformable_conv
        if self.use_deformable_conv:
            conv = functools.partial(ModulatedDeformableConv,
                                     band_ncand=self.band_ncand,
                                     impl=self.impl)
        else:
            conv = PlainConv
        num_levels = len(self.fpn_dims) + 1
        out_dims = [self.dim // (2 ** e) for e in range(num_levels + 2)]

        def expand_feat(t):
            # (B, H, W, C) -> (B*expand, [H, W, C] | [C, H, W]).
            # Cast to the spine's compute dtype BEFORE expanding: encoder
            # memories arrive f32 (post-LayerNorm), and expanding/staging
            # the ~GB spine activation at f32 doubles the banded kernel's
            # HBM traffic vs the bf16 compute-dtype policy.
            t = t.astype(self.dtype)
            if cf:
                t = jnp.transpose(t, (0, 3, 1, 2))        # per-image: small
            if self.expand_mode == "tile":
                return jnp.tile(t, (expand, 1, 1, 1))
            return jnp.repeat(t, expand, axis=0)

        def att(a):
            # bbox_masks arrive (BN, heads, H, W) — already channel-first.
            # Same dtype policy as expand_feat: attention maps are f32
            # softmax outputs in [0,1], where the compute-dtype rounding is
            # benign, and concat's type promotion would otherwise lift the
            # whole expanded spine activation back to f32.
            a = a.astype(self.dtype)
            return a if cf else jnp.transpose(a, (0, 2, 3, 1))

        c_ax = 1 if cf else -1

        def gn(name):
            if cf:
                return GroupNormCF(num_groups=8, epsilon=1e-5,
                                   dtype=self.dtype, name=name)
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                                name=name)

        def apply_conv(mod, x):
            return mod(x, channel_first=True) if cf else mod(x)

        x = jnp.concatenate([expand_feat(features[0]), att(bbox_masks[0])],
                            axis=c_ax)
        x = apply_conv(conv(x.shape[c_ax], dtype=self.dtype, name="lay1"), x)
        x = nn.relu(gn("gn1")(x))
        x = apply_conv(conv(out_dims[1], dtype=self.dtype, name="lay2"), x)
        x = nn.relu(gn("gn2")(x))

        for lvl, feat in enumerate(features[1:]):
            fpn = nn.Conv(out_dims[lvl + 1], (1, 1),
                          kernel_init=nn.initializers.he_uniform(),
                          dtype=self.dtype, name=f"adapter{lvl + 1}")(feat)
            fpn = expand_feat(fpn)
            if cf:
                x = fpn + resize_nearest_hw(x, (fpn.shape[2], fpn.shape[3]))
            else:
                x = fpn + resize_nearest(x, (fpn.shape[1], fpn.shape[2]))
            if self.num_att_levels > 1 and lvl + 1 < len(bbox_masks):
                x = jnp.concatenate([x, att(bbox_masks[lvl + 1])], axis=c_ax)
            x = apply_conv(conv(out_dims[lvl + 2], dtype=self.dtype,
                                name=f"lay{lvl + 3}"), x)
            x = nn.relu(gn(f"gn{lvl + 3}")(x))

        if self.out_layer:
            x = apply_conv(conv(1, dtype=self.dtype, name="out_lay"), x)
        if cf:
            x = jnp.transpose(x, (0, 2, 3, 1))            # 1|C channels: cheap
        return x                                           # (B*expand, h, w, 1|C)


def select_mask_head_features(backbone_feats, srcs, memories,
                              mask_head_used_features):
    """Feature-source selection (reference `_get_features_for_mask_head`,
    L92-121)."""
    used = []
    for res, kind in mask_head_used_features:
        if kind == "backbone":
            if res == "/64":
                used.append(srcs[RES_TO_IDX[res]])
            else:
                used.append(backbone_feats[BACKBONE_RES_TO_IDX[res]])
        elif kind == "compressed_backbone":
            if res == "/4":
                used.append(backbone_feats[BACKBONE_RES_TO_IDX[res]])
            else:
                used.append(srcs[RES_TO_IDX[res]])
        elif kind == "encoded":
            if len(memories) == 1:
                used.append(memories[0])
            elif res == "/4":
                used.append(backbone_feats[BACKBONE_RES_TO_IDX[res]])
            else:
                used.append(memories[RES_TO_IDX[res]])
        else:
            raise ValueError(f"unknown mask-head feature type {kind}")
    return used


def mask_head_feat_dims(mask_head_used_features, backbone_num_channels,
                        hidden_dim) -> List[int]:
    """Channel count per selected finer feature (reference L64-79)."""
    ch = {"/64": hidden_dim, "/32": backbone_num_channels[3],
          "/16": backbone_num_channels[2], "/8": backbone_num_channels[1],
          "/4": backbone_num_channels[0]}
    dims = []
    for res, kind in mask_head_used_features[1:]:
        if kind == "backbone":
            dims.append(ch[res])
        else:
            dims.append(hidden_dim)
    return dims


class DeformableDETRSegm(nn.Module):
    """Image instance-segmentation model (reference L138-241)."""
    detr: DeformableDETR
    mask_head_used_features: Sequence = (("/32", "encoded"), ("/16", "encoded"),
                                         ("/8", "encoded"), ("/4", "backbone"))
    att_maps_used_res: Sequence[str] = ("/32", "/16", "/8")
    use_deformable_conv: bool = True
    mask_aux_loss: Sequence[int] = (2,)
    matcher_cfg: Optional[dict] = None
    num_out: int = 100
    focal_loss: bool = True
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
                                      band_ncand=self.band_ncand,
                                      impl=self.impl,
                                      dtype=self.dtype)

    def _select_features(self, inter):
        memories, srcs = inter["memories"], inter["srcs"]
        masks = inter["masks"]
        if len(memories) != 1:
            mem_att = [memories[RES_TO_IDX[r]] for r in self.att_maps_used_res]
            mask_att = [masks[RES_TO_IDX[r]] for r in self.att_maps_used_res]
        else:
            mem_att, mask_att = [memories[0]], [masks[0]]
        feats = select_mask_head_features(inter["backbone_feats"], srcs,
                                          memories, self.mask_head_used_features)
        return mem_att, mask_att, feats

    def _masks_for_embeddings(self, embeddings, mem_att, mask_att, feats):
        """embeddings: (B, N, C) → (B, N, h, w) mask logits."""
        B, N, _ = embeddings.shape
        bbox_masks = self.bbox_attention(embeddings, mem_att, mask_att)
        bbox_masks = [b.reshape((B * N,) + b.shape[2:]) for b in bbox_masks]
        m = self.mask_head(feats, bbox_masks, expand=N)    # (B*N, h, w, 1)
        return m[..., 0].reshape(B, N, m.shape[1], m.shape[2])

    def __call__(self, images, pad_mask, targets=None, train: bool = False,
                 deterministic: bool = True):
        out, inter = self.detr(images, pad_mask, deterministic=deterministic)
        mem_att, mask_att, feats = self._select_features(inter)
        hs = inter["hs"]
        mcfg = dict(self.matcher_cfg or {})

        def match_and_mask(level_out, lvl):
            src_idx = matcher_lib.hungarian_match_image(
                level_out["pred_logits"], level_out["pred_boxes"],
                targets["labels"], targets["boxes"], targets["valid"], **mcfg)
            level_out["indices"] = src_idx
            emb = jnp.take_along_axis(hs[lvl], src_idx[..., None], axis=1)
            level_out["pred_masks"] = self._masks_for_embeddings(
                emb, mem_att, mask_att, feats)

        if targets is not None:
            levels = [-1] + list(self.mask_aux_loss)
            for lvl in levels:
                level_out = out if lvl == -1 else out["aux_outputs"][lvl]
                match_and_mask(level_out, lvl)

        if not train:
            logits = out["pred_logits"]
            prob = (jax.nn.sigmoid(logits) if self.focal_loss
                    else jax.nn.softmax(logits, axis=-1)[..., :-1])
            scores, labels, boxes, query_idx = top_k_process(
                prob, out["pred_boxes"], self.num_out)
            emb = jnp.take_along_axis(hs[-1], query_idx[..., None], axis=1)
            masks = self._masks_for_embeddings(emb, mem_att, mask_att, feats)
            out["top_k"] = {"scores": scores, "labels": labels, "boxes": boxes,
                            "query_top_k_indexes": query_idx, "masks": masks}
        return out
