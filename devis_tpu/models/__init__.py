"""Model factory (reference: src/models/__init__.py:15-81).

`build_model(num_classes, cfg)` returns the flax module for the configured
model family:

  * DATASETS.TYPE == 'coco', MASK_ON=False → DeformableDETR
  * DATASETS.TYPE == 'coco', MASK_ON=True  → DeformableDETRSegm
  * DATASETS.TYPE == 'vis'                 → DeVIS (temporal transformer; the
    DISABLE_TEMPORAL_CONNECTIONS ablation swaps the per-frame variant)

num_classes follows the reference registry: COCO 91, YouTube-VIS 40, OVIS 25;
with focal loss the model emits `num_classes` logits (reference passes
`num_classes - 1` and adds one, src/models/__init__.py:29).
"""
from __future__ import annotations

import jax.numpy as jnp

from .backbones.resnet import ResNet
from .detr import DeformableDETR
from .devis_model import DeVIS
from .position_encoding import build_position_encoding
from .segmentation import DeformableDETRSegm


def matcher_cfg_from(cfg, clip: bool) -> dict:
    m = dict(cost_class=cfg.MODEL.MATCHER.CLASS_COST,
             cost_bbox=cfg.MODEL.MATCHER.BBX_L1_COST,
             cost_giou=cfg.MODEL.MATCHER.BBX_GIOU_COST,
             focal_alpha=cfg.MODEL.LOSS.FOCAL_ALPHA)
    if clip:
        m["use_l1_distance_sum"] = cfg.MODEL.MATCHER.USE_SUM_L1_DISTANCE
    else:
        m["focal_loss"] = cfg.MODEL.LOSS.FOCAL_LOSS
    return m


def build_backbone(cfg, dtype=jnp.float32):
    name = cfg.MODEL.BACKBONE
    if "swin" in name:
        from .backbones.swin import SwinTransformer, SWIN_CONFIGS
        return (SwinTransformer(**SWIN_CONFIGS[name],
                                use_checkpoint=cfg.TPU.SWIN_GRADIENT_CHECKPOINT,
                                dtype=dtype),
                SWIN_CONFIGS[name]["num_channels"])
    backbone = ResNet(name_variant=name, dilation=cfg.MODEL.BACKBONE_DILATION,
                      dtype=dtype)
    return backbone, ResNet.num_channels(name)


def build_model(num_classes: int, cfg, impl: str = None):
    """`impl` overrides cfg.TPU.MSDA_IMPL for every op dispatch in the model
    ('auto' | 'pallas' | 'xla'). Pass impl='xla' to build a template twin for
    CPU-lowered traces (parameter init): the param tree is identical by
    construction (the projection-fused Pallas paths keep checkpoint-identical
    params), so variables init'd on the XLA twin apply to the Pallas model."""
    if impl is None:
        impl = cfg.TPU.MSDA_IMPL
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    backbone, num_channels = build_backbone(cfg, dtype)
    position_encoding = build_position_encoding(cfg)

    is_vis = cfg.DATASETS.TYPE == "vis"
    eff_num_classes = (num_classes - 1 if cfg.MODEL.LOSS.FOCAL_LOSS
                       else num_classes)

    transformer_kwargs = dict(
        n_heads=cfg.MODEL.TRANSFORMER.N_HEADS,
        num_encoder_layers=cfg.MODEL.TRANSFORMER.ENCODER_LAYERS,
        num_decoder_layers=cfg.MODEL.TRANSFORMER.DECODER_LAYERS,
        dim_feedforward=cfg.MODEL.DIM_FEEDFORWARD,
        dropout=cfg.MODEL.DROPOUT,
        enc_n_points=cfg.MODEL.TRANSFORMER.ENC_N_POINTS,
        dec_n_points=cfg.MODEL.TRANSFORMER.DEC_N_POINTS,
        remat_layers=cfg.TPU.TRANSFORMER_GRADIENT_CHECKPOINT,
        impl=impl)
    if is_vis:
        da = cfg.MODEL.DEVIS.DEFORMABLE_ATTENTION
        transformer_kwargs.update(
            variant="devis_ablation" if da.DISABLE_TEMPORAL_CONNECTIONS else "devis",
            num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            enc_connect_all=da.ENC_CONNECT_ALL_FRAMES,
            enc_temporal_window=da.ENC_TEMPORAL_WINDOW,
            enc_n_temporal_points=da.ENC_N_POINTS_TEMPORAL_FRAME,
            dec_n_temporal_points=da.DEC_N_POINTS_TEMPORAL_FRAME,
            instance_aware=da.INSTANCE_AWARE_ATTENTION)

    detr = DeformableDETR(
        backbone=backbone, position_encoding=position_encoding,
        num_classes=eff_num_classes, num_queries=cfg.MODEL.NUM_QUERIES,
        num_feature_levels=cfg.MODEL.NUM_FEATURE_LEVELS,
        hidden_dim=cfg.MODEL.HIDDEN_DIM,
        aux_loss=cfg.MODEL.LOSS.AUX_LOSS,
        with_box_refine=cfg.MODEL.WITH_BBX_REFINE,
        with_ref_point_refine=cfg.MODEL.WITH_REF_POINT_REFINE,
        with_gradient=cfg.MODEL.BBX_GRADIENT_PROP,
        backbone_num_channels=tuple(num_channels),
        transformer_kwargs=transformer_kwargs,
        dtype=dtype)

    if is_vis:
        return DeVIS(
            detr=detr, num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            mask_head_used_features=tuple(map(tuple, cfg.MODEL.MASK_HEAD.USED_FEATURES)),
            att_maps_used_res=tuple(cfg.MODEL.MASK_HEAD.UPSAMPLING_RESOLUTIONS),
            use_deformable_conv=cfg.MODEL.MASK_HEAD.USE_MDC,
            mask_aux_loss=tuple(cfg.MODEL.LOSS.MASK_AUX_LOSS),
            matcher_cfg=matcher_cfg_from(cfg, clip=True),
            num_out=cfg.TEST.NUM_OUT,
            focal_loss=cfg.MODEL.LOSS.FOCAL_LOSS,
            add_3d_conv_head=cfg.MODEL.MASK_HEAD.DEVIS.CONV_HEAD_3D,
            band_ncand=tuple(cfg.TPU.MASKHEAD_BAND_NCAND),
            impl=impl,
            dtype=dtype)

    if cfg.MODEL.MASK_ON:
        return DeformableDETRSegm(
            detr=detr,
            mask_head_used_features=tuple(map(tuple, cfg.MODEL.MASK_HEAD.USED_FEATURES)),
            att_maps_used_res=tuple(cfg.MODEL.MASK_HEAD.UPSAMPLING_RESOLUTIONS),
            use_deformable_conv=cfg.MODEL.MASK_HEAD.USE_MDC,
            mask_aux_loss=tuple(cfg.MODEL.LOSS.MASK_AUX_LOSS),
            matcher_cfg=matcher_cfg_from(cfg, clip=False),
            num_out=cfg.TEST.NUM_OUT,
            focal_loss=cfg.MODEL.LOSS.FOCAL_LOSS,
            band_ncand=tuple(cfg.TPU.MASKHEAD_BAND_NCAND),
            impl=impl,
            dtype=dtype)
    return detr
