"""Deformable transformer encoder/decoder (flax.linen).

One unified module covering the reference's three transformer variants:

  * ``variant="image"``          — DeformableTransformer
                                   (reference src/models/deformable_transformer.py:21-341).
  * ``variant="devis"``          — DeVISTransformer with temporal deformable
                                   attention (reference src/models/devis_transformer.py:16-173).
  * ``variant="devis_ablation"`` — per-frame attention without temporal
                                   connections (reference
                                   src/models/devis_ablation_transformer_wo_t_conn.py:17-107).

TPU-first notes: all level flattening / reference-point grids are computed with
static spatial shapes; the per-frame loops of the reference are batched; the
iterative bbox refinement (reference deformable_transformer.py:286-313) takes
the prediction heads as bound callables from the parent DETR module so weights
are shared exactly as in the reference's "hack implementation".
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..util.misc import inverse_sigmoid
from .attention import (MSDeformAttn, MultiHeadAttention,
                        TemporalMSDeformAttnDecoder, TemporalMSDeformAttnEncoder)


def get_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-level (w_ratio, h_ratio) of non-padded area (reference L60-67).

    masks: list of (B, H_l, W_l) bool. Returns (B, L, 2)."""
    ratios = []
    for m in masks:
        H, W = m.shape[1], m.shape[2]
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / W, valid_h / H], axis=-1))
    return jnp.stack(ratios, axis=1)


def encoder_reference_points(spatial_shapes, valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Normalized per-pixel reference grid (reference L184-198).

    Returns (B, S, L, 2)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        ry, rx = jnp.meshgrid(ref_y, ref_x, indexing="ij")
        ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], axis=-1))
    ref = jnp.concatenate(refs, axis=1)                  # (B, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]       # (B, S, L, 2)


class EncoderLayer(nn.Module):
    """Deformable encoder layer: deformable self-attn + FFN (reference L132-175)."""
    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    variant: str = "image"
    # temporal parameters (devis only)
    n_frames: int = 6
    t_window: int = 2
    connect_all: bool = True
    n_curr_points: int = 4
    n_temporal_points: int = 2
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, padding_mask,
                 deterministic: bool = True):
        q = src + pos
        if self.variant == "devis":
            attn = TemporalMSDeformAttnEncoder(
                n_frames=self.n_frames, d_model=self.d_model,
                n_levels=self.n_levels, t_window=self.t_window,
                n_heads=self.n_heads, n_curr_points=self.n_curr_points,
                n_temporal_points=self.n_temporal_points,
                connect_all=self.connect_all, impl=self.impl, dtype=self.dtype,
                name="self_attn")
        else:
            attn = MSDeformAttn(d_model=self.d_model, n_levels=self.n_levels,
                                n_heads=self.n_heads, n_points=self.n_curr_points,
                                impl=self.impl, dtype=self.dtype, name="self_attn")
        src2 = attn(q, reference_points, src, spatial_shapes, padding_mask)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)

        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        y = nn.Dropout(self.dropout)(nn.relu(y), deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        src = src + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


class DecoderLayer(nn.Module):
    """Decoder layer: query self-attn, deformable cross-attn, FFN
    (reference L216-272; devis_transformer.py:126-132; ablation L42-71)."""
    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    variant: str = "image"
    n_frames: int = 6
    instance_aware: bool = True
    n_curr_points: int = 4
    n_temporal_points: int = 2
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 padding_mask, deterministic: bool = True):
        # Self-attention over all queries (for devis: all T*Nq jointly).
        q = k = tgt + query_pos
        tgt2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  dtype=self.dtype, name="self_attn")(
            q, k, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)

        # Cross-attention into the encoder memory.
        if self.variant == "devis":
            attn = TemporalMSDeformAttnDecoder(
                n_frames=self.n_frames, d_model=self.d_model,
                n_levels=self.n_levels, t_window=self.n_frames - 1,
                n_heads=self.n_heads, n_curr_points=self.n_curr_points,
                n_temporal_points=self.n_temporal_points,
                instance_aware=self.instance_aware, impl=self.impl,
                dtype=self.dtype, name="cross_attn")
            tgt2 = attn(tgt + query_pos, reference_points, src, spatial_shapes,
                        padding_mask)
        elif self.variant == "devis_ablation":
            # Per-frame cross attention (reference ablation L53-62).
            T = src.shape[0]
            B1, Lq_all, C = tgt.shape
            Lq = Lq_all // T
            attn = MSDeformAttn(d_model=self.d_model, n_levels=self.n_levels,
                                n_heads=self.n_heads, n_points=self.n_curr_points,
                                impl=self.impl, dtype=self.dtype, name="cross_attn")
            tgt_f = (tgt + query_pos).reshape(T, Lq, C)
            ref_f = reference_points.reshape((T, Lq) + reference_points.shape[-2:])
            tgt2 = attn(tgt_f, ref_f, src, spatial_shapes, padding_mask)
            tgt2 = tgt2.reshape(1, Lq_all, C)
        else:
            attn = MSDeformAttn(d_model=self.d_model, n_levels=self.n_levels,
                                n_heads=self.n_heads, n_points=self.n_curr_points,
                                impl=self.impl, dtype=self.dtype, name="cross_attn")
            tgt2 = attn(tgt + query_pos, reference_points, src, spatial_shapes,
                        padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        y = nn.Dropout(self.dropout)(nn.relu(y), deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        tgt = tgt + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)


class DeformableTransformer(nn.Module):
    """Full encoder/decoder with iterative reference refinement."""
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    with_gradient: bool = False
    variant: str = "image"
    # devis-specific
    num_frames: int = 6
    enc_connect_all: bool = True
    enc_temporal_window: int = 2
    enc_n_temporal_points: int = 2
    dec_n_temporal_points: int = 2
    instance_aware: bool = True
    impl: str = "auto"
    remat_layers: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model))
        self.reference_points = nn.Dense(
            2, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype)
        enc_t_window = (self.num_frames - 1 if self.enc_connect_all
                        else self.enc_temporal_window)
        enc_variant = "devis" if self.variant == "devis" else "image"
        # Per-layer remat (TPU.TRANSFORMER_GRADIENT_CHECKPOINT): only layer
        # inputs survive as autodiff residuals; everything inside recomputes
        # on the backward pass. static_argnums count `self` as 0 (flax
        # subtracts 1 internally): spatial_shapes + deterministic.
        enc_cls = (nn.remat(EncoderLayer, static_argnums=(4, 6))
                   if self.remat_layers else EncoderLayer)
        dec_cls = (nn.remat(DecoderLayer, static_argnums=(5, 7))
                   if self.remat_layers else DecoderLayer)
        self.encoder_layers = [
            enc_cls(self.d_model, self.dim_feedforward, self.dropout,
                         self.num_feature_levels, self.n_heads,
                         variant=enc_variant, n_frames=self.num_frames,
                         t_window=enc_t_window, connect_all=self.enc_connect_all,
                         n_curr_points=self.enc_n_points,
                         n_temporal_points=self.enc_n_temporal_points,
                         impl=self.impl, dtype=self.dtype,
                         name=f"encoder_layers_{i}")
            for i in range(self.num_encoder_layers)]
        self.decoder_layers = [
            dec_cls(self.d_model, self.dim_feedforward, self.dropout,
                         self.num_feature_levels, self.n_heads,
                         variant=self.variant, n_frames=self.num_frames,
                         instance_aware=self.instance_aware,
                         n_curr_points=self.dec_n_points,
                         n_temporal_points=self.dec_n_temporal_points,
                         impl=self.impl, dtype=self.dtype,
                         name=f"decoder_layers_{i}")
            for i in range(self.num_decoder_layers)]

    def _refine(self, lid, output, reference_points, bbox_embed, ref_point_embed):
        """Iterative reference refinement (reference L286-313)."""
        if bbox_embed is not None:
            tmp = bbox_embed[lid](output)
            if reference_points.shape[-1] == 4:
                new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
            else:
                xy = tmp[..., :2] + inverse_sigmoid(reference_points)
                new_ref = jax.nn.sigmoid(
                    jnp.concatenate([xy, tmp[..., 2:]], axis=-1))
            reference_points = (new_ref if self.with_gradient
                                else jax.lax.stop_gradient(new_ref))
        if ref_point_embed is not None:
            tmp = ref_point_embed[lid](output)
            reference_points = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
        return reference_points

    def __call__(self, srcs: List[jnp.ndarray], masks: List[jnp.ndarray],
                 pos_embeds: List[jnp.ndarray], query_embed: jnp.ndarray,
                 bbox_embed=None, ref_point_embed=None,
                 deterministic: bool = True):
        """srcs/pos: NHWC per level; masks: (B, H, W) bool per level;
        query_embed: (num_queries, 2*d_model)."""
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        B = srcs[0].shape[0]
        C = self.d_model

        src_flat = jnp.concatenate(
            [s.reshape(B, -1, C) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [(p.reshape(B, -1, C) + self.level_embed[l][None, None, :]).astype(self.dtype)
             for l, p in enumerate(pos_embeds)], axis=1)
        valid_ratios = get_valid_ratios(masks)            # (B, L, 2)

        # --- encoder ---
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        memory = src_flat.astype(self.dtype)
        for layer in self.encoder_layers:
            # deterministic passed positionally: nn.remat static_argnums
            # cover positional args only
            memory = layer(memory, pos_flat, enc_ref, spatial_shapes, mask_flat,
                           deterministic)

        # --- decoder prep (reference L104-110 / devis L49-56) ---
        query_pos, tgt = jnp.split(query_embed.astype(self.dtype), 2, axis=1)
        if self.variant == "image":
            query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
            tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)
            dec_valid_ratios = valid_ratios
        else:
            query_pos = query_pos[None]
            tgt = tgt[None]
            dec_valid_ratios = valid_ratios[0:1]          # first frame (devis L163-166)
        reference_points = jax.nn.sigmoid(self.reference_points(query_pos))
        init_reference = reference_points

        # --- decoder ---
        intermediate, intermediate_refs = [], []
        output = tgt
        for lid, layer in enumerate(self.decoder_layers):
            if reference_points.shape[-1] == 4:
                vr = jnp.concatenate([dec_valid_ratios, dec_valid_ratios], axis=-1)
            else:
                vr = dec_valid_ratios
            ref_input = reference_points[:, :, None] * vr[:, None]
            output = layer(output, query_pos, ref_input, memory, spatial_shapes,
                           mask_flat, deterministic)
            reference_points = self._refine(lid, output, reference_points,
                                            bbox_embed, ref_point_embed)
            intermediate.append(output)
            intermediate_refs.append(reference_points)

        hs = jnp.stack(intermediate)                      # (n_layers, B, Lq, C)
        inter_references = jnp.stack(intermediate_refs)

        # --- unflatten memory per level ---
        memories = []
        offset = 0
        for (h, w) in spatial_shapes:
            memories.append(memory[:, offset:offset + h * w].reshape(B, h, w, C))
            offset += h * w

        return dict(hs=hs, query_pos=query_pos, memories=memories,
                    init_reference=init_reference,
                    inter_references=inter_references,
                    valid_ratios=valid_ratios, spatial_shapes=spatial_shapes)
