"""Positional encodings (reference: src/models/position_encoding.py).

All operate on the padding mask (B, H, W) and return NHWC embeddings so they
compose with the NHWC feature maps of the TPU backbone.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def sine_position_encoding(mask: jnp.ndarray, num_pos_feats: int,
                           temperature: float = 10000.0,
                           normalize: bool = True,
                           scale: Optional[float] = None) -> jnp.ndarray:
    """2D sine positional encoding (reference: position_encoding.py:62-103).

    mask: (B, H, W) bool, True on padding. Returns (B, H, W, 2*num_pos_feats).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t                    # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)       # (B, H, W, 2F)


class PositionEmbeddingSine(nn.Module):
    num_pos_feats: int = 128

    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        return sine_position_encoding(mask, self.num_pos_feats)


class PositionEmbeddingSineWithLearnableTemporal(nn.Module):
    """2D sine + learned per-frame embedding; VIS default
    (reference: position_encoding.py:106-124). Batch axis = frames."""
    hidden_dim: int = 256
    num_frames: int = 6

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        pos_xy = sine_position_encoding(mask, self.hidden_dim // 2)
        temporal = self.param("temporal_embed", nn.initializers.normal(1.0),
                              (self.num_frames, self.hidden_dim))
        assert mask.shape[0] == self.num_frames, \
            f"VIS positional encoding expects T={self.num_frames} frames, got {mask.shape[0]}"
        return pos_xy + temporal[:, None, None, :]


class PositionEmbeddingSpatialTemporalSine(nn.Module):
    """VisTR-style (x, y, t) sine encoding; requires hidden_dim 252 padded to 256
    (reference: position_encoding.py:12-59). Batch axis = frames."""
    num_pos_feats: int = 84
    num_frames: int = 6
    temperature: float = 10000.0

    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        scale = 2 * math.pi
        T, H, W = mask.shape
        not_mask = (~mask).astype(jnp.float32)[None]      # (1, T, H, W)
        z_embed = jnp.cumsum(not_mask, axis=1)
        y_embed = jnp.cumsum(not_mask, axis=2)
        x_embed = jnp.cumsum(not_mask, axis=3)
        eps = 1e-6
        z_embed = z_embed / (z_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale
        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)

        def enc(e):
            p = e[..., None] / dim_t
            return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                             axis=-1).reshape(*p.shape[:-1], -1)

        pos = jnp.concatenate([enc(z_embed), enc(y_embed), enc(x_embed)], axis=-1)
        pad = jnp.zeros(pos.shape[:-1] + (4,), pos.dtype)
        return jnp.concatenate([pos, pad], axis=-1)[0]    # (T, H, W, 256)


def build_position_encoding(cfg):
    if cfg.DATASETS.TYPE == "vis":
        kind = cfg.MODEL.DEVIS.TEMPORAL_EMBEDDING
        if kind == "learned":
            return PositionEmbeddingSineWithLearnableTemporal(
                hidden_dim=cfg.MODEL.HIDDEN_DIM,
                num_frames=cfg.MODEL.DEVIS.NUM_FRAMES)
        if kind == "sine":
            assert cfg.MODEL.HIDDEN_DIM == 252
            return PositionEmbeddingSpatialTemporalSine(
                num_pos_feats=84, num_frames=cfg.MODEL.DEVIS.NUM_FRAMES)
        raise NotImplementedError(f"temporal embedding {kind}")
    return PositionEmbeddingSine(num_pos_feats=cfg.MODEL.HIDDEN_DIM // 2)
