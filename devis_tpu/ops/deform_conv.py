"""Modulated deformable convolution (DCNv2) for the mask head.

TPU-native equivalent of `torchvision.ops.deform_conv2d` as used by the
reference's mask head (`src/models/deformable_segmentation.py:244-267`):
offsets and modulation masks are predicted by small convs, then each output
pixel gathers K×K bilinear samples. Implemented as a jnp bilinear-gather over
the feature map (same convention as torch: sample position =
base_grid + kernel_offset + learned_offset, zero padding outside).

Offset channel layout matches torch: (2*K*K) ordered (y, x) per kernel
position, row-major kernel positions.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray,
                  padding: int = 1) -> jnp.ndarray:
    """x: (B, H, W, Cin) NHWC; offset: (B, H, W, 2*K*K) (y,x interleaved);
    mask: (B, H, W, K*K) modulation; weight: (K, K, Cin, Cout); bias: (Cout,).
    Stride 1, dilation 1 (all the reference's mask head uses).
    Returns (B, H, W, Cout)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K

    off = offset.reshape(B, H, W, KK, 2)
    oy, ox = off[..., 0], off[..., 1]

    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    ky = jnp.arange(K, dtype=jnp.float32).repeat(K)[None, None, None, :]
    kx = jnp.tile(jnp.arange(K, dtype=jnp.float32), K)[None, None, None, :]

    sy = base_y + ky - padding + oy                       # (B, H, W, KK)
    sx = base_x + kx - padding + ox

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    dy = sy - y0
    dx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi, tw):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (B,H,W,KK)
        flat = x.reshape(B, H * W, Cin)
        g = jnp.take_along_axis(flat, idx.reshape(B, -1)[..., None], axis=1)
        g = g.reshape(B, H, W, KK, Cin)
        return g * (tw * valid.astype(x.dtype))[..., None]

    sampled = (tap(y0i, x0i, (1 - dy) * (1 - dx))
               + tap(y0i, x0i + 1, (1 - dy) * dx)
               + tap(y0i + 1, x0i, dy * (1 - dx))
               + tap(y0i + 1, x0i + 1, dy * dx))          # (B, H, W, KK, Cin)
    sampled = sampled * mask[..., None]

    w = weight.transpose(0, 1, 2, 3).reshape(KK * Cin, -1)  # (KK*Cin, Cout)
    out = sampled.reshape(B, H, W, KK * Cin) @ w.astype(x.dtype)
    return out + bias.astype(x.dtype)
