"""Modulated deformable convolution (DCNv2) for the mask head.

TPU-native equivalent of `torchvision.ops.deform_conv2d` as used by the
reference's mask head (`src/models/deformable_segmentation.py:244-267`):
offsets and modulation masks are predicted by small convs, then each output
pixel gathers K×K bilinear samples. Implemented as a jnp bilinear-gather over
the feature map (same convention as torch: sample position =
base_grid + kernel_offset + learned_offset, zero padding outside).

Offset channel layout matches torch: (2*K*K) ordered (y, x) per kernel
position, row-major kernel positions.

Memory layout note: the K*K kernel positions are accumulated in a Python loop
(unrolled, statically scheduled by XLA) rather than materialized as an
im2col tensor — a (B, H, W, K*K, Cin) buffer at mask-head shapes is ~6 GB and
blew HBM; per-tap accumulation peaks at (B, H, W, Cin) and lets XLA fuse each
tap's modulation multiply into its matmul.
"""
from __future__ import annotations

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
    Cout = weight.shape[-1]

    off = offset.reshape(B, H, W, KK, 2)
    flat = x.reshape(B, H * W, Cin)

    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    out = jnp.zeros((B, H, W, Cout), x.dtype)
    for k in range(KK):
        ky, kx = k // K, k % K
        sy = base_y + (ky - padding) + off[..., k, 0]      # (B, H, W)
        sx = base_x + (kx - padding) + off[..., k, 1]
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        dy = (sy - y0).astype(x.dtype)
        dx = (sx - x0).astype(x.dtype)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        def tap(yi, xi, tw):
            valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            g = jnp.take_along_axis(flat, idx.reshape(B, -1)[..., None],
                                    axis=1).reshape(B, H, W, Cin)
            return g * (tw * valid.astype(x.dtype))[..., None]

        sampled = (tap(y0i, x0i, (1 - dy) * (1 - dx))
                   + tap(y0i, x0i + 1, (1 - dy) * dx)
                   + tap(y0i + 1, x0i, dy * (1 - dx))
                   + tap(y0i + 1, x0i + 1, dy * dx))       # (B, H, W, Cin)
        sampled = sampled * mask[..., k, None]
        out = out + sampled @ weight[ky, kx].astype(x.dtype)
    return out + bias.astype(x.dtype)
