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

import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray,
                  padding: int = 1, impl: str = "auto") -> jnp.ndarray:
    """Dispatch: the Pallas one-hot-matmul sampler on TPU (XLA's row-gather
    is serial there), plain jnp gathers elsewhere."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    fn = _deform_conv2d_pallas if impl == "pallas" else _deform_conv2d_xla
    return fn(x, offset, mask, weight, bias, padding)


def _deform_conv2d_pallas(x, offset, mask, weight, bias, padding=1):
    """Deformable conv as K×K deformable-attention gathers + channel mixes.

    Each kernel position k is one MSDA call (single level, P=1, heads=1):
    sampling location = base grid + kernel offset + learned offset, attention
    weight = modulation mask; channel mixing with weight[k] happens after the
    gather, so one Pallas kernel serves both ops."""
    from .ms_deform_attn_pallas import ms_deform_attn_pallas
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    Cout = weight.shape[-1]
    off = offset.reshape(B, H, W, K * K, 2)
    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    value = x.reshape(B, H * W, 1, Cin)
    out = jnp.zeros((B, H * W, Cout), jnp.float32)
    for k in range(K * K):
        ky, kx = k // K, k % K
        # MSDA convention: pixel = loc·size − 0.5  ⇒  loc = (pixel + 0.5)/size
        sy = (base_y + (ky - padding) + off[..., k, 0] + 0.5) / H
        sx = (base_x + (kx - padding) + off[..., k, 1] + 0.5) / W
        loc = jnp.stack([sx, sy], axis=-1).reshape(B, H * W, 1, 1, 1, 2)
        att = mask[..., k].reshape(B, H * W, 1, 1, 1)
        g = ms_deform_attn_pallas(value, ((H, W),), loc, att)  # (B, HW, Cin)
        out = out + g.astype(jnp.float32) @ weight[ky, kx].astype(jnp.float32)
    return (out.reshape(B, H, W, Cout) + bias).astype(x.dtype)


def _deform_conv2d_xla(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
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
