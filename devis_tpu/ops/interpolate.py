"""Torch-parity image resizing in jnp.

The reference uses `F.interpolate` pervasively (mask heads, mask losses,
postprocessing, per-level padding-mask downsampling). Exact semantics matter
for checkpoint parity, so both modes are implemented to match torch:

  * bilinear, align_corners=False — half-pixel centers, edge-clamped
    (same as the reference's mask upsampling, e.g. deformable_segmentation.py:442).
  * nearest (torch default "nearest", NOT nearest-exact) —
    src = floor(dst * src_size / dst_size)  (used for mask-pyramid
    downsampling, backbone.py:80, and FPN upsampling, deformable_segmentation.py:370).

Inputs are NHWC (TPU-native layout).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C) to (..., h, w, C), torch semantics."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    ys = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h_in - 1)
    xs = jnp.clip(xs, 0, w_in - 1)
    return x[..., ys, :, :][..., :, xs, :]


def _linear_weights(in_size: int, out_size: int):
    """Half-pixel-center source indices and lerp weights for one axis."""
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = coords - lo.astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., h, w, C), align_corners=False."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    ylo, yhi, wy = _linear_weights(h_in, h_out)
    xlo, xhi, wx = _linear_weights(w_in, w_out)

    top = xf[..., ylo, :, :]
    bot = xf[..., yhi, :, :]
    wy_b = wy[:, None, None]
    rows = top * (1 - wy_b) + bot * wy_b               # (..., h_out, W, C)
    left = rows[..., :, xlo, :]
    right = rows[..., :, xhi, :]
    wx_b = wx[:, None]
    out = left * (1 - wx_b) + right * wx_b             # (..., h_out, w_out, C)
    return out.astype(dtype)


def downsample_mask(mask: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Downsample a boolean padding mask (N, H, W) to (N, h, w).

    Matches the reference's `F.interpolate(mask.float(), size).bool()`
    (nearest), used to build per-level masks (backbone.py:80).
    """
    m = resize_nearest(mask.astype(jnp.float32)[..., None], size)[..., 0]
    return m > 0.5
