"""Torch-parity image resizing in jnp, formulated as matmuls.

The reference uses `F.interpolate` pervasively (mask heads, mask losses,
postprocessing, per-level padding-mask downsampling). Exact semantics matter
for checkpoint parity, so both modes match torch:

  * bilinear, align_corners=False — half-pixel centers, edge-clamped
    (same as the reference's mask upsampling, deformable_segmentation.py:442).
  * nearest (torch default "nearest", NOT nearest-exact) —
    src = floor(dst * src_size / dst_size)  (used for mask-pyramid
    downsampling, backbone.py:80, and FPN upsampling,
    deformable_segmentation.py:370).

TPU-native formulation: separable resize = two small matmuls with constant
interpolation matrices (out = A_h · X · A_wᵀ). Row-gather indexing would
lower to XLA's serial gather loop on TPU; the matrices are trace-time
constants, so XLA folds them straight onto the MXU.

Inputs are NHWC (TPU-native layout).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Half-pixel-center lerp weights (torch align_corners=False)."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (coords - lo).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), lo] += 1.0 - w_hi
    mat[np.arange(out_size), hi] += w_hi
    return mat


def _apply_separable(x: jnp.ndarray, mat_h: np.ndarray, mat_w: np.ndarray):
    """(..., H, W, C) → (..., h, w, C) via A_h · X · A_wᵀ."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # rows: contract H with A_h → output axis goes last, move back into place
    y = jnp.tensordot(xf, jnp.asarray(mat_h), axes=[[-3], [1]])
    y = jnp.moveaxis(y, -1, -3)                     # (..., h, W, C)
    y = jnp.tensordot(y, jnp.asarray(mat_w), axes=[[-2], [1]])
    y = jnp.moveaxis(y, -1, -2)                     # (..., h, w, C)
    return y.astype(dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C), torch semantics."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == tuple(size):
        return x
    return _apply_separable(x, _nearest_matrix(h_in, size[0]),
                            _nearest_matrix(w_in, size[1]))


def resize_nearest_hw(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W) — channel-first layouts."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    if (h_in, w_in) == tuple(size):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = jnp.tensordot(xf, jnp.asarray(_nearest_matrix(h_in, size[0])),
                      axes=[[-2], [1]])
    y = jnp.moveaxis(y, -1, -2)                     # (..., h, W)
    y = jnp.tensordot(y, jnp.asarray(_nearest_matrix(w_in, size[1])),
                      axes=[[-1], [1]])             # (..., h, w)
    return y.astype(dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C), align_corners=False."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == tuple(size):
        return x
    return _apply_separable(x, _bilinear_matrix(h_in, size[0]),
                            _bilinear_matrix(w_in, size[1]))


def downsample_mask(mask: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Downsample a boolean padding mask (N, H, W) to (N, h, w).

    Matches the reference's `F.interpolate(mask.float(), size).bool()`
    (nearest), used to build per-level masks (backbone.py:80).
    """
    m = resize_nearest(mask.astype(jnp.float32)[..., None], size)[..., 0]
    return m > 0.5
