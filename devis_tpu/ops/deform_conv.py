"""Modulated deformable convolution (DCNv2) for the mask head.

TPU-native equivalent of `torchvision.ops.deform_conv2d` as used by the
reference's mask head (`src/models/deformable_segmentation.py:244-267`):
offsets and modulation masks are predicted by small convs, then each output
pixel gathers K×K bilinear samples. Implemented as a jnp bilinear-gather over
the feature map (same convention as torch: sample position =
base_grid + kernel_offset + learned_offset, zero padding outside).

Offset channel layout matches torch: (2*K*K) ordered (y, x) per kernel
position, row-major kernel positions.

Two backends: the Pallas MSDA kernel with the channel mix folded BEFORE the
gather (TPU; see `_deform_conv2d_pallas`), and a plain jnp-gather path (CPU
tests / fallback) whose K*K positions are accumulated in an unrolled loop —
an im2col (B, H, W, K*K, Cin) buffer at mask-head shapes is ~6 GB and blew
HBM; per-tap accumulation peaks at (B, H, W, Cin).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray,
                  padding: int = 1, impl: str = "auto") -> jnp.ndarray:
    """Dispatch: the Pallas one-hot-matmul sampler on TPU (XLA's row-gather
    is serial there), plain jnp gathers elsewhere."""
    from .ms_deform_attn import resolve_impl
    impl = resolve_impl(impl)
    if impl == "pallas":
        # Rematerialize in the backward pass: the per-position gathered maps
        # are (B·K², HW, Cin) with a small minor dim that XLA tile-pads up to
        # 8× — saving them as autodiff residuals across all mask-head layers
        # blows HBM (observed 25 GB at train shapes).
        return jax.checkpoint(
            lambda *a: _deform_conv2d_pallas(*a, padding))(
            x, offset, mask, weight, bias)
    return _deform_conv2d_xla(x, offset, mask, weight, bias, padding)


def _deform_conv2d_pallas(x, offset, mask, weight, bias, padding=1,
                          vmem_budget: int = 10 * 1024 * 1024):
    """Deformable conv with the channel mix folded BEFORE the gather.

    Bilinear sampling is linear and the conv weight is constant over space, so
        out(p) = Σ_k m_k(p) · bilinear(x, p+k+Δ_k(p)) @ W_k
               = Σ_k m_k(p) · bilinear(x @ W_k, p+k+Δ_k(p)).
    We precompute U_k = x @ W_k per kernel position (one MXU einsum) and
    gather the K² positions as K² *levels* of a single standard MSDA call
    (1 head, P=1, modulation mask as attention weight). Compared with the
    earlier grouped-head form this removes the (B, HW, K²·Cin) gathered
    intermediate, its `lax.map` batch chunking, and the post-gather einsum —
    the kernel writes the final (B, HW, Cout) directly, and each grid cell
    amortizes its overhead over K² levels instead of 4 taps.

    Positions are processed in groups so the level-stacked value buffer fits
    VMEM: a (rows, Cout) block lane-pads Cout up to 128, so per-level VMEM is
    `2 · packed_rows · 128 · itemsize` regardless of Cout."""
    from .ms_deform_attn_pallas import (S_TILE, _round_up,
                                        ms_deform_attn_pallas)
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    off = offset.reshape(B, H, W, KK, 2)
    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    ky = (jnp.arange(KK, dtype=jnp.float32) // K)[None, None, None]
    kx = (jnp.arange(KK, dtype=jnp.float32) % K)[None, None, None]
    # MSDA convention: pixel = loc·size − 0.5  ⇒  loc = (pixel + 0.5)/size
    sy = (base_y + (ky - padding) + off[..., 0] + 0.5) / H   # (B, H, W, KK)
    sx = (base_x + (kx - padding) + off[..., 1] + 0.5) / W
    loc = jnp.stack([sx, sy], axis=-1).reshape(B, H * W, 1, KK, 1, 2)
    att = mask.reshape(B, H * W, 1, KK, 1)
    w_kk = weight.reshape(KK, Cin, Cout)
    xq = x.reshape(B, H * W, Cin)

    rows2 = _round_up(-(-H * W // 2), S_TILE)
    per_level = 2 * rows2 * 128 * x.dtype.itemsize
    per_call = max(1, min(KK, vmem_budget // per_level))
    out = jnp.zeros((B, H * W, Cout), jnp.float32)
    for g0 in range(0, KK, per_call):
        g1 = min(g0 + per_call, KK)
        # TPU f32 dots default to bf16 multiplies; pin true-f32 precision on
        # the f32 (parity/debug) path — the bf16 inference path is unaffected.
        prec = ("highest" if x.dtype == jnp.float32 else None)
        u = jnp.einsum("bqc,kcd->bkqd", xq, w_kk[g0:g1].astype(x.dtype),
                       preferred_element_type=jnp.float32,
                       precision=prec).astype(x.dtype)
        # Query tile scaled with the map width: the s-span floor is the
        # static kernel extent (~2.5 rows · W pixels), so wider maps need
        # more queries per tile to amortize it (measured: 256 best at
        # W=80, 20 ms/call at W=304 with 256).
        q_tile = 256 if W <= 96 else (512 if W <= 192 else 1024)
        o = ms_deform_attn_pallas(u.reshape(B, (g1 - g0) * H * W, 1, Cout),
                                  ((H, W),) * (g1 - g0),
                                  loc[:, :, :, g0:g1], att[:, :, :, g0:g1],
                                  q_tile)
        out = out + o.astype(jnp.float32)
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
