"""Modulated deformable convolution (DCNv2) for the mask head.

TPU-native equivalent of `torchvision.ops.deform_conv2d` as used by the
reference's mask head (`src/models/deformable_segmentation.py:244-267`):
offsets and modulation masks are predicted by small convs, then each output
pixel gathers K×K bilinear samples. Implemented as a jnp bilinear-gather over
the feature map (same convention as torch: sample position =
base_grid + kernel_offset + learned_offset, zero padding outside).

Offset channel layout matches torch: (2*K*K) ordered (y, x) per kernel
position, row-major kernel positions.

Two backends: the Pallas MSDA kernel with grouped heads (TPU), and a plain
jnp-gather path (CPU tests / fallback) whose K*K positions are accumulated in
an unrolled loop — an im2col (B, H, W, K*K, Cin) buffer at mask-head shapes
is ~6 GB and blew HBM; per-tap accumulation peaks at (B, H, W, Cin).
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
                          chunk_elems: int = 64 * 1024 * 1024):
    """Deformable conv as ONE deformable-attention call per batch chunk.

    The K² kernel positions ride the MSDA head axis as *grouped heads* that
    share a single value head (the kernel maps the group's grid rows onto one
    value block — no HBM replication of x): head k's sampling location =
    base grid + kernel offset_k + learned offset_k, attention weight = the
    modulation mask. Channel mixing with weight[k] happens AFTER the gather
    on the per-head outputs, so the gathered dim stays D = Cin
    (lane-friendly) for ANY Cout — including the mask head's 1-channel
    out_lay, where a pre-mixed Cout=1 value hits XLA's 128× tile padding on
    the size-1 minor dim (11 GB temps).

    The mask head runs this with batch = trajectories × frames (hundreds);
    the batch is processed in `lax.map` chunks to bound peak HBM."""
    from .ms_deform_attn_pallas import ms_deform_attn_pallas
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
    # kernel positions ride the HEAD axis as K² GROUPED heads sharing one
    # value head (the kernel maps G consecutive grid rows to one value block,
    # so x is never replicated in HBM). Channel mixing with weight[k] happens
    # AFTER the gather on per-head outputs — the gathered dim stays D = Cin
    # (lane-friendly) for ANY Cout, including the 1-channel out_lay (a
    # pre-mixed Cout=1 value hits XLA's 128× tile padding on the size-1
    # minor dim → 11 GB temps).
    loc = jnp.stack([sx, sy], axis=-1).reshape(B, H * W, KK, 1, 1, 2)
    att = mask.reshape(B, H * W, KK, 1, 1)
    w_kk = weight.reshape(KK, Cin, Cout)

    def run(args):
        xc, locc, attc = args
        c = xc.shape[0]
        value = xc.reshape(c, H * W, 1, Cin)          # 1 value head, G = K²
        out_h = ms_deform_attn_pallas(value, ((H, W),), locc, attc)
        return out_h                                  # (c, HW, KK·Cin)

    per_item = KK * H * W * Cin
    chunk = max(1, min(B, chunk_elems // per_item))
    if B % chunk:
        pad = chunk - B % chunk
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * 3)
        loc = jnp.pad(loc, ((0, pad),) + ((0, 0),) * 5)
        att = jnp.pad(att, ((0, pad),) + ((0, 0),) * 4)
    n_chunks = x.shape[0] // chunk
    if n_chunks == 1:
        g = run((x, loc, att))
    else:
        g = jax.lax.map(run, (x.reshape(n_chunks, chunk, H, W, Cin),
                              loc.reshape(n_chunks, chunk, H * W, KK, 1, 1, 2),
                              att.reshape(n_chunks, chunk, H * W, KK, 1, 1)))
        g = g.reshape(n_chunks * chunk, H * W, KK * Cin)
    g = g[:B].reshape(B, H * W, KK, Cin)
    out = jnp.einsum("bqkc,kcd->bqd", g, w_kk.astype(g.dtype),
                     preferred_element_type=jnp.float32)
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
