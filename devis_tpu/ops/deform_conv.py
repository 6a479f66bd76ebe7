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

import functools

import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray,
                  padding: int = 1, impl: str = "auto") -> jnp.ndarray:
    """Dispatch: the banded (rebased-window) kernel on TPU — forward via
    branch-free tent FMAs, backward through the one-hot route's VJP
    (`deform_conv_banded.py`); `impl="pallas"` keeps the one-hot forward;
    plain jnp gathers elsewhere."""
    from .ms_deform_attn import resolve_impl
    impl = resolve_impl(impl)
    if impl == "pallas":
        from .deform_conv_banded import deform_conv2d_banded  # noqa: F401
        return _deform_conv2d_banded_diff(x, offset, mask, weight, bias,
                                          padding)
    return _deform_conv2d_xla(x, offset, mask, weight, bias, padding)


def deform_conv2d_onehot(x, offset, mask, weight, bias, padding: int = 1):
    """The one-hot-matmul route with remat (the pre-banded TPU default;
    kept for comparison benchmarks and as the backward recipe)."""
    # Rematerialize in the backward pass: the per-position gathered maps
    # are (B·K², HW, Cin) with a small minor dim that XLA tile-pads up to
    # 8× — saving them as autodiff residuals across all mask-head layers
    # blows HBM (observed 25 GB at train shapes).
    return jax.checkpoint(
        lambda *a: _deform_conv2d_pallas(*a, padding))(
        x, offset, mask, weight, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _deform_conv2d_banded_diff(x, offset, mask, weight, bias, padding):
    from .deform_conv_banded import deform_conv2d_banded
    return deform_conv2d_banded(x, offset, mask, weight, bias, padding)


def _banded_diff_fwd(x, offset, mask, weight, bias, padding):
    # Under differentiation (training) the FORWARD is the exact one-hot
    # route, not the banded kernel: the VJP computes gradients of the exact
    # composition, and a banded primal would make the loss see dropped
    # out-of-band taps the gradients never account for — training pressure
    # can push offsets out of band and the mask head stops converging
    # (caught by the r5 overfit trendline: AP 72 → 0). Inference (no grad)
    # still runs the fast banded kernel via the custom_vjp primal.
    return (_deform_conv2d_pallas(x, offset, mask, weight, bias, padding),
            (x, offset, mask, weight, bias))


def _banded_diff_bwd(padding, res, g):
    # gradients through the differentiable one-hot route (recomputes its
    # forward — the training path rematerialized here before as well)
    _, vjp = jax.vjp(lambda *a: _deform_conv2d_pallas(*a, padding), *res)
    return vjp(g)


_deform_conv2d_banded_diff.defvjp(_banded_diff_fwd, _banded_diff_bwd)


def conv2d_nhwc(x, kernel, bias, padding: int):
    """Plain NHWC conv (the reference's offset/modulator field convs,
    `deformable_segmentation.py:250-256`)."""
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def modulated_deform_conv2d(x, w_off, b_off, w_mod, b_mod, weight, bias,
                            padding: int = 1, ncand: int = 4,
                            ncand_y: int = 4):
    """Full DCNv2 layer (field convs + deformable conv) with the TPU
    inference forward fully fused into the banded kernel
    (`deform_conv_banded.deform_conv2d_banded_fused`) — no XLA-side
    offset/modulator materialization. Semantics:
        offset = conv(x, w_off) + b_off
        mod    = 2·sigmoid(conv(x, w_mod) + b_mod)
        out    = deform_conv2d(x, offset, mod, weight, bias)
    ``ncand``/``ncand_y`` set the banded candidate window per axis.
    Backward runs the differentiable composition (XLA field convs + one-hot
    VJP), mirroring `_deform_conv2d_banded_diff`."""
    from .deform_conv_banded import deform_conv2d_banded_fused
    return deform_conv2d_banded_fused(x, w_off, b_off, w_mod, b_mod,
                                      weight, bias, padding, ncand=ncand,
                                      ncand_y=ncand_y)


def _mdc_reference(x, w_off, b_off, w_mod, b_mod, weight, bias, padding):
    offset = conv2d_nhwc(x, w_off, b_off, padding)
    mod = 2.0 * jax.nn.sigmoid(conv2d_nhwc(x, w_mod, b_mod, padding))
    return _deform_conv2d_pallas(x, offset, mod, weight, bias, padding)


def _mdc_fwd(x, w_off, b_off, w_mod, b_mod, weight, bias, padding, ncand,
             ncand_y):
    # exact composition under differentiation — see `_banded_diff_fwd`
    return (_mdc_reference(x, w_off, b_off, w_mod, b_mod, weight, bias,
                           padding),
            (x, w_off, b_off, w_mod, b_mod, weight, bias))


def _mdc_bwd(padding, ncand, ncand_y, res, g):
    _, vjp = jax.vjp(lambda *a: _mdc_reference(*a, padding), *res)
    return vjp(g)


modulated_deform_conv2d.defvjp(_mdc_fwd, _mdc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def modulated_deform_conv2d_cf(x, w_off, b_off, w_mod, b_mod, weight, bias,
                               padding: int = 1, ncand: int = 4,
                               ncand_y: int = 4):
    """`modulated_deform_conv2d` on channel-first (B, C, H, W) input/output —
    the mask-head spine chains DCNv2 layers channel-first so the per-layer
    NHWC↔NCHW round trips (and the ~GB staged-buffer transpose) disappear.
    Backward transposes to the NHWC differentiable composition."""
    from .deform_conv_banded import deform_conv2d_banded_fused
    return deform_conv2d_banded_fused(x, w_off, b_off, w_mod, b_mod,
                                      weight, bias, padding, ncand=ncand,
                                      ncand_y=ncand_y, channel_first=True)


def _mdc_cf_fwd(x, w_off, b_off, w_mod, b_mod, weight, bias, padding, ncand,
                ncand_y):
    # exact composition under differentiation — see `_banded_diff_fwd`
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    out = _mdc_reference(x_nhwc, w_off, b_off, w_mod, b_mod, weight, bias,
                         padding)
    return (jnp.transpose(out, (0, 3, 1, 2)),
            (x, w_off, b_off, w_mod, b_mod, weight, bias))


def _mdc_cf_bwd(padding, ncand, ncand_y, res, g):
    x_cf, *rest = res
    x = jnp.transpose(x_cf, (0, 2, 3, 1))
    _, vjp = jax.vjp(lambda *a: _mdc_reference(*a, padding), x, *rest)
    gx, *gr = vjp(jnp.transpose(g, (0, 2, 3, 1)))
    return (jnp.transpose(gx, (0, 3, 1, 2)), *gr)


modulated_deform_conv2d_cf.defvjp(_mdc_cf_fwd, _mdc_cf_bwd)


def _deform_conv2d_pallas(x, offset, mask, weight, bias, padding=1):
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

    Positions are processed in VMEM-bounded groups by the rows-form op
    (`ms_deform_attn_rows_auto`): a (rows, Cout) value block lane-pads Cout
    up to 128, so per-level VMEM is `2·packed_rows·128·itemsize` regardless
    of Cout."""
    from .ms_deform_attn_pallas import _round_up, ms_deform_attn_rows_auto
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    HW = H * W
    # Sampling-location ROWS built directly in kernel layout (B·1head, KK, q):
    # one transpose of the offset/modulation conv outputs replaces the
    # q-major (B, HW, 1, KK, 1, 2) loc materialization and the per-call
    # transposes inside the loc-form op.
    f32 = jnp.float32
    off_r = jnp.transpose(offset.reshape(B, HW, KK, 2),
                          (0, 2, 3, 1)).astype(f32)        # (B, KK, 2, HW)
    at = jnp.transpose(mask.reshape(B, HW, KK), (0, 2, 1)).astype(f32)
    qs = jnp.arange(HW, dtype=f32)[None, None]
    base_x = qs % W
    base_y = jnp.floor(qs / W)
    ky = (jnp.arange(KK, dtype=f32) // K)[None, :, None]
    kx = (jnp.arange(KK, dtype=f32) % K)[None, :, None]
    # MSDA convention: pixel = loc·size − 0.5  ⇒  loc = (pixel + 0.5)/size
    ly = (base_y + (ky - padding) + off_r[:, :, 0] + 0.5) / H  # (B, KK, HW)
    lx = (base_x + (kx - padding) + off_r[:, :, 1] + 0.5) / W

    # TPU f32 dots default to bf16 multiplies; pin true-f32 precision on the
    # f32 (parity/debug) path — the bf16 inference path is unaffected.
    prec = ("highest" if x.dtype == jnp.float32 else None)
    u = jnp.einsum("bqc,kcd->bkqd", x.reshape(B, HW, Cin),
                   weight.reshape(KK, Cin, Cout).astype(x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=prec).astype(x.dtype)

    # Query tile scaled with the map width: the s-span floor is the static
    # kernel extent (~2.5 rows · W pixels), so wider maps need more queries
    # per tile to amortize it (measured sweep in docs/PERFORMANCE.md).
    q_tile = 256 if W <= 96 else (512 if W <= 192 else 1024)
    q_pad = _round_up(HW, q_tile)
    if q_pad != HW:
        qp = ((0, 0), (0, 0), (0, q_pad - HW))
        lx = jnp.pad(lx, qp, constant_values=-10.0)  # OOB → all weights 0
        ly = jnp.pad(ly, qp, constant_values=-10.0)
        at = jnp.pad(at, qp)
    out = ms_deform_attn_rows_auto(u.reshape(B, KK * HW, 1, Cout),
                                   ((H, W),) * KK, lx, ly, at, HW, q_tile)
    return (out.reshape(B, H, W, Cout).astype(jnp.float32)
            + bias).astype(x.dtype)


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
