"""Banded (rebased-window) modulated deformable convolution — mask-head hot path.

The one-hot-matmul route (`deform_conv.py::_deform_conv2d_pallas`) streams a
window-span's worth of one-hot weight rows through the MXU for EVERY
(instance, kernel position): at COCO /4 shapes that is ~150 ms of pure
selection overhead for ~0.2 ms of useful MACs, because a 3×3 deformable conv
only ever samples a narrow band around each output pixel.

This kernel computes the reference semantics
(`torchvision.ops.deform_conv2d`, used by
`/root/reference/src/models/deformable_segmentation.py:244-267`)

    out(p) = Σ_k m_k(p) · bilinear(x, p + k + Δ_k(p)) @ W_k

as a BRANCH-FREE sum of statically-shifted slices:

  * Per (instance, kernel position) an integer ROW rebase by =
    round(mean Δy_k) is computed in XLA and folded into the position's
    window DMA start (row-granular DMA offsets are 128-aligned and free;
    column offsets are not, so the x axis is covered by the static window
    alone).
  * The bilinear weight is a separable tent, tent(Δy−ay)·tent(Δx−ax); after
    rebasing, the residual offsets concentrate near 0, so a small STATIC
    candidate window (ncand per axis, default 4: shifts −1..+2 around the
    base) covers the taps. Each candidate pair is one unconditional
    broadcast-FMA of a static slice — no gathers, no one-hot tiles, and no
    `pl.when` (measured ~1 µs per conditional region on v5e made every
    per-candidate gating structure slower than just doing the FMAs).
  * The per-position channel premix U = W_kᵀ @ x̃ runs on the MXU inside the
    kernel — no ×K² HBM materialization.

Layout: everything is pre-flattened to 2D (channels, rows·Wp) with Wp a
128-multiple so the kernel contains no unsupported shape casts; x is
zero-padded by `margin` (zero padding ⇒ out-of-image taps contribute 0,
exactly the reference's convention) and stored (B, Cin, Hp·Wp); each
position's haloed window is one contiguous lane range copied with a manual
async DMA whose start encodes the rebase (all 9 copies started before the
first use — the premix/FMA work of earlier positions hides later DMAs).

Exactness: identical to the reference for every tap whose offset satisfies
|Δ − base| inside the candidate window (the base itself is clamped to
±max_base). The mask head's offset convs are zero-initialized
(reference L250-256) and trained offsets are smooth small fields, so the
per-instance-mean rebase absorbs the bulk and residual spread < ~2 px holds
in practice; taps beyond the window drop (their true sample would need an
unbounded gather). `ncand`/`max_base` are configurable per call.

Differentiation: forward-only; `deform_conv.deform_conv2d` dispatches here
for inference and pairs it with the differentiable one-hot route's VJP for
training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _banded_kernel(base_ref, off_ref, mod_ref, w_ref, x_hbm, out_ref,
                   acc_ref, *xw, Cin: int, Cout: int, R: int, Wp: int,
                   margin: int, ncand: int, K: int, padding: int):
    """One (instance, row-block) step: ONE union-band window DMA shared by
    all K² positions, per-position MXU premix over a 128-aligned dynamic
    row-slice, ncand² unconditional tent FMAs.

    The per-tap windows differ only by a row shift ky+by ∈ ±(max_base +
    padding); staging each separately re-read the x buffer K²× from HBM
    (measured ~2/3 of the kernel time at COCO mask-head shapes). The union
    band is R + 2·(max_base+padding) + ncand + 1 rows — ~6× less traffic."""
    KK = K * K
    x_u, sem = xw
    b = pl.program_id(0)
    hb = pl.program_id(1)
    rows_win = R + ncand + 1   # +1 row: column-window overrun slack
    n_win = rows_win * Wp
    max_base = margin - ncand - padding
    shift = max_base + padding          # tap row offsets land in [0, 2·shift]

    lo = (ncand - 1) // 2
    # union window start: the smallest per-tap start (ky=−padding,
    # by=−max_base). Row steps are ×Wp (a 128-multiple) so the dynamic HBM
    # offset stays lane-aligned for the DMA.
    start_u = (hb * R + margin - shift - lo) * Wp
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(start_u, (R + 2 * shift + ncand + 1) * Wp)],
        x_u, sem)
    cp.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    N = R * Wp
    # upcast the whole row block ONCE — per-row slices of packed bf16
    # sublanes are slow, and rows arrive bf16 to halve HBM traffic
    off_f = off_ref[0].astype(jnp.float32)     # (2·KK, N)
    mod_f = mod_ref[0].astype(jnp.float32)     # (KK, N)
    cp.wait()
    for k in range(KK):
        ky = k // K - padding
        by = base_ref[0, 0, k, 0]
        rk = ky + by + shift                   # tap row inside the union band
        # premix: U_k = W_kᵀ @ x̃_k  (Cout, rows_win·Wp), MXU, reading the
        # tap's rows as a Wp-aligned dynamic slice of the union band.
        # True-f32 multiplies on the f32 (parity/debug) path — TPU f32 dots
        # default to bf16 passes; the bf16 inference path is unaffected.
        u = jax.lax.dot_general(
            w_ref[k], x_u[:, pl.ds(pl.multiple_of(rk * Wp, Wp), n_win)],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if x_u.dtype == jnp.float32 else None))
        byf = base_ref[0, 0, k, 0].astype(jnp.float32)
        dy = off_f[2 * k:2 * k + 1, :] - byf          # y residual offsets
        dx = off_f[2 * k + 1:2 * k + 2, :]            # x has no rebase
        mk = mod_f[k:k + 1, :]

        kx = k % K - padding
        col0 = margin + kx - lo
        # hoist the unaligned column shifts: one relayout per l, then every
        # (j, l) pair is a lane-ALIGNED row slice
        uls = [u[:, col0 + l:col0 + l + (R + ncand) * Wp]
               for l in range(ncand)]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (l - lo))) * mk
               for l in range(ncand)]
        for j in range(ncand):
            wyj = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (j - lo)))
            for l in range(ncand):
                w = wyj * wxs[l]
                acc_ref[:] += w * uls[l][:, j * Wp:j * Wp + N]

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _deform_conv2d_banded_impl(x, offset, mask, weight, bias, padding: int,
                               ncand: int, max_base: int, row_block: int):
    """x (B,H,W,Cin); offset (B,H,W,2KK) (y,x); mask (B,H,W,KK);
    weight (K,K,Cin,Cout); bias (Cout,). Returns (B,H,W,Cout)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    # margin covers base (±max_base) + kernel (±padding) + candidates
    # (−1 .. ncand−2) + the bilinear neighbour
    margin = max_base + ncand + padding
    R = min(row_block, _round_up(H, 8))
    H_r = _round_up(H, R)
    Wp = _round_up(W + 2 * margin, 128)

    # (B, Cin, (H_r + 2·margin + 1)·Wp) flattened, zero-padded: rows
    # [margin, margin+H) and cols [margin, margin+W) hold the image — zero
    # padding == the reference's out-of-image rule; one slack row keeps the
    # (discarded) pad-column outputs' reads in bounds.
    x_t = jnp.transpose(x, (0, 3, 1, 2))
    x_p = jnp.pad(x_t, ((0, 0), (0, 0),
                        (margin, H_r - H + margin + 1),
                        (margin, Wp - W - margin)))
    x_p = x_p.reshape(B, Cin, (H_r + 2 * margin + 1) * Wp)

    # per-pixel offset/modulation maps, flattened (B, ch, H_r·Wp); the
    # padding region gets zeros — those outputs are discarded
    off_t = jnp.transpose(offset, (0, 3, 1, 2))
    off_p = jnp.pad(off_t, ((0, 0), (0, 0), (0, H_r - H), (0, Wp - W)))
    off_p = off_p.reshape(B, 2 * KK, H_r * Wp)
    mod_t = jnp.transpose(mask, (0, 3, 1, 2))
    mod_p = jnp.pad(mod_t, ((0, 0), (0, 0), (0, H_r - H), (0, Wp - W)))
    mod_p = mod_p.reshape(B, KK, H_r * Wp)

    w_r = weight.reshape(KK, Cin, Cout).astype(x.dtype)

    # per-(instance, position) integer Y rebase = round(mean y-offset over
    # the real pixels), clamped to keep the DMA inside the padded buffer
    offy_mean = jnp.mean(off_t[:, 0::2].astype(jnp.float32)
                         .reshape(B, KK, -1), axis=-1)
    base = jnp.clip(jnp.round(offy_mean), -max_base, max_base) \
        .astype(jnp.int32).reshape(B, 1, KK, 1)

    R_lanes = R * Wp
    kernel = functools.partial(
        _banded_kernel, Cin=Cin, Cout=Cout, R=R, Wp=Wp, margin=margin,
        ncand=ncand, K=K, padding=padding)
    out = pl.pallas_call(
        kernel,
        grid=(B, H_r // R),
        in_specs=[
            pl.BlockSpec((1, 1, KK, 1), lambda b, hb: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KK, Cin, Cout), lambda b, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, Cout, R_lanes), lambda b, hb: (b, 0, hb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H_r * Wp), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((Cout, R_lanes), jnp.float32),
             pltpu.VMEM((Cin, (R + 2 * (max_base + padding) + ncand + 1)
                         * Wp), x.dtype),
             pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(base, off_p, mod_p, w_r, x_p)

    out = out.reshape(B, Cout, H_r, Wp)[:, :, :H, :W]
    out = jnp.transpose(out, (0, 2, 3, 1))
    return (out.astype(jnp.float32) + bias).astype(x.dtype)


def deform_conv2d_banded(x, offset, mask, weight, bias, padding: int = 1,
                         ncand: int = 4, max_base: int = 8,
                         row_block: int = 32):
    """Forward-only rebased-window deformable conv (see module docstring).
    Exact vs the reference while each position's offsets stay within the
    candidate window around the per-instance mean; far taps drop."""
    return _deform_conv2d_banded_impl(x, offset, mask, weight, bias,
                                      padding, ncand, max_base, row_block)

# ---------------------------------------------------------------------------
# Fused variant: offset/modulator field convs on the staged flat buffer
# ---------------------------------------------------------------------------
#
# The mask head's offset and modulator fields are themselves K×K convs of the
# SAME input x (`reference deformable_segmentation.py:244-267`). Feeding them
# through separate NHWC convs costs, per deformable conv, an NHWC→NCHW
# transpose + pad + flatten copy of 3·KK channels at full map size — at COCO
# /4 shapes this prep dwarfed the kernel itself. Here both fields are
# computed as tap-wise einsums directly on the NCHW-flat zero-padded buffer
# the kernel stages anyway (XLA fuses the 9 shifted reads into one loop
# nest; no transposes, no extra pads), and the row rebase comes from channel
# means: mean_p conv(x)(p) ≈ W_offᵀ·mean(x) + b (boundary zero-padding error
# ≤ the edge-pixel fraction — the base is a windowing heuristic, so the
# approximation only shifts which taps the window covers, never tap values).
# An earlier experiment computed the fields INSIDE the kernel from an extra
# row window; the small-M (27-row) per-block matmuls and value pressure cost
# ~2× more device time than these fused XLA einsums.


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _deform_conv2d_banded_fused_impl(x, w_off, b_off, w_mod, b_mod, weight,
                                     bias, padding: int, ncand: int,
                                     max_base: int, row_block: int,
                                     channel_first: bool = False):
    """x (B,H,W,Cin), or (B,Cin,H,W) with `channel_first` (in which case the
    output is (B,Cout,H,W) too — the mask-head spine chains layers channel-
    first to skip the per-layer NHWC↔NCHW round trips); w_off (K,K,Cin,2KK);
    w_mod (K,K,Cin,KK); weight (K,K,Cin,Cout). Returns the composition
    offset = conv(x, w_off)+b_off, mod = 2σ(conv(x, w_mod)+b_mod),
    deform_conv2d(x, offset, mod, weight, bias)."""
    if channel_first:
        B, Cin, H, W = x.shape
    else:
        B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    if Cin % 8:
        # Mosaic cannot DMA-slice a non-8-aligned sublane extent out of the
        # tiled HBM buffer; zero channels contribute nothing to the dots
        pad_c = 8 - Cin % 8
        cpad = ((0, 0), (0, pad_c), (0, 0), (0, 0)) if channel_first \
            else ((0, 0),) * 3 + ((0, pad_c),)
        x = jnp.pad(x, cpad)
        zoff = ((0, pad_c), (0, 0))
        w_off = jnp.pad(w_off, ((0, 0),) * 2 + zoff)
        w_mod = jnp.pad(w_mod, ((0, 0),) * 2 + zoff)
        weight = jnp.pad(weight, ((0, 0),) * 2 + zoff)
        Cin += pad_c
    margin = max_base + ncand + padding
    R = min(row_block, _round_up(H, 8))
    H_r = _round_up(H, R)
    Wp = _round_up(W + 2 * margin, 128)

    x_t = x if channel_first else jnp.transpose(x, (0, 3, 1, 2))
    x4 = jnp.pad(x_t, ((0, 0), (0, 0),
                       (margin, H_r - H + margin + 1),
                       (margin, Wp - W - margin)))        # (B, Cin, H_tot, Wp)
    x_p = x4.reshape(B, Cin, (H_r + 2 * margin + 1) * Wp)

    # Field convs as ONE K×K conv on the padded buffer (f32 accumulate, zero
    # padding == the reference convention). The earlier tap-wise einsum loop
    # re-read the whole ~GB staged buffer once per tap (9× HBM traffic,
    # measured 2 ms/tap at COCO mask-head shapes — the round-2 COCO
    # regression); the conv reads it once. Column reach caps the output
    # width at Wp − margin − 1 ≥ W + margin; the discarded pad-column tail
    # is restored by one output pad.
    f32 = jnp.float32
    w27 = jnp.concatenate([w_off.reshape(KK, Cin, 2 * KK),
                           w_mod.reshape(KK, Cin, KK)],
                          axis=-1).astype(x.dtype)        # (KK, Cin, 3KK)
    Lc = Wp - margin - 1
    prec = ("highest" if x.dtype == jnp.float32 else None)
    # tap t reads x4[…, margin+ty+h, margin+tx+w] (ty=t//K−padding,
    # tx=t%K−padding) ⇔ VALID conv over the slice starting at margin−padding
    # with OIHW weights W[o, c, ky, kx] = w27[ky·K+kx, c, o].
    assert margin >= padding and margin - padding + Lc + K - 1 <= Wp, \
        (margin, padding, Lc, K, Wp)
    xs_all = jax.lax.slice(
        x4, (0, 0, margin - padding, margin - padding),
        (B, Cin, margin - padding + H_r + K - 1,
         margin - padding + Lc + K - 1))
    w_oihw = jnp.transpose(w27.reshape(K, K, Cin, 3 * KK), (3, 2, 0, 1))
    f27 = jax.lax.conv_general_dilated(
        xs_all, w_oihw, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=f32, precision=prec)       # (B, 3KK, H_r, Lc)
    b27 = jnp.concatenate([b_off, b_mod]).astype(f32)
    f27 = f27 + b27[None, :, None, None]
    off4 = f27[:, :2 * KK]
    mod4 = 2.0 * jax.nn.sigmoid(f27[:, 2 * KK:])
    cpad = ((0, 0), (0, 0), (0, 0), (0, Wp - Lc))
    off_p = jnp.pad(off4, cpad).reshape(B, 2 * KK, H_r * Wp)
    mod_p = jnp.pad(mod4, cpad).reshape(B, KK, H_r * Wp)

    w_r = weight.reshape(KK, Cin, Cout).astype(x.dtype)

    # row rebase from channel means (see section comment)
    x_mean = jnp.mean(x.astype(f32),
                      axis=(2, 3) if channel_first else (1, 2))  # (B, Cin)
    offy_mean = (x_mean @ w_off.astype(f32)
                 .sum(axis=(0, 1))[:, 0::2]) + b_off[0::2].astype(f32)
    base = jnp.clip(jnp.round(offy_mean), -max_base, max_base) \
        .astype(jnp.int32).reshape(B, 1, KK, 1)

    R_lanes = R * Wp
    kernel = functools.partial(
        _banded_kernel, Cin=Cin, Cout=Cout, R=R, Wp=Wp, margin=margin,
        ncand=ncand, K=K, padding=padding)
    out = pl.pallas_call(
        kernel,
        grid=(B, H_r // R),
        in_specs=[
            pl.BlockSpec((1, 1, KK, 1), lambda b, hb: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KK, Cin, Cout), lambda b, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, Cout, R_lanes), lambda b, hb: (b, 0, hb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H_r * Wp), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((Cout, R_lanes), jnp.float32),
             pltpu.VMEM((Cin, (R + 2 * (max_base + padding) + ncand + 1)
                         * Wp), x.dtype),
             pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(base, off_p, mod_p, w_r, x_p)

    out = out.reshape(B, Cout, H_r, Wp)[:, :, :H, :W]
    if channel_first:
        return (out.astype(jnp.float32)
                + bias[None, :, None, None]).astype(x.dtype)
    out = jnp.transpose(out, (0, 2, 3, 1))
    return (out.astype(jnp.float32) + bias).astype(x.dtype)


def deform_conv2d_banded_fused(x, w_off, b_off, w_mod, b_mod, weight, bias,
                               padding: int = 1, ncand: int = 4,
                               max_base: int = 8, row_block: int = 32,
                               channel_first: bool = False):
    """Forward-only fused modulated deformable conv: field convs computed on
    the kernel's staged flat buffer (no transpose/pad/copy field prep).
    With `channel_first`, input and output are (B, C, H, W)."""
    return _deform_conv2d_banded_fused_impl(x, w_off, b_off, w_mod, b_mod,
                                            weight, bias, padding, ncand,
                                            max_base, row_block,
                                            channel_first)
