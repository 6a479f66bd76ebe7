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
    candidate window (ncand per axis: shifts −lo..ncand−1−lo around the
    base) covers the taps. Each candidate pair is one unconditional
    broadcast-FMA of a static slice — no gathers, no one-hot tiles, and no
    `pl.when` (measured ~1 µs per conditional region on v5e made every
    per-candidate gating structure slower than just doing the FMAs).
  * The per-position channel premix U = W_kᵀ @ x̃ runs on the MXU inside the
    kernel — no ×K² HBM materialization.

Layout: everything is pre-flattened to 2D (channels, rows·Wp) with Wp a
128-multiple so the kernel contains no unsupported shape casts; x is
zero-padded by `margin` (zero padding ⇒ out-of-image taps contribute 0,
exactly the reference's convention) and stored (B, Cin, Hp·Wp); the window
is one contiguous lane range copied with a manual async DMA whose start
encodes the rebase. The per-pixel fields travel as ONE packed operand with
rows [Δy(KK) | Δx(KK) | m(KK)] in the compute dtype (bf16 on the inference
path — modulation has σ pre-applied, so bf16 rounding only perturbs tent
weights ~1e-2; the f32 parity path stays f32 end to end).

Exactness: identical to the reference for every tap whose offset satisfies
|Δ − base| inside the candidate window (the base itself is clamped to
±max_base). The mask head's offset convs are zero-initialized
(reference L250-256) and trained offsets are smooth small fields, so the
per-instance-mean rebase absorbs the bulk and residual spread < ~2 px holds
in practice; taps beyond the window drop (their true sample would need an
unbounded gather). `ncand`/`ncand_y`/`max_base` are configurable per call.

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


def _banded_kernel(base_ref, f_ref, w_ref, x_hbm, out_ref,
                   acc_ref, *xw, Cin: int, Cout: int, R: int, Wp: int,
                   margin: int, ncand_x: int, ncand_y: int, K: int,
                   padding: int):
    """One (instance, row-block) step: ONE union-band window DMA shared by
    all K² positions, per-position MXU premix over a 128-aligned dynamic
    row-slice, ncand_y·ncand_x unconditional tent FMAs.

    The per-tap windows differ only by a row shift ky+by ∈ ±(max_base +
    padding); staging each separately re-read the x buffer K²× from HBM
    (measured ~2/3 of the kernel time at COCO mask-head shapes). The union
    band is R + 2·(max_base+padding) + ncand_y + 1 rows — ~6× less traffic.

    ``f_ref`` packs the per-pixel fields as rows [Δy(KK) | Δx(KK) | m(KK)]
    in the COMPUTE dtype (see module docstring)."""
    KK = K * K
    x_u, sem = xw
    b = pl.program_id(0)
    hb = pl.program_id(1)
    rows_win = R + ncand_y + 1   # +1 row: column-window overrun slack
    n_win = rows_win * Wp
    nc_max = max(ncand_x, ncand_y)
    max_base = margin - nc_max - padding
    shift = max_base + padding          # tap row offsets land in [0, 2·shift]

    lo_x = (ncand_x - 1) // 2
    lo_y = (ncand_y - 1) // 2
    # union window start: the smallest per-tap start (ky=−padding,
    # by=−max_base). Row steps are ×Wp (a 128-multiple) so the dynamic HBM
    # offset stays lane-aligned for the DMA.
    start_u = (hb * R + margin - shift - lo_y) * Wp
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(start_u, (R + 2 * shift + ncand_y + 1) * Wp)],
        x_u, sem)
    cp.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    # upcast the whole row block ONCE — per-row slices of packed bf16
    # sublanes are slow, and rows arrive bf16 to halve HBM traffic
    f = f_ref[0].astype(jnp.float32)           # (3·KK, N): Δy | Δx | m
    cp.wait()
    _premix_tent_combine(acc_ref, base_ref, x_u, w_ref, f, False, R=R,
                         Wp=Wp, margin=margin, ncand_x=ncand_x,
                         ncand_y=ncand_y, K=K, padding=padding, shift=shift)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _premix_tent_combine(acc_ref, base_ref, x_u, w_ref, f, mod_sigmoid, *,
                         R, Wp, margin, ncand_x, ncand_y, K, padding, shift):
    """The shared inner loop: per kernel position an MXU premix over a
    Wp-aligned dynamic row-slice of the union band, then ncand_y·ncand_x
    unconditional tent FMAs against the f32 field rows ``f``
    ((3KK, R·Wp) value or VMEM ref: Δy | Δx | modulation). With
    ``mod_sigmoid`` the modulation rows are raw logits and m = 2σ(·) is
    applied here."""
    KK = K * K
    N = R * Wp
    rows_win = R + ncand_y + 1
    n_win = rows_win * Wp
    lo_x = (ncand_x - 1) // 2
    lo_y = (ncand_y - 1) // 2
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
        dy = f[k:k + 1, :] - byf                      # y residual offsets
        dx = f[KK + k:KK + k + 1, :]                  # x has no rebase
        mk = f[2 * KK + k:2 * KK + k + 1, :]
        if mod_sigmoid:
            mk = 2.0 * jax.nn.sigmoid(mk)

        kx = k % K - padding
        col0 = margin + kx - lo_x
        # hoist the unaligned column shifts: one relayout per l, then every
        # (j, l) pair is a lane-ALIGNED row slice
        uls = [u[:, col0 + l:col0 + l + (R + ncand_y) * Wp]
               for l in range(ncand_x)]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (l - lo_x))) * mk
               for l in range(ncand_x)]
        for j in range(ncand_y):
            wyj = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (j - lo_y)))
            for l in range(ncand_x):
                w = wyj * wxs[l]
                acc_ref[:] += w * uls[l][:, j * Wp:j * Wp + N]


def _banded_infield_kernel(base_ref, wf_ref, bf_ref, w_ref, x_hbm, out_ref,
                           acc_ref, f_scr, *xw, Cin: int, Cout: int, R: int,
                           Wp: int, margin: int, ncand_x: int, ncand_y: int,
                           K: int, padding: int):
    """Fully-fused DCNv2 step: the offset/modulator FIELD convs run inside
    the kernel on the staged union band (their K×K taps are a subset of the
    band's rows), so no field maps ever exist in HBM — the XLA-side field
    conv fought the pallas operand layout and paid ~GB relayout copies per
    layer (measured: conv 3.4 ms + layout copy 3.3 ms + cast/flatten ~2 ms
    at COCO /4 shapes, per layer).

    ``wf_ref``: (KK, Cin, 3KK) field weights, output channels pre-ordered
    [Δy(KK) | Δx(KK) | mod-logit(KK)]; ``bf_ref``: (3KK, 1) f32 biases.
    The modulation σ runs in-kernel (f32, via the combine's flag)."""
    KK = K * K
    x_u, sem = xw
    b = pl.program_id(0)
    hb = pl.program_id(1)
    nc_max = max(ncand_x, ncand_y)
    max_base = margin - nc_max - padding
    shift = max_base + padding
    lo_y = (ncand_y - 1) // 2
    N = R * Wp

    start_u = (hb * R + margin - shift - lo_y) * Wp
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(start_u, (R + 2 * shift + ncand_y + 1) * Wp)],
        x_u, sem)
    cp.start()
    acc_ref[:] = jnp.zeros_like(acc_ref)
    cp.wait()

    prec = (jax.lax.Precision.HIGHEST if x_u.dtype == jnp.float32 else None)
    # Field convs on the band: output pixel (r, c) of this block sits at
    # x_u row r + shift + lo_y, lane c + margin, so tap (ty, tx) reads row
    # r + shift + lo_y + ty ≥ 0 (shift + lo_y ≥ padding). The tx column
    # shifts are hoisted: one unaligned relayout per tx covering all K row
    # taps, then each ty is a lane-aligned row slice of it.
    frow0 = shift + lo_y - padding
    for tx in range(K):
        c0 = frow0 * Wp + margin + (tx - padding)
        xs_tx = x_u[:, c0:c0 + (R + K - 1) * Wp]
        for ty in range(K):
            t = ty * K + tx
            term = jax.lax.dot_general(
                wf_ref[t], xs_tx[:, ty * Wp:ty * Wp + N],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if tx == 0 and ty == 0:
                f_scr[:] = term + bf_ref[:]                 # seed with bias
            else:
                f_scr[:] += term                            # (3KK, N) f32

    _premix_tent_combine(acc_ref, base_ref, x_u, w_ref, f_scr, True, R=R,
                         Wp=Wp, margin=margin, ncand_x=ncand_x,
                         ncand_y=ncand_y, K=K, padding=padding, shift=shift)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _call_banded_kernel(base, f_p, w_r, x_p, *, B, Cin, Cout, H_r, R, Wp,
                        margin, ncand_x, ncand_y, K, padding, max_base,
                        out_dtype):
    """Shared pallas_call wrapper for the fused/unfused entry points."""
    KK = K * K
    R_lanes = R * Wp
    kernel = functools.partial(
        _banded_kernel, Cin=Cin, Cout=Cout, R=R, Wp=Wp, margin=margin,
        ncand_x=ncand_x, ncand_y=ncand_y, K=K, padding=padding)
    return pl.pallas_call(
        kernel,
        grid=(B, H_r // R),
        in_specs=[
            pl.BlockSpec((1, 1, KK, 1), lambda b, hb: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KK, Cin, Cout), lambda b, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, Cout, R_lanes), lambda b, hb: (b, 0, hb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H_r * Wp), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((Cout, R_lanes), jnp.float32),
             pltpu.VMEM((Cin, (R + 2 * (max_base + padding) + ncand_y + 1)
                         * Wp), x_p.dtype),
             pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(base, f_p, w_r, x_p)


def _auto_row_block(row_block, W):
    # wider maps amortize the union-band halo (2·shift + ncand_y rows) over
    # more output rows per step — measured win at the COCO /4 and /8 shapes
    if row_block is not None:
        return row_block
    return 64 if W >= 144 else 32


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _deform_conv2d_banded_impl(x, offset, mask, weight, bias, padding: int,
                               ncand: int, max_base: int, row_block,
                               ncand_y: int):
    """x (B,H,W,Cin); offset (B,H,W,2KK) (y,x); mask (B,H,W,KK);
    weight (K,K,Cin,Cout); bias (Cout,). Returns (B,H,W,Cout)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    # margin covers base (±max_base) + kernel (±padding) + candidates
    # (−lo .. ncand−1−lo) + the bilinear neighbour
    margin = max_base + max(ncand, ncand_y) + padding
    R = min(_auto_row_block(row_block, W), _round_up(H, 8))
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

    # per-pixel field maps packed [Δy | Δx | m], flattened (B, 3KK, H_r·Wp);
    # the padding region gets zeros — those outputs are discarded
    off_t = jnp.transpose(offset, (0, 3, 1, 2))
    mod_t = jnp.transpose(mask, (0, 3, 1, 2))
    f_t = jnp.concatenate([off_t[:, 0::2], off_t[:, 1::2], mod_t], axis=1)
    f_p = jnp.pad(f_t, ((0, 0), (0, 0), (0, H_r - H), (0, Wp - W)))
    f_p = f_p.reshape(B, 3 * KK, H_r * Wp)

    w_r = weight.reshape(KK, Cin, Cout).astype(x.dtype)

    # per-(instance, position) integer Y rebase = round(mean y-offset over
    # the real pixels), clamped to keep the DMA inside the padded buffer
    offy_mean = jnp.mean(off_t[:, 0::2].astype(jnp.float32)
                         .reshape(B, KK, -1), axis=-1)
    base = jnp.clip(jnp.round(offy_mean), -max_base, max_base) \
        .astype(jnp.int32).reshape(B, 1, KK, 1)

    out = _call_banded_kernel(
        base, f_p, w_r, x_p, B=B, Cin=Cin, Cout=Cout, H_r=H_r, R=R, Wp=Wp,
        margin=margin, ncand_x=ncand, ncand_y=ncand_y, K=K, padding=padding,
        max_base=max_base, out_dtype=x.dtype)

    out = out.reshape(B, Cout, H_r, Wp)[:, :, :H, :W]
    out = jnp.transpose(out, (0, 2, 3, 1))
    return (out.astype(jnp.float32) + bias).astype(x.dtype)


def deform_conv2d_banded(x, offset, mask, weight, bias, padding: int = 1,
                         ncand: int = 4, max_base: int = 8,
                         row_block=None, ncand_y=None):
    """Forward-only rebased-window deformable conv (see module docstring).
    Exact vs the reference while each position's offsets stay within the
    candidate window around the per-instance mean y-offset (rows are
    rebased; columns use the static window alone); far taps drop.
    ``ncand`` is the column window; ``ncand_y`` (default = ncand) the row
    window; ``row_block=None`` picks the block size from the map width."""
    return _deform_conv2d_banded_impl(x, offset, mask, weight, bias,
                                      padding, ncand, max_base, row_block,
                                      ncand if ncand_y is None else ncand_y)

# ---------------------------------------------------------------------------
# Fused variant: offset/modulator field convs on the staged flat buffer
# ---------------------------------------------------------------------------
#
# The mask head's offset and modulator fields are themselves K×K convs of the
# SAME input x (`reference deformable_segmentation.py:244-267`). Feeding them
# through separate NHWC convs costs, per deformable conv, an NHWC→NCHW
# transpose + pad + flatten copy of 3·KK channels at full map size — at COCO
# /4 shapes this prep dwarfed the kernel itself. Here both fields are
# computed as ONE K×K conv directly on the NCHW-flat zero-padded buffer the
# kernel stages anyway (no transposes, no extra pads: explicit column
# padding makes the conv emit exactly Wp columns, so the packed field
# operand is BORN in kernel layout), and the row rebase comes from channel
# means: mean_p conv(x)(p) ≈ W_offᵀ·mean(x) + b (boundary zero-padding error
# ≤ the edge-pixel fraction — the base is a windowing heuristic, so the
# approximation only shifts which taps the window covers, never tap values).
# An earlier experiment computed the fields INSIDE the kernel from an extra
# row window; the small-M (27-row) per-block matmuls and value pressure cost
# ~2× more device time than this fused XLA conv.


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def _deform_conv2d_banded_fused_impl(x, w_off, b_off, w_mod, b_mod, weight,
                                     bias, padding: int, ncand: int,
                                     max_base: int, row_block,
                                     channel_first: bool, ncand_y: int):
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
    margin = max_base + max(ncand, ncand_y) + padding
    R = min(_auto_row_block(row_block, W), _round_up(H, 8))
    H_r = _round_up(H, R)
    Wp = _round_up(W + 2 * margin, 128)

    x_t = x if channel_first else jnp.transpose(x, (0, 3, 1, 2))
    x4 = jnp.pad(x_t, ((0, 0), (0, 0),
                       (margin, H_r - H + margin + 1),
                       (margin, Wp - W - margin)))        # (B, Cin, H_tot, Wp)
    x_p = x4.reshape(B, Cin, (H_r + 2 * margin + 1) * Wp)

    # Field weights packed for the IN-KERNEL field conv (see
    # `_banded_infield_kernel`): (KK taps, Cin, 3KK) with output channels
    # pre-ordered [Δy(KK) | Δx(KK) | mod-logit(KK)], plus (3KK, 1) f32
    # biases. No field map ever exists in HBM.
    f32 = jnp.float32
    w27 = jnp.concatenate([w_off[..., 0::2], w_off[..., 1::2],
                           w_mod], axis=-1).astype(x.dtype)  # (K,K,Cin,3KK)
    wf = w27.reshape(KK, Cin, 3 * KK)
    b27 = jnp.concatenate([b_off[0::2], b_off[1::2],
                           b_mod]).astype(f32).reshape(3 * KK, 1)

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
        _banded_infield_kernel, Cin=Cin, Cout=Cout, R=R, Wp=Wp,
        margin=margin, ncand_x=ncand, ncand_y=ncand_y, K=K, padding=padding)
    out = pl.pallas_call(
        kernel,
        grid=(B, H_r // R),
        in_specs=[
            pl.BlockSpec((1, 1, KK, 1), lambda b, hb: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((KK, Cin, 3 * KK), lambda b, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * KK, 1), lambda b, hb: (0, 0),
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
             pltpu.VMEM((3 * KK, R_lanes), jnp.float32),
             pltpu.VMEM((Cin, (R + 2 * (max_base + padding) + ncand_y + 1)
                         * Wp), x.dtype),
             pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(base, wf, b27, w_r, x_p)

    out = out.reshape(B, Cout, H_r, Wp)[:, :, :H, :W]
    if channel_first:
        return (out.astype(jnp.float32)
                + bias[None, :, None, None]).astype(x.dtype)
    out = jnp.transpose(out, (0, 2, 3, 1))
    return (out.astype(jnp.float32) + bias).astype(x.dtype)


def deform_conv2d_banded_fused(x, w_off, b_off, w_mod, b_mod, weight, bias,
                               padding: int = 1, ncand: int = 4,
                               max_base: int = 8, row_block=None,
                               channel_first: bool = False, ncand_y=None):
    """Forward-only fused modulated deformable conv: field convs computed on
    the kernel's staged flat buffer (no transpose/pad/copy field prep).
    With `channel_first`, input and output are (B, C, H, W)."""
    return _deform_conv2d_banded_fused_impl(x, w_off, b_off, w_mod, b_mod,
                                            weight, bias, padding, ncand,
                                            max_base, row_block,
                                            channel_first,
                                            ncand if ncand_y is None
                                            else ncand_y)


# ---------------------------------------------------------------------------
# Coverage diagnostics
# ---------------------------------------------------------------------------

def band_coverage_report(x, w_off, b_off, w_mod, b_mod, padding: int = 1,
                         ncand: int = 4, ncand_y=None, max_base: int = 8,
                         channel_first: bool = False):
    """Quantifies the banded approximation for one DCNv2 layer: the
    modulation-weighted fraction of bilinear tap mass the candidate window
    covers, given the layer's input and field-conv weights.

    A tap with residual offset r (y: Δy − base_k; x: Δx) splits its bilinear
    mass between floor(r) (weight 1−frac) and floor(r)+1 (weight frac); a
    neighbour outside the candidate window [−lo, ncand−1−lo] is dropped by
    the kernel (module docstring: "taps beyond the window drop"). The base
    replicates the fused kernel's channel-mean rebase exactly.

    Returns a dict of floats:
      covered_mass   — Σ m_k·(covered bilinear fraction) / Σ m_k
      exact_tap_frac — fraction of (pixel, position) taps fully in-band
      p99_resid_y/x  — 99th percentile |residual| per axis
      max_resid_y/x  — worst-case |residual| per axis
    """
    import numpy as np

    from .deform_conv import conv2d_nhwc

    if channel_first:
        x = jnp.transpose(x, (0, 2, 3, 1))
    K = w_off.shape[0]
    KK = K * K
    ncand_y = ncand if ncand_y is None else ncand_y
    f32 = jnp.float32

    offset = conv2d_nhwc(x, w_off.astype(x.dtype), b_off.astype(x.dtype),
                         padding).astype(f32)               # (B,H,W,2KK)
    mod = 2.0 * jax.nn.sigmoid(
        conv2d_nhwc(x, w_mod.astype(x.dtype), b_mod.astype(x.dtype),
                    padding).astype(f32))                   # (B,H,W,KK)

    # fused-kernel base: channel-mean rebase (see _deform_conv2d_banded_fused_impl)
    x_mean = jnp.mean(x.astype(f32), axis=(1, 2))           # (B, Cin)
    offy_mean = (x_mean @ w_off.astype(f32).sum(axis=(0, 1))[:, 0::2]
                 ) + b_off[0::2].astype(f32)                # (B, KK)
    base = jnp.clip(jnp.round(offy_mean), -max_base, max_base)

    ry = offset[..., 0::2] - base[:, None, None, :]          # (B,H,W,KK)
    rx = offset[..., 1::2]

    def axis_cover(r, nc):
        lo = (nc - 1) // 2
        fl = jnp.floor(r)
        frac = r - fl
        in_w = lambda v: ((v >= -lo) & (v <= nc - 1 - lo)).astype(f32)
        return (1.0 - frac) * in_w(fl) + frac * in_w(fl + 1)

    cover = axis_cover(ry, ncand_y) * axis_cover(rx, ncand)
    total = jnp.sum(mod)
    rep = {
        "covered_mass": float(jnp.sum(mod * cover) / jnp.maximum(total, 1e-9)),
        "exact_tap_frac": float(jnp.mean((cover >= 1.0 - 1e-6))),
        "p99_resid_y": float(jnp.percentile(jnp.abs(ry), 99)),
        "p99_resid_x": float(jnp.percentile(jnp.abs(rx), 99)),
        "max_resid_y": float(jnp.max(jnp.abs(ry))),
        "max_resid_x": float(jnp.max(jnp.abs(rx))),
    }
    return rep
