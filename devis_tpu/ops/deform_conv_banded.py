"""Banded modulated deformable convolution — the mask-head hot path.

The one-hot-matmul route (`deform_conv.py::_deform_conv2d_pallas`) streams a
window-span's worth of one-hot weight rows through the MXU for EVERY
(instance, kernel position): at COCO /4 shapes that is ~150 ms of pure
selection overhead for ~0.2 ms of useful MACs, because a 3×3 deformable conv
only ever samples a narrow band around each output pixel.

This kernel exploits that structure directly (reference semantics:
`torchvision.ops.deform_conv2d` as used by
`/root/reference/src/models/deformable_segmentation.py:244-267`):

    out(p) = Σ_k m_k(p) · bilinear(x, p + k + Δ_k(p)) @ W_k

For |Δ| ≤ band, the bilinear taps of position k live in the static shift
window  k + [-band, band+1]²  around p. Writing the bilinear weight as a
separable tent,  w(t) = tent(Δy − ay) · tent(Δx − ax),  the gather becomes a
sum of STATIC shifted slices of the (per-position channel-premixed) feature
map with per-pixel tent weights — pure VPU FMAs, no gathers, no one-hot
tiles. Candidate shifts whose tent weights vanish over the whole row-block
are skipped at runtime (`pl.when`), so the common case (small learned
offsets; exactly zero at the reference's zero-init, L250-256) does only
live-tap work: ~4–9 FMA passes per position instead of (2·band+2)².

Layout: everything is pre-flattened to 2D (channels, rows·Wp) with Wp a
128-multiple so the kernel contains no shape casts: x is zero-padded by
`m = band + 2` (zero padding ⇒ out-of-image taps contribute 0, exactly the
reference's convention) and stored (B, Cin, Hp·Wp); a row-block slice is one
contiguous lane range (manual async copy — row blocks overlap by the halo).
The premix U_k = W_kᵀ @ x̃ runs on the MXU per position inside the kernel
(no ×K² HBM materialization); a shift (a, c) is the single static lane
offset (a+ky+m)·Wp + (c+kx+m); tent maps broadcast along the Cout sublanes.

Exactness: identical to the reference for every tap whose learned offset
satisfies |Δ| ≤ band (default 4 px); taps beyond the band are dropped
(their true sample would require an unbounded gather). The mask head's
offset convs are zero-initialized and trained offsets stay well inside the
band; `band` is configurable per call.

Differentiation: the kernel is forward-only; `deform_conv.deform_conv2d`
dispatches to it for inference and pairs it with the differentiable one-hot
route's VJP for training.
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


def _banded_kernel(live_ref, off_ref, mod_ref, w_ref, x_hbm, out_ref, x_vmem,
                   acc_ref, uc_ref, sem, *, Cin: int, Cout: int, R: int,
                   Wp: int, m: int, band: int, K: int, padding: int):
    b = pl.program_id(0)
    hb = pl.program_id(1)
    rows_ext = R + 2 * m
    n_ext = rows_ext * Wp
    nc = 2 * band + 2
    # one slack row: corner shifts for (discarded) pad-column outputs read up
    # to 2m lanes past rows_ext·Wp — keep the slices in bounds and zeroed
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(hb * R * Wp, n_ext)],
        x_vmem.at[:, :n_ext], sem)
    cp.start()
    x_vmem[:, n_ext:] = jnp.zeros((Cin, Wp), x_vmem.dtype)
    cp.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    N = R * Wp
    n_rows = rows_ext * Wp
    for k in range(K * K):
        ky = k // K - padding
        kx = k % K - padding
        # premix: U_k = W_kᵀ @ x̃  (Cout, (rows_ext+1)·Wp), MXU. True-f32
        # multiplies on the f32 (parity/debug) path — TPU f32 dots default to
        # bf16 passes; the bf16 inference path is unaffected.
        u = jax.lax.dot_general(
            w_ref[k], x_vmem[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if x_vmem.dtype == jnp.float32 else None))
        dy = off_ref[0, 2 * k:2 * k + 1, :]       # (1, R·Wp)
        dx = off_ref[0, 2 * k + 1:2 * k + 2, :]
        mk = mod_ref[0, k:k + 1, :]

        # candidate liveness comes precomputed from SMEM (block-level
        # interval tests done in XLA) — no in-kernel vector→scalar reduces.
        # Column shifts are hoisted: ONE unaligned (relayout-costly) copy per
        # live column candidate; the per-pair row shift is then a
        # lane-ALIGNED slice (multiples of Wp, itself a 128-multiple).
        for ci, c in enumerate(range(-band, band + 2)):
            @pl.when(live_ref[0, 0, k * 2 * nc + nc + ci, 0] != 0)
            def _(c=c, ci=ci):
                col0 = kx + c + m
                uc_ref[:] = u[:, col0:col0 + n_rows]
                wxc = jnp.maximum(0.0, 1.0 - jnp.abs(dx - c)) * mk
                for ai, a in enumerate(range(-band, band + 2)):
                    row0 = (ky + a + m) * Wp

                    @pl.when(live_ref[0, 0, k * 2 * nc + ai, 0] != 0)
                    def _(row0=row0, a=a, wxc=wxc):
                        wya = jnp.maximum(0.0, 1.0 - jnp.abs(dy - a))
                        acc_ref[:] += (wya * wxc) * uc_ref[:, row0:row0 + N]

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _deform_conv2d_banded_impl(x, offset, mask, weight, bias, padding: int,
                               band: int, row_block: int):
    """x (B,H,W,Cin); offset (B,H,W,2KK) (y,x); mask (B,H,W,KK);
    weight (K,K,Cin,Cout); bias (Cout,). Returns (B,H,W,Cout)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    KK = K * K
    Cout = weight.shape[-1]
    m = band + 2
    R = min(row_block, _round_up(H, 8))
    H_r = _round_up(H, R)
    Wp = _round_up(W + 2 * m, 128)

    # (B, Cin, (H_r + 2m)·Wp) flattened, zero-padded: rows [m, m+H) and cols
    # [m, m+W) hold the image — zero padding == the reference's rule.
    x_t = jnp.transpose(x, (0, 3, 1, 2))
    x_p = jnp.pad(x_t, ((0, 0), (0, 0), (m, H_r - H + m), (m, Wp - W - m)))
    x_p = x_p.reshape(B, Cin, (H_r + 2 * m) * Wp)

    # per-pixel offset/modulation maps, flattened (B, ch, H_r·Wp); padding
    # region gets zeros — those outputs are discarded
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    off_p = jnp.pad(off_t, ((0, 0), (0, 0), (0, H_r - H), (0, Wp - W)))
    off_p = off_p.reshape(B, 2 * KK, H_r * Wp)
    mod_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    mod_p = jnp.pad(mod_t, ((0, 0), (0, 0), (0, H_r - H), (0, Wp - W)))
    mod_p = mod_p.reshape(B, KK, H_r * Wp)

    w_r = weight.reshape(KK, Cin, Cout).astype(x.dtype)

    R_lanes = R * Wp
    # block-level candidate liveness (SMEM scalars for the kernel): candidate
    # a is live iff the open tent support (a-1, a+1) intersects the block's
    # offset range [dmin, dmax]; tent(d - a) > 0 ⇔ |d - a| < 1
    nc = 2 * band + 2
    off_blk = off_p.reshape(B, 2 * KK, H_r // R, R_lanes)
    dmin = jnp.min(off_blk, axis=-1)                  # (B, 2KK, nblocks)
    dmax = jnp.max(off_blk, axis=-1)
    cand = jnp.arange(-band, band + 2, dtype=jnp.float32)
    live = ((dmin[..., None] < cand + 1) &
            (dmax[..., None] > cand - 1)).astype(jnp.int32)
    # (B, nblocks, KK, 2, nc) → per k: [live_y(nc), live_x(nc)]
    live = jnp.transpose(live.reshape(B, KK, 2, H_r // R, nc),
                         (0, 3, 1, 2, 4)).reshape(B, H_r // R,
                                                  KK * 2 * nc, 1)
    kernel = functools.partial(
        _banded_kernel, Cin=Cin, Cout=Cout, R=R, Wp=Wp, m=m, band=band,
        K=K, padding=padding)
    out = pl.pallas_call(
        kernel,
        grid=(B, H_r // R),
        in_specs=[
            pl.BlockSpec((1, 1, KK * 2 * nc, 1), lambda b, hb: (b, hb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KK, R_lanes), lambda b, hb: (b, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KK, Cin, Cout), lambda b, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Cout, R_lanes), lambda b, hb: (b, 0, hb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H_r * Wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Cin, (R + 2 * m + 1) * Wp), x.dtype),
            pltpu.VMEM((Cout, R_lanes), jnp.float32),
            pltpu.VMEM((Cout, (R + 2 * m) * Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(live, off_p, mod_p, w_r, x_p)

    out = out.reshape(B, Cout, H_r, Wp)[:, :, :H, :W]
    out = jnp.transpose(out, (0, 2, 3, 1))
    return (out.astype(jnp.float32) + bias).astype(x.dtype)


def deform_conv2d_banded(x, offset, mask, weight, bias, padding: int = 1,
                         band: int = 4, row_block: int = 32):
    """Forward-only banded modulated deformable conv (see module docstring).
    Exact vs the reference for |offset| ≤ band; out-of-band taps drop."""
    return _deform_conv2d_banded_impl(x, offset, mask, weight, bias,
                                      padding, band, row_block)
