"""Pallas TPU kernel for multi-scale deformable attention.

Why a kernel: the op is a sparse weighted gather — each query reads
L·P·4 bilinear taps from the level-stacked value tensor. XLA lowers the
row-gathers to a serial loop (~25 ns/row measured on v5e), which makes the
DeVIS encoder the model bottleneck (137 ms per temporal op at YT-VIS eval
shapes). GPUs hide this with hardware gather; the TPU-native formulation
turns the gather into MXU matmuls:

    out[q] = Σ_s W[q, s] · value[s],   W sparse with ≤ L·P·4 nonzeros/row

The kernel tiles (q, s), builds each Wᵀ tile on the VPU from the tap indices
(K compare+selects per tile — no scatter needed), and feeds the MXU. Work on
the s axis is **range-skipped**: deformable attention samples locally, so per
(q-tile, level) only the s-tiles between the min and max sampled index are
visited (exact for any offsets — the range always covers every tap; the worst
case degrades to the dense sweep).

Layout choices (Mosaic constraints):
  * tap indices/weights live as (B·M, L·K, Q): the tap axis sits on
    sublanes so the statically-unrolled tap loop reads single sublanes
    (dynamic lane offsets would need 128-alignment);
  * the weight tile is built transposed, Wᵀ (s_tile, q_tile), accumulated in
    a VMEM scratch ref (bounds live temporaries) — both matmuls consume it
    without relayout: out = Wᵀᵀ@v via dot_general, grad_value = Wᵀ@g;
  * every level is padded to an s_tile multiple in the packed value buffer,
    so value slices are statically s_tile-aligned.

The backward pass reuses the same Wᵀ tiles (custom VJP below):
    grad_value[s]  = Σ_q W[q, s] · g[q]          (Wᵀ @ g — a matmul,
                                                  deterministic scatter-free)
    grad_wt[q, k]  = g[q] · value[idx[q, k]]     (extracted from v @ gᵀ with
                                                  the same compares)
and the chain rule from per-tap weights back to attention weights / sampling
locations is cheap elementwise XLA (`_taps` is differentiable).

Reference semantics being reproduced: the CUDA forward
`/root/reference/src/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238` and
backward `:957` (ours replaces its atomicAdd with the deterministic Wᵀ @ g).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Shapes = Tuple[Tuple[int, int], ...]


def _interpret() -> bool:
    """Interpret mode on non-TPU backends (CPU tests)."""
    return jax.default_backend() != "tpu"


def _level_starts(spatial_shapes: Shapes):
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _padded_level_starts(spatial_shapes: Shapes, s_tile: int):
    """Level starts when every level is padded to an s_tile multiple —
    keeps all kernel value-slices statically s_tile-aligned."""
    starts = [0]
    for h, w in spatial_shapes:
        starts.append(starts[-1] + _round_up(h * w, s_tile))
    return tuple(starts[:-1]), starts[-1]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Tap preparation (differentiable XLA elementwise)
# ---------------------------------------------------------------------------

def _taps(spatial_shapes: Shapes, loc, att):
    """Per-tap level-local flat indices and combined weights.

    loc: (B, Q, M, L, P, 2); att: (B, Q, M, L, P)
    → idx (B, M, Q, L, P*4) int32 [level-local], wt (B, M, Q, L, P*4) f32.
    Differentiable wrt loc and att (idx uses stop_gradient internally).
    """
    B, Q, M, L, P, _ = loc.shape
    xs, ys = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        xs.append(loc[:, :, :, lvl, :, 0].astype(jnp.float32) * w - 0.5)
        ys.append(loc[:, :, :, lvl, :, 1].astype(jnp.float32) * h - 0.5)
    x = jnp.stack(xs, axis=3)                    # (B, Q, M, L, P)
    y = jnp.stack(ys, axis=3)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - jax.lax.stop_gradient(x0)
    dy = y - jax.lax.stop_gradient(y0)
    x0i = jax.lax.stop_gradient(x0).astype(jnp.int32)
    y0i = jax.lax.stop_gradient(y0).astype(jnp.int32)

    hs = jnp.asarray([h for h, _ in spatial_shapes],
                     jnp.int32)[None, None, None, :, None]
    ws = jnp.asarray([w for _, w in spatial_shapes],
                     jnp.int32)[None, None, None, :, None]
    attf = att.astype(jnp.float32)

    idxs, wts = [], []
    for oy, ox, tw in ((0, 0, (1 - dy) * (1 - dx)), (0, 1, (1 - dy) * dx),
                       (1, 0, dy * (1 - dx)), (1, 1, dy * dx)):
        yi, xi = y0i + oy, x0i + ox
        valid = ((xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs))
        idx = jnp.clip(yi, 0, hs - 1) * ws + jnp.clip(xi, 0, ws - 1)
        idxs.append(idx)
        wts.append(tw * valid.astype(jnp.float32) * attf)
    idx = jnp.stack(idxs, axis=-1).reshape(B, Q, M, L, P * 4)
    wt = jnp.stack(wts, axis=-1).reshape(B, Q, M, L, P * 4)
    return (jnp.transpose(idx, (0, 2, 1, 3, 4)),
            jnp.transpose(wt, (0, 2, 1, 3, 4)))


def _tile_ranges(idx, wt, spatial_shapes: Shapes, q_tile: int, s_tile: int,
                 q_pad: int):
    """Per (b·m, q-tile, level) s-tile [start, count] covering every tap.

    idx/wt: (B, M, Q, L, K). Padded query rows must carry wt == 0."""
    B, M, Q, L, K = idx.shape
    nqt = q_pad // q_tile
    pad = q_pad - Q
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    idx = idx.reshape(B * M, nqt, q_tile, L, K)
    wt = wt.reshape(B * M, nqt, q_tile, L, K)
    live = wt != 0.0
    big = jnp.asarray(1 << 30, jnp.int32)
    lo = jnp.min(jnp.where(live, idx, big), axis=(2, 4))      # (BM, nqt, L)
    hi = jnp.max(jnp.where(live, idx, -1), axis=(2, 4))
    start = jnp.where(hi >= 0, lo // s_tile, 0).astype(jnp.int32)
    count = jnp.where(hi >= 0, hi // s_tile + 1 - lo // s_tile, 0)
    return jnp.stack([start, count.astype(jnp.int32)], axis=-1)  # (BM,nqt,L,2)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _build_wt_tile(w_ref, idx_ref, wt_ref, cols_t, lvl: int, K: int):
    """Accumulate Wᵀ (s_tile, Qt) into the `w_ref` scratch for one s-tile.

    Statically-unrolled tap loop with static sublane reads; the scratch ref
    (instead of an SSA chain) bounds live temporaries to one tile."""
    w_ref[:] = jnp.zeros_like(w_ref)
    zero = jnp.zeros((), w_ref.dtype)
    for k in range(K):
        idx_k = idx_ref[0, lvl * K + k, :][None, :]            # (1, Qt)
        wt_k = wt_ref[0, lvl * K + k, :][None, :].astype(w_ref.dtype)
        w_ref[:] += jnp.where(idx_k == cols_t, wt_k, zero)


def _fwd_kernel(ranges_ref, value_ref, idx_ref, wt_ref, out_ref, w_ref, *,
                level_starts, s_tile: int, K: int, acc_dtype):
    """One (b·m, q-tile) instance: out (1, Qt, D)."""
    Qt = out_ref.shape[1]
    D = out_ref.shape[2]
    L = len(level_starts)
    idt = idx_ref.dtype
    # hardware has no 16-bit iota; build in i32 and convert
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (s_tile, Qt), 0).astype(idt)
    acc = jnp.zeros((Qt, D), jnp.float32)

    for lvl in range(L):
        start_t = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        def body(t, acc, lvl=lvl):
            s0 = pl.multiple_of((start_t + t) * s_tile, s_tile)
            vt = value_ref[0, pl.ds(level_starts[lvl] + s0, s_tile), :]
            _build_wt_tile(w_ref, idx_ref, wt_ref,
                           rows0 + s0.astype(idt), lvl, K)
            # out[q] += Σ_s Wᵀ[s, q] · v[s]  — contract the s axis
            return acc + jax.lax.dot_general(
                w_ref[:].astype(acc_dtype), vt.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, num_t, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(ranges_ref, value_ref, idx_ref, wt_ref, g_ref,
                gval_ref, gwt_ref, w_ref, *, level_starts, s_tile: int,
                K: int, acc_dtype, groups: int = 1):
    """Gradients for one (b·m, q-tile): grad_value (accumulated across
    q-tiles — the gval block is revisited, zeroed at the first tile) and
    grad_wt."""
    Qt = g_ref.shape[1]
    L = len(level_starts)
    qt_i = pl.program_id(1)
    idt = idx_ref.dtype
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (s_tile, Qt), 0).astype(idt)
    g = g_ref[0].astype(jnp.float32)                  # (Qt, D)

    bm_i = pl.program_id(0)
    @pl.when((qt_i == 0) & (bm_i % groups == 0))
    def _():
        gval_ref[0] = jnp.zeros_like(gval_ref[0])

    gwt_ref[0] = jnp.zeros_like(gwt_ref[0])

    for lvl in range(L):
        start_t = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        def body(t, carry, lvl=lvl):
            s0 = pl.multiple_of((start_t + t) * s_tile, s_tile)
            base = level_starts[lvl] + s0
            vt = value_ref[0, pl.ds(base, s_tile), :]
            cols_t = rows0 + s0.astype(idt)
            _build_wt_tile(w_ref, idx_ref, wt_ref, cols_t, lvl, K)
            # grad_value tile += Wᵀ @ g   (deterministic scatter-free)
            gval_ref[0, pl.ds(base, s_tile), :] += jax.lax.dot(
                w_ref[:].astype(acc_dtype), g.astype(acc_dtype),
                preferred_element_type=jnp.float32).astype(gval_ref.dtype)
            # Gᵀ[s, q] = v[s] · g[q]; grad_wt[q, k] = Gᵀ[idx[q, k], q]
            G_t = jax.lax.dot_general(
                vt.astype(acc_dtype), g.astype(acc_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (s_tile, Qt)
            for k in range(K):
                idx_k = idx_ref[0, lvl * K + k, :][None, :]    # (1, Qt)
                col = jnp.sum(jnp.where(idx_k == cols_t, G_t, 0.0),
                              axis=0, keepdims=True)           # (1, Qt)
                gwt_ref[0, lvl * K + k, :] += col[0]
            return carry

        jax.lax.fori_loop(0, num_t, body, 0)
    # NOTE: taps with wt == 0 can still get a grad_wt contribution when their
    # clipped index lies inside a visited range; the XLA chain rule multiplies
    # by the validity mask, zeroing them — semantics stay exact.


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _common_specs(q_tile, L, K, S_pad, D, groups: int = 1):
    ranges_spec = pl.BlockSpec((1, 1, L, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)
    # `groups` consecutive grid rows share one value block (grouped heads —
    # e.g. deformable conv puts the K x K kernel positions on the head axis
    # without replicating the feature map in HBM).
    value_spec = pl.BlockSpec((1, S_pad, D),
                              lambda bm, qt: (bm // groups, 0, 0),
                              memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, L * K, q_tile), lambda bm, qt: (bm, 0, qt),
                            memory_space=pltpu.VMEM)
    return ranges_spec, value_spec, idx_spec, idx_spec


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def _fwd_call(spatial_shapes: Shapes, value_bm, idx, wt, ranges,
              q_tile: int, s_tile: int, groups: int = 1):
    """value_bm: (B·M, S_pad, D); idx/wt: (B·M·G, L·K, q_pad)."""
    BM, S_pad, D = value_bm.shape
    BMG = idx.shape[0]
    LK, q_pad = idx.shape[1], idx.shape[2]
    L = ranges.shape[2]
    K = LK // L
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tile)
    acc_dtype = value_bm.dtype if value_bm.dtype == jnp.bfloat16 \
        else jnp.float32
    r_spec, v_spec, i_spec, w_spec = _common_specs(q_tile, L, K, S_pad, D,
                                                   groups)
    kernel = functools.partial(_fwd_kernel, level_starts=level_starts,
                               s_tile=s_tile, K=K, acc_dtype=acc_dtype)
    return pl.pallas_call(
        kernel,
        grid=(BMG, q_pad // q_tile),
        in_specs=[r_spec, v_spec, i_spec, w_spec],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BMG, q_pad, D), value_bm.dtype),
        scratch_shapes=[pltpu.VMEM((s_tile, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_bm, idx, wt)


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _bwd_call(spatial_shapes: Shapes, value_bm, idx, wt, ranges, g_bm,
              q_tile: int, s_tile: int, groups: int = 1):
    BM, S_pad, D = value_bm.shape
    BMG = idx.shape[0]
    LK, q_pad = idx.shape[1], idx.shape[2]
    L = ranges.shape[2]
    K = LK // L
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tile)
    acc_dtype = value_bm.dtype if value_bm.dtype == jnp.bfloat16 \
        else jnp.float32
    r_spec, v_spec, i_spec, w_spec = _common_specs(q_tile, L, K, S_pad, D,
                                                   groups)
    g_spec = pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, level_starts=level_starts,
                               s_tile=s_tile, K=K, acc_dtype=acc_dtype,
                               groups=groups)
    gval, gwt = pl.pallas_call(
        kernel,
        grid=(BMG, q_pad // q_tile),
        in_specs=[r_spec, v_spec, i_spec, w_spec, g_spec],
        out_specs=(
            pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm // groups, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L * K, q_tile), lambda bm, qt: (bm, 0, qt),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BM, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BMG, LK, q_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((s_tile, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_bm, idx, wt, g_bm)
    return gval, gwt


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

Q_TILE = 256
S_TILE = 256


def _pack_levels(value_bm, spatial_shapes: Shapes, s_tile: int):
    """(B·M, S, D) → (B·M, S_pad, D) with every level padded to s_tile."""
    starts = _level_starts(spatial_shapes)
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        seg = jax.lax.slice_in_dim(value_bm, starts[lvl], starts[lvl] + n,
                                   axis=1)
        parts.append(jnp.pad(seg, ((0, 0), (0, _round_up(n, s_tile) - n),
                                   (0, 0))))
    return jnp.concatenate(parts, axis=1)


def _unpack_levels(packed, spatial_shapes: Shapes, s_tile: int):
    """Inverse of `_pack_levels` along axis 1."""
    pstarts, _ = _padded_level_starts(spatial_shapes, s_tile)
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        parts.append(jax.lax.slice_in_dim(packed, pstarts[lvl],
                                          pstarts[lvl] + h * w, axis=1))
    return jnp.concatenate(parts, axis=1)


def _prep(value, spatial_shapes, loc, att, q_tile, s_tile):
    """Kernel-layout inputs. Heads in loc/att may be a multiple G of the
    value heads (grouped heads sharing a value block — deformable conv)."""
    B, S, M, D = value.shape
    Q = loc.shape[1]
    MG = loc.shape[2]
    idx, wt = _taps(spatial_shapes, loc, att)          # (B, MG, Q, L, K)
    q_pad = _round_up(Q, q_tile)
    ranges = _tile_ranges(idx, wt, spatial_shapes, q_tile, s_tile, q_pad)
    B_, M_, _, L, K = idx.shape
    # tap axis → sublanes, queries → lanes: (B·M·G, L·K, q_pad)
    idx = jnp.transpose(idx, (0, 1, 3, 4, 2)).reshape(B * MG, L * K, Q)
    wt = jnp.transpose(wt, (0, 1, 3, 4, 2)).reshape(B * MG, L * K, Q)
    if q_pad != Q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, q_pad - Q)),
                      constant_values=-1)
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, q_pad - Q)))
    # NOTE: a bf16 weight-tile build (int16 indices + bf16 selects, 2× VPU
    # rate) was prototyped but v5e's VPU supports neither 16-bit iota nor
    # 16-bit vector compares — the W build stays int32/float32.
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    value_bm = _pack_levels(value_bm, spatial_shapes, s_tile)
    return value_bm, idx, wt, ranges, L, K, q_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes: Shapes, sampling_locations,
                          attention_weights, q_tile: int = 0):
    """Pallas forward; same contract as `ms_deform_attn` (xla backend).
    q_tile=0 → the default Q_TILE; callers with very large query counts per
    batch item (deformable conv) pass a bigger tile to cut grid steps."""
    out, _ = _fwd_res(value, spatial_shapes, sampling_locations,
                      attention_weights, q_tile or Q_TILE)
    return out


def _fwd_res(value, spatial_shapes, loc, att, q_tile=None):
    q_tile = q_tile or Q_TILE
    B, S, M, D = value.shape
    Q = loc.shape[1]
    MG = loc.shape[2]
    groups = MG // M
    value_bm, idx, wt, ranges, L, K, q_pad = _prep(
        value, spatial_shapes, loc, att, q_tile, S_TILE)
    out_bm = _fwd_call(spatial_shapes, value_bm, idx, wt, ranges,
                       q_tile, S_TILE, groups)
    out = out_bm.reshape(B, MG, q_pad, D)[:, :, :Q]
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, MG * D)
    return out.astype(value.dtype), (value, loc, att)


def _fwd_fwd(value, spatial_shapes, loc, att, q_tile: int = 0):
    return _fwd_res(value, spatial_shapes, loc, att, q_tile or Q_TILE)


def _fwd_bwd(spatial_shapes, q_tile, res, g):
    q_tile = q_tile or Q_TILE
    value, loc, att = res
    B, S, M, D = value.shape
    Q = loc.shape[1]
    MG = loc.shape[2]
    groups = MG // M
    value_bm, idx, wt, ranges, L, K, q_pad = _prep(
        value, spatial_shapes, loc, att, q_tile, S_TILE)
    g_bm = jnp.transpose(g.reshape(B, Q, MG, D), (0, 2, 1, 3)) \
        .reshape(B * MG, Q, D)
    g_bm = jnp.pad(g_bm, ((0, 0), (0, q_pad - Q), (0, 0))) \
        .astype(value_bm.dtype)
    gval_bm, gwt = _bwd_call(spatial_shapes, value_bm, idx, wt, ranges, g_bm,
                             q_tile, S_TILE, groups)
    gval = _unpack_levels(gval_bm, spatial_shapes, S_TILE)
    gval = gval.reshape(B, M, S, D).transpose(0, 2, 1, 3)
    # back to (B, MG, Q, L, K), then chain rule through the tap builder
    gwt = gwt.reshape(B, MG, L, K, q_pad)[..., :Q].transpose(0, 1, 4, 2, 3)
    _, vjp = jax.vjp(lambda l, a: _taps(spatial_shapes, l, a)[1], loc, att)
    gloc, gatt = vjp(gwt)
    return gval.astype(value.dtype), gloc.astype(loc.dtype), \
        gatt.astype(att.dtype)


ms_deform_attn_pallas.defvjp(_fwd_fwd, _fwd_bwd)
