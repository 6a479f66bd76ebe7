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

**Parity packing** halves the build cost: the value rows are split by raster
parity into V_even[m] = V[2m] and V_odd[m] = V[2m+1], and the bilinear x-tap
pair (i, i+1) always contains exactly one even and one odd index, so each tap
is *statically* routable (entry k → parity class k & 1) to a per-class weight
tile built by comparing the packed index m = i >> 1 against half-height
columns. Same matmul FLOPs (two half-tiles instead of one), half the VPU
compares per unit of spatial coverage — and the build dominates.

Forward-path layout (all chosen against measured device-time sweeps — see
docs/PERFORMANCE.md):
  * **In-kernel tap generation**: the kernel consumes raw location/attention
    rows (B·M·G, L·P, q_pad) — queries on lanes, (level, point) on sublanes —
    and derives the parity-routed packed tap entries per level with static
    (h, w) immediates in f32 (integer-exact below 2²³). This removes the
    XLA-side tap fusion / transpose / pad chain per call (8/3 less operand
    traffic than pre-expanded idx/wt).
  * **Window-aligned s-tiles**: per (q-tile, level) the s-window starts at
    the 8-aligned span minimum (`_row_ranges`), not at an s_tile multiple;
    each level's packed value buffer carries one extra zero s_tile so
    windows may overrun. The matmul cost is weight-load bound (W elements /
    128 per cycle), so windows ∝ time.
  * The weight tile is built transposed, Wᵀ (s_tile, q_tile), in VMEM
    scratch; the accumulation is outᵀ = vᵀ·Wᵀ (full-lane N = q_tile), with
    one accumulator per parity class to keep the two matmul chains
    independent.

The backward pass (custom VJP below):
    grad_value[s]  = Σ_q W[q, s] · g[q]          (Wᵀ @ g — a matmul,
                                                  deterministic scatter-free)
    grad_wt[q, k]  = g[q] · value[idx[q, k]]     (extracted from v @ gᵀ with
                                                  the same compares)
The rows-form backward (`_bwd_call_rows`) generates taps in-kernel from the
same raw location/attention rows as the forward AND applies the bilinear
chain rule in-kernel, emitting grad rows (glx, gly, gat) directly — no
materialized idx/wt operands and no XLA `_taps_rows` VJP pass. The q-major
legacy op (`ms_deform_attn_pallas`) keeps the materialized-tap route
(`_taps` → `_bwd_call` → XLA chain rule).

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


def _padded_level_starts(spatial_shapes: Shapes, s_tile, tight: bool = False):
    """Level starts in PACKED (row-pair) space when every level is padded to
    an s_tile multiple PLUS one extra zero s_tile — forward windows start at
    the 8-aligned span minimum and may overrun the level end by < s_tile.
    Packed level size = ceil(h·w / 2). `s_tile` may be one int or a
    per-level tuple (projection-fused path). `tight` pads each level to
    round_up(n2 + s, 32) instead — sufficient for 8-aligned window bases
    (max read end = span max + s) and ~20% less value staging at the
    per-level window sizes (region-free backward)."""
    tiles = _as_level_tiles(spatial_shapes, s_tile)
    starts = [0]
    for (h, w), s in zip(spatial_shapes, tiles):
        n2 = -(-h * w // 2)
        pad = _round_up(n2 + s, 32) if tight else _round_up(n2, s) + s
        starts.append(starts[-1] + pad)
    return tuple(starts[:-1]), starts[-1]


def _as_level_tiles(spatial_shapes: Shapes, s_tile):
    if isinstance(s_tile, (tuple, list)):
        assert len(s_tile) == len(spatial_shapes)
        return tuple(int(s) for s in s_tile)
    return (int(s_tile),) * len(spatial_shapes)


def _proj_s_tiles(spatial_shapes: Shapes, q_tile: int):
    """Per-level static window sizes for the projection-fused forward.

    The straight-line kernel executes exactly ONE window per level (plus a
    rarely-taken overflow fallback), so each level's window must cover the
    TYPICAL span: the q-tile's own raster footprint at that level plus a
    tap margin (~5 rows ≈ ±4 px learned offsets + the bilinear extent; the
    reference's directional-grid bias init reaches ±P px,
    ms_deform_attn.py:64-82). Spans larger than this (coarse-level query
    tiles sampling fine levels, or extreme learned offsets) take the
    in-kernel overflow path, which stays exact. Clamped to the level's own
    packed size and [32, 512]."""
    h0, w0 = spatial_shapes[0]
    area0 = float(h0 * w0)
    tiles = []
    for h, w in spatial_shapes:
        rows = q_tile / area0 * h + 5.0
        span = _round_up(max(32, int(rows * w / 2.0)), 32)
        packed = _round_up(-(-h * w // 2), 32)
        tiles.append(int(min(512, span, packed)))
    return tuple(tiles)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_q(x, q_tile: int):
    """(B, rows, q_pad) → (B, nqt, rows, q_tile): contiguous per-program row
    blocks.

    A (1, rows, q_tile) block sliced out of the flat (B, rows, q_pad) layout
    DMAs as `rows` separate q_tile-wide strided chunks — at the encoder's
    ~300 operand rows per program the kernel is DMA-descriptor-bound
    (~37 µs/program measured, independent of the inner-loop trip count; the
    same inner loop on contiguous operands runs the W-build compute-bound).
    Pre-tiling makes every program's row block ONE contiguous chunk; the
    transpose is a single cheap XLA copy per call."""
    B, rows, q_pad = x.shape
    return jnp.transpose(x.reshape(B, rows, q_pad // q_tile, q_tile),
                         (0, 2, 1, 3))


def _tile_headmajor(x, M: int, q_tile: int):
    """(T·M, rows, q_pad) → head-slab tiled (T, nqt, M·rows, q_tile) — the
    layout `TransposedDense` emits natively from (T, nqt, q_tile, C) query
    tiles (head-major feature channels). Test/bench helper; the production
    path never materializes the untiled form."""
    TM, rows, q_pad = x.shape
    T = TM // M
    nqt = q_pad // q_tile
    return jnp.transpose(x.reshape(T, M, rows, nqt, q_tile),
                         (0, 3, 1, 2, 4)).reshape(T, nqt, M * rows, q_tile)


def _untile_headmajor(x, M: int):
    """Inverse of `_tile_headmajor` (differentiable; backward-path only)."""
    T, nqt, MR, q_tile = x.shape
    rows = MR // M
    return jnp.transpose(x.reshape(T, nqt, M, rows, q_tile),
                         (0, 2, 3, 1, 4)).reshape(T * M, rows, nqt * q_tile)


def _untile_ref(x):
    """(T, nqt, L, q_tile) → (T, L, q_pad) (differentiable)."""
    T, nqt, L, q_tile = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(T, L, nqt * q_tile)


# ---------------------------------------------------------------------------
# Tap preparation (differentiable XLA elementwise)
# ---------------------------------------------------------------------------

def _taps(spatial_shapes: Shapes, loc, att):
    """Per-point parity-routed PACKED tap entries.

    loc: (B, Q, M, L, P, 2); att: (B, Q, M, L, P)
    → idx (B, M, Q, L, P*4) int32 [level-local, packed: m = raster >> 1],
      wt  (B, M, Q, L, P*4) f32.

    The 4 entries per point are (even-top, odd-top, even-bot, odd-bot): the
    bilinear x-pair (i, i+1) always holds one even and one odd raster index,
    so entry k belongs to parity class k & 1 *statically* and the kernel can
    compare packed indices against half-height column tiles. Out-of-range
    taps keep their UNCLIPPED packed index (weight is masked to 0, and ranges
    only cover live entries — a dead index inside a visited tile adds 0).
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
    for oy, wy in ((0, 1 - dy), (1, dy)):        # top row, bottom row
        yi = y0i + oy
        row_ok = ((yi >= 0) & (yi < hs))
        base = yi * ws + x0i                     # unclipped left-tap raster
        wl = wy * (1 - dx) * (row_ok & (x0i >= 0) &
                              (x0i < ws)).astype(jnp.float32) * attf
        wr = wy * dx * (row_ok & (x0i + 1 >= 0) &
                        (x0i + 1 < ws)).astype(jnp.float32) * attf
        even_left = (base & 1) == 0
        m_l = base >> 1
        m_r = (base + 1) >> 1
        idxs.append(jnp.where(even_left, m_l, m_r))        # even-class entry
        wts.append(jnp.where(even_left, wl, wr))
        idxs.append(jnp.where(even_left, m_r, m_l))        # odd-class entry
        wts.append(jnp.where(even_left, wr, wl))
    # entry order per point: (e_top, o_top, e_bot, o_bot) — class = k & 1
    idx = jnp.stack(idxs, axis=-1).reshape(B, Q, M, L, P * 4)
    wt = jnp.stack(wts, axis=-1).reshape(B, Q, M, L, P * 4)
    return (jnp.transpose(idx, (0, 2, 1, 3, 4)),
            jnp.transpose(wt, (0, 2, 1, 3, 4)))


def _row_ranges(lx, ly, spatial_shapes: Shapes, q_tile: int, s_tile,
                P: int):
    """Per (b·m, q-tile, level) packed s-window [base, count] computed from
    the kernel-layout location rows (B·MG, L·P, q_pad) — no materialized tap
    indices; the forward kernel generates taps in-kernel.

    A point contributes iff its 2×2 tap square intersects the level; the
    bound uses min/max of the clipped tap rows/cols (a superset of the live
    entries, exact coverage for any offsets). The window base is 8-aligned so
    a span ≤ s_tile−7 costs one matmul window (each level's packed value
    buffer carries one extra zero s_tile for overrun)."""
    BMG, LP, q_pad = lx.shape
    L = LP // P
    nqt = q_pad // q_tile
    tiles = _as_level_tiles(spatial_shapes, s_tile)
    mns, mxs = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = lx[:, lvl * P:(lvl + 1) * P].reshape(BMG, P, nqt, q_tile) * w - 0.5
        y = ly[:, lvl * P:(lvl + 1) * P].reshape(BMG, P, nqt, q_tile) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        valid = (x > -1) & (x < w) & (y > -1) & (y < h)
        lo = jnp.floor((jnp.clip(y0, 0, h - 1) * w
                        + jnp.clip(x0, 0, w - 1)) * 0.5)
        hi = jnp.floor((jnp.clip(y0 + 1, 0, h - 1) * w
                        + jnp.clip(x0 + 1, 0, w - 1)) * 0.5)
        big = jnp.float32(1 << 30)
        mns.append(jnp.min(jnp.where(valid, lo, big), axis=(1, 3)))
        mxs.append(jnp.max(jnp.where(valid, hi, -1.0), axis=(1, 3)))
    mn = jnp.stack(mns, axis=-1).astype(jnp.int32)       # (BMG, nqt, L)
    mx = jnp.stack(mxs, axis=-1).astype(jnp.int32)
    base = (mn // 8) * 8
    s_arr = jnp.asarray(tiles, jnp.int32)[None, None, :]
    count = jnp.where(mx >= 0, (mx - base) // s_arr + 1, 0)
    return jnp.stack([jnp.where(mx >= 0, base, 0),
                      count.astype(jnp.int32)], axis=-1)


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

def _build_wt_tiles(we_ref, wo_ref, idx_ref, wt_ref, cols_t, lvl: int, K: int):
    """Accumulate the two per-parity Wᵀ (s_tile, Qt) scratch tiles for one
    packed s-tile. Entry k routes statically to class k & 1.

    Statically-unrolled tap loop with static sublane reads; the scratch refs
    (instead of an SSA chain) bound live temporaries to one tile."""
    we_ref[:] = jnp.zeros_like(we_ref)
    wo_ref[:] = jnp.zeros_like(wo_ref)
    zero = jnp.zeros((), we_ref.dtype)
    for k in range(K):
        ref = we_ref if (k & 1) == 0 else wo_ref
        idx_k = idx_ref[0, 0, lvl * K + k, :][None, :]         # (1, Qt)
        wt_k = wt_ref[0, 0, lvl * K + k, :][None, :].astype(ref.dtype)
        ref[:] += jnp.where(idx_k == cols_t, wt_k, zero)


def _level_entries(lx, ly, at, h: int, w: int):
    """In-kernel tap generation for one level: from (P, Qt) location/weight
    rows to the 4 parity-routed PACKED entries per point (same math as
    `_taps`, f32 throughout — exact for indices < 2^23).

    Returns [(idx_e, wt_e, idx_o, wt_o)] for top and bottom rows: each a
    (P, Qt) f32 block; entry class is static (even, odd)."""
    hf, wf = float(h), float(w)
    x = lx * wf - 0.5
    y = ly * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    one = jnp.float32(1.0)
    vx0 = (x0 >= 0) & (x0 <= wf - 1)
    vx1 = (x0 >= -1) & (x0 <= wf - 2)
    out = []
    for y_row, wy in ((y0, (1 - dy)), (y0 + 1, dy)):
        vy = (y_row >= 0) & (y_row <= hf - 1)
        wl = wy * (1 - dx) * at * jnp.where(vy & vx0, one, 0.0)
        wr = wy * dx * at * jnp.where(vy & vx1, one, 0.0)
        base = y_row * wf + x0
        m_l = jnp.floor(base * 0.5)
        m_r = jnp.floor((base + 1) * 0.5)
        even = (base - 2.0 * m_l) == 0
        out.append((jnp.where(even, m_l, m_r), jnp.where(even, wl, wr),
                    jnp.where(even, m_r, m_l), jnp.where(even, wr, wl)))
    return out


def _fwd_kernel_fused(ranges_ref, ve_ref, vo_ref, lx_ref, ly_ref, at_ref,
                      out_ref, acc_ref, *, spatial_shapes,
                      level_starts, s_tiles, P: int, acc_dtype):
    """One (b·m, q-tile) instance with in-kernel tap generation: operands are
    raw sampling locations/attention rows (L·P per cell) instead of
    pre-expanded tap indices/weights — 8/3 less operand traffic and no
    XLA-side tap fusion/transpose/pad chain.

    Region-free form (r5, same design as the proj kernels): ONE
    straight-line window per level of a per-level static size plus a single
    per-program `pl.when` overflow tail accumulating into a scratch. A
    level with count 0 runs its window at base 0 — the entry weights carry
    the validity masks, so W = 0 and the dot is a no-op."""
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    f32 = jnp.float32
    # hardware iota is integer-only; build i32 then convert to f32
    iotas = {t: jax.lax.broadcasted_iota(jnp.int32, (t, Qt), 0).astype(f32)
             for t in sorted(set(s_tiles))}

    def lvl_entries(lvl):
        h, w = spatial_shapes[lvl]
        lx = lx_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        ly = ly_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        at = at_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        return _level_entries(lx, ly, at, h, w)

    acc_e = jnp.zeros((D, Qt), f32)
    acc_o = jnp.zeros((D, Qt), f32)
    for lvl in range(len(spatial_shapes)):
        s_l = s_tiles[lvl]
        entries = lvl_entries(lvl)
        base_w = ranges_ref[0, 0, lvl, 0]          # 8-aligned window base
        s0 = pl.multiple_of(base_w, 8)
        vte = ve_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
        vto = vo_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
        cols = iotas[s_l] + s0.astype(f32)
        we = _entry_tree(entries, cols, P, 0)
        wo = _entry_tree(entries, cols, P, 1)
        acc_e = acc_e + jax.lax.dot_general(
            vte.astype(acc_dtype), we.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_o = acc_o + jax.lax.dot_general(
            vto.astype(acc_dtype), wo.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    live = [lvl for lvl, (h, w) in enumerate(spatial_shapes)
            if s_tiles[lvl] < -(-h * w // 2)]
    if not live:
        out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)
        return
    overflow = ranges_ref[0, 0, live[0], 1]
    for lvl in live[1:]:
        overflow = jnp.maximum(overflow, ranges_ref[0, 0, lvl, 1])
    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(overflow > 1)
    def _tail():
        for lvl in live:
            s_l = s_tiles[lvl]
            entries = lvl_entries(lvl)
            base_w = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]
            rows0 = iotas[s_l]

            def body(t, carry, lvl=lvl, s_l=s_l, entries=entries,
                     base_w=base_w, rows0=rows0):
                s0 = pl.multiple_of(base_w + t * s_l, 8)
                vte = ve_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
                vto = vo_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
                cols = rows0 + s0.astype(f32)
                we = _entry_tree(entries, cols, P, 0)
                wo = _entry_tree(entries, cols, P, 1)
                acc_ref[:] += (jax.lax.dot_general(
                    vte.astype(acc_dtype), we.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                    vto.astype(acc_dtype), wo.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                return carry
            jax.lax.fori_loop(1, num_t, body, 0)

    out_ref[0, 0] = (acc_e + acc_o + acc_ref[:]).astype(out_ref.dtype)


def _bwd_kernel(ranges_ref, ve_ref, vo_ref, idx_ref, wt_ref, g_ref,
                gve_ref, gvo_ref, gwt_ref, we_ref, wo_ref, *, level_starts,
                s_tile: int, K: int, acc_dtype, groups: int = 1):
    """Gradients for one (b·m, q-tile): grad_value (accumulated across
    q-tiles — the gval blocks are revisited, zeroed at the first tile) and
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
        gve_ref[0] = jnp.zeros_like(gve_ref[0])
        gvo_ref[0] = jnp.zeros_like(gvo_ref[0])

    gwt_ref[0, 0] = jnp.zeros_like(gwt_ref[0, 0])

    for lvl in range(L):
        start_t = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        def body(t, carry, lvl=lvl):
            s0 = pl.multiple_of((start_t + t) * s_tile, s_tile)
            base = level_starts[lvl] + s0
            vte = ve_ref[0, pl.ds(base, s_tile), :]
            vto = vo_ref[0, pl.ds(base, s_tile), :]
            cols_t = rows0 + s0.astype(idt)
            _build_wt_tiles(we_ref, wo_ref, idx_ref, wt_ref, cols_t, lvl, K)
            # grad_value tile += Wᵀ @ g   (deterministic scatter-free)
            gve_ref[0, pl.ds(base, s_tile), :] += jax.lax.dot(
                we_ref[:].astype(acc_dtype), g.astype(acc_dtype),
                preferred_element_type=jnp.float32).astype(gve_ref.dtype)
            gvo_ref[0, pl.ds(base, s_tile), :] += jax.lax.dot(
                wo_ref[:].astype(acc_dtype), g.astype(acc_dtype),
                preferred_element_type=jnp.float32).astype(gvo_ref.dtype)
            # Gᵀ[m, q] = v[m] · g[q]; grad_wt[q, k] = G_classᵀ[idx[q, k], q]
            G_e = jax.lax.dot_general(
                vte.astype(acc_dtype), g.astype(acc_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (s_tile, Qt)
            G_o = jax.lax.dot_general(
                vto.astype(acc_dtype), g.astype(acc_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for k in range(K):
                G_t = G_e if (k & 1) == 0 else G_o
                idx_k = idx_ref[0, 0, lvl * K + k, :][None, :]  # (1, Qt)
                col = jnp.sum(jnp.where(idx_k == cols_t, G_t, 0.0),
                              axis=0, keepdims=True)           # (1, Qt)
                gwt_ref[0, 0, lvl * K + k, :] += col[0]
            return carry

        jax.lax.fori_loop(0, num_t, body, 0)
    # NOTE: taps with wt == 0 can still get a grad_wt contribution when their
    # unclipped index lies inside a visited range; the XLA chain rule
    # multiplies by the validity mask, zeroing them — semantics stay exact.


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
    idx_spec = pl.BlockSpec((1, 1, L * K, q_tile),
                            lambda bm, qt: (bm, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    return ranges_spec, value_spec, value_spec, idx_spec, idx_spec


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9))
def _fwd_call_fused(spatial_shapes: Shapes, value_e, value_o, lx, ly, at,
                    ranges, q_tile: int, s_tile: int, groups: int = 1):
    """value_e/value_o: (B·M, S_pad, D) parity-packed;
    lx/ly/at: (B·M·G, L·P, q_pad) raw location/attention rows."""
    BM, S_pad, D = value_e.shape
    BMG = lx.shape[0]
    LP, q_pad = lx.shape[1], lx.shape[2]
    L = ranges.shape[2]
    P = LP // L
    s_tiles = _as_level_tiles(spatial_shapes, s_tile)
    lx, ly, at = (_tile_q(a, q_tile) for a in (lx, ly, at))
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tiles,
                                           tight=True)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    ranges_spec = pl.BlockSpec((1, 1, L, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)
    value_spec = pl.BlockSpec((1, S_pad, D),
                              lambda bm, qt: (bm // groups, 0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, LP, q_tile),
                            lambda bm, qt: (bm, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_fused,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts,
                               s_tiles=s_tiles, P=P, acc_dtype=acc_dtype)
    nqt = q_pad // q_tile
    out = pl.pallas_call(
        kernel,
        grid=(BMG, nqt),
        in_specs=[ranges_spec, value_spec, value_spec,
                  row_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, 1, D, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BMG, nqt, D, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((D, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_e, value_o, lx, ly, at)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(BMG, D, q_pad)


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9))
def _bwd_call(spatial_shapes: Shapes, value_e, value_o, idx, wt, ranges, g_bm,
              q_tile: int, s_tile: int, groups: int = 1):
    BM, S_pad, D = value_e.shape
    BMG = idx.shape[0]
    LK, q_pad = idx.shape[1], idx.shape[2]
    L = ranges.shape[2]
    K = LK // L
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tile)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    r_spec, ve_spec, vo_spec, i_spec, w_spec = _common_specs(
        q_tile, L, K, S_pad, D, groups)
    g_spec = pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, level_starts=level_starts,
                               s_tile=s_tile, K=K, acc_dtype=acc_dtype,
                               groups=groups)
    gval_spec = pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm // groups, 0, 0),
                             memory_space=pltpu.VMEM)
    idx, wt = _tile_q(idx, q_tile), _tile_q(wt, q_tile)
    nqt = q_pad // q_tile
    gve, gvo, gwt = pl.pallas_call(
        kernel,
        grid=(BMG, nqt),
        in_specs=[r_spec, ve_spec, vo_spec, i_spec, w_spec, g_spec],
        out_specs=(
            gval_spec,
            gval_spec,
            pl.BlockSpec((1, 1, L * K, q_tile),
                         lambda bm, qt: (bm, qt, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BM, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BM, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BMG, nqt, LK, q_tile), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((s_tile, q_tile), jnp.float32),
                        pltpu.VMEM((s_tile, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_e, value_o, idx, wt, g_bm)
    gwt = jnp.transpose(gwt, (0, 2, 1, 3)).reshape(BMG, LK, q_pad)
    return gve, gvo, gwt


# ---------------------------------------------------------------------------
# Rows-operand backward: in-kernel taps + in-kernel bilinear chain rule
# ---------------------------------------------------------------------------


def _row_ranges_bwd(lx, ly, spatial_shapes: Shapes, q_tile: int, s_tile,
                    P: int):
    """Per (b·m·g, q-tile, level) packed s-window [start_tile, count] in
    the level's tile units (the backward kernel's grad_value writes are
    tile-aligned). `s_tile` may be one int or a per-level tuple (the
    region-free backward sizes windows per level like `_proj_s_tiles`).
    Same span math as `_row_ranges`."""
    BMG, LP, q_pad = lx.shape
    nqt = q_pad // q_tile
    tiles = _as_level_tiles(spatial_shapes, s_tile)
    sts, cts = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        s_l = tiles[lvl]
        x = lx[:, lvl * P:(lvl + 1) * P].reshape(BMG, P, nqt, q_tile) * w - 0.5
        y = ly[:, lvl * P:(lvl + 1) * P].reshape(BMG, P, nqt, q_tile) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        valid = (x > -1) & (x < w) & (y > -1) & (y < h)
        lo = jnp.floor((jnp.clip(y0, 0, h - 1) * w
                        + jnp.clip(x0, 0, w - 1)) * 0.5)
        hi = jnp.floor((jnp.clip(y0 + 1, 0, h - 1) * w
                        + jnp.clip(x0 + 1, 0, w - 1)) * 0.5)
        big = jnp.float32(1 << 30)
        mn = jnp.min(jnp.where(valid, lo, big), axis=(1, 3)).astype(jnp.int32)
        mx = jnp.max(jnp.where(valid, hi, -1.0), axis=(1, 3)).astype(jnp.int32)
        # 8-aligned span base (forward-proj style), count in s_l units —
        # windows hug the span instead of snapping to s_l-tile boundaries,
        # so levels need only ~s_l of padding (tile-aligned starts would
        # force round_up(n2, s_l) + s_l, ~20% more value staging at the
        # per-level window sizes)
        base = (mn // 8) * 8
        sts.append(jnp.where(mx >= 0, base, 0))
        cts.append(jnp.where(mx >= 0, (mx - base) // s_l + 1, 0))
    st = jnp.stack(sts, axis=-1)                       # (BMG, nqt, L)
    ct = jnp.stack(cts, axis=-1)
    return jnp.stack([st, ct], axis=-1).astype(jnp.int32)


def _level_entries_bwd(lx, ly, at, h: int, w: int):
    """Tap generation for the backward: `_level_entries` plus the primitive
    bilinear factors the in-kernel chain rule needs.

    Returns (entries, parts): entries = [(idx_e, wt_e, idx_o, wt_o)] for
    top/bottom rows (for the grad_value W tiles), parts = (dx, dy, even_t,
    even_b, ml_t, mr_t, ml_b, mr_b) — all (P, Qt) f32 (masks as 0/1)."""
    hf, wf = float(h), float(w)
    x = lx * wf - 0.5
    y = ly * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    vx0 = (x0 >= 0) & (x0 <= wf - 1)
    vx1 = (x0 >= -1) & (x0 <= wf - 2)
    entries, evens, mls, mrs = [], [], [], []
    for y_row, wy in ((y0, (1 - dy)), (y0 + 1, dy)):
        vy = (y_row >= 0) & (y_row <= hf - 1)
        ml = jnp.where(vy & vx0, one, zero)
        mr = jnp.where(vy & vx1, one, zero)
        wl = wy * (1 - dx) * at * ml
        wr = wy * dx * at * mr
        base = y_row * wf + x0
        m_l = jnp.floor(base * 0.5)
        m_r = jnp.floor((base + 1) * 0.5)
        even = (base - 2.0 * m_l) == 0
        entries.append((jnp.where(even, m_l, m_r), jnp.where(even, wl, wr),
                        jnp.where(even, m_r, m_l), jnp.where(even, wr, wl)))
        evens.append(even)
        mls.append(ml)
        mrs.append(mr)
    parts = (dx, dy, evens[0], evens[1], mls[0], mrs[0], mls[1], mrs[1])
    return entries, parts


def _bwd_window(ve_ref, vo_ref, gve_ref, gvo_ref, entries, base, cols,
                s_l: int, P: int, g, acc_dtype):
    """One window's backward work: grad_value tile += Wᵀ @ g (deterministic,
    scatter-free) and the 4 parity-routed per-entry upstream row sums
    G_class[p] = Σ_s [idx_p == s] · (v_class[s] · g) — returns them as
    (e_rows, o_rows) tuples of (1, Qt) for the top and bottom tap rows."""
    f32 = jnp.float32
    vte = ve_ref[0, pl.ds(base, s_l), :]
    vto = vo_ref[0, pl.ds(base, s_l), :]
    we = _entry_tree(entries, cols, P, 0)
    wo = _entry_tree(entries, cols, P, 1)
    gve_ref[0, pl.ds(base, s_l), :] += jax.lax.dot(
        we.astype(acc_dtype), g.astype(acc_dtype),
        preferred_element_type=jnp.float32).astype(gve_ref.dtype)
    gvo_ref[0, pl.ds(base, s_l), :] += jax.lax.dot(
        wo.astype(acc_dtype), g.astype(acc_dtype),
        preferred_element_type=jnp.float32).astype(gvo_ref.dtype)
    G_e = jax.lax.dot_general(
        vte.astype(acc_dtype), g.astype(acc_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (s_l, Qt)
    G_o = jax.lax.dot_general(
        vto.astype(acc_dtype), g.astype(acc_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sums = []
    for (ide, _, ido, _) in entries:
        sums.append((
            tuple(jnp.sum(jnp.where(ide[p:p + 1, :] == cols, G_e, 0.0),
                          axis=0, keepdims=True) for p in range(P)),
            tuple(jnp.sum(jnp.where(ido[p:p + 1, :] == cols, G_o, 0.0),
                          axis=0, keepdims=True) for p in range(P))))
    return sums


def _bwd_chain(parts, at, sums, h: int, w: int):
    """Bilinear chain rule from the per-entry G row sums (LINEAR in the
    sums, so tail windows can apply it to their own sums and add):
        gat = Σ rows  wy · ((1−dx)·m_l·g_l + dx·m_r·g_r)
        glx = at · Σ rows wy · (m_r·g_r − m_l·g_l) · w
        gly = at · ((…bottom…) − (…top…)) · h
    (masks m zero dead taps exactly like the `_taps_rows` XLA chain rule
    did via its validity factors)."""
    dx, dy, even_t, even_b, ml_t, mr_t, ml_b, mr_b = parts
    (e_t, o_t), (e_b, o_b) = sums
    ge_t = jnp.concatenate(e_t, axis=0)
    go_t = jnp.concatenate(o_t, axis=0)
    ge_b = jnp.concatenate(e_b, axis=0)
    go_b = jnp.concatenate(o_b, axis=0)
    # undo the parity routing: per row, left/right tap upstream grads
    gl_t = jnp.where(even_t, ge_t, go_t) * ml_t
    gr_t = jnp.where(even_t, go_t, ge_t) * mr_t
    gl_b = jnp.where(even_b, ge_b, go_b) * ml_b
    gr_b = jnp.where(even_b, go_b, ge_b) * mr_b
    top = (1 - dx) * gl_t + dx * gr_t
    bot = (1 - dx) * gl_b + dx * gr_b
    gat_lvl = (1 - dy) * top + dy * bot
    glx_lvl = at * ((1 - dy) * (gr_t - gl_t)
                    + dy * (gr_b - gl_b)) * np.float32(w)
    gly_lvl = at * (bot - top) * np.float32(h)
    return glx_lvl, gly_lvl, gat_lvl


def _add_sums(a, b):
    return [(tuple(x + y for x, y in zip(ae, be)),
             tuple(x + y for x, y in zip(ao, bo)))
            for (ae, ao), (be, bo) in zip(a, b)]


def _zero_sums(P: int, Qt: int):
    zg = (jnp.zeros((1, Qt), jnp.float32),) * P
    return [(zg, zg), (zg, zg)]


def _bwd_kernel_rows(ranges_ref, ve_ref, vo_ref, lx_ref, ly_ref, at_ref,
                     g_ref, gve_ref, gvo_ref, glx_ref, gly_ref, gat_ref,
                     *, spatial_shapes, level_starts, s_tiles, P: int,
                     acc_dtype, groups: int = 1):
    """Region-free backward for one (b·m·g, q-tile), mirroring the forward
    proj kernels' r4 design (each per-level `fori_loop` region costs ~600
    cycles even untaken): ONE straight-line window per level of a per-level
    static size, plus a single per-program `pl.when` overflow tail. The
    chain rule (`_bwd_chain`) is linear in the per-entry G sums, so the
    tail applies it to its own windows' sums and adds the correction into
    the row-grad outputs; grad_value tiles accumulate per window either
    way. Levels with no valid taps (count 0) run their window at tile 0:
    the W weights carry the validity masks (zero ⇒ grad_value += 0) and
    the chain rule's m_l/m_r factors zero any junk G sums — identical
    results to the skipped-loop form."""
    Qt = g_ref.shape[1]
    f32 = jnp.float32
    iotas = {s: jax.lax.broadcasted_iota(jnp.int32, (s, Qt), 0).astype(f32)
             for s in sorted(set(s_tiles))}
    g = g_ref[0].astype(f32)                              # (Qt, D)

    bm_i = pl.program_id(0)
    qt_i = pl.program_id(1)

    @pl.when((qt_i == 0) & (bm_i % groups == 0))
    def _():
        gve_ref[0] = jnp.zeros_like(gve_ref[0])
        gvo_ref[0] = jnp.zeros_like(gvo_ref[0])

    def lvl_rows(lvl):
        h, w = spatial_shapes[lvl]
        lx = lx_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        ly = ly_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        at = at_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        entries, parts = _level_entries_bwd(lx, ly, at, h, w)
        return entries, parts, at

    # Per-level (P, Qt) row grads are collected and stored as ONE aligned
    # full-block write after the loop: P=4-row stores at 4-row offsets are
    # not sublane-tile aligned and Mosaic may reject them (reads of the same
    # slices are relayout-handled; stores are stricter).
    glx_rows, gly_rows, gat_rows = [], [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        s_l = s_tiles[lvl]
        entries, parts, at = lvl_rows(lvl)
        start_t = ranges_ref[0, 0, lvl, 0]
        s0 = pl.multiple_of(start_t, 8)
        cols = iotas[s_l] + s0.astype(f32)
        sums = _bwd_window(ve_ref, vo_ref, gve_ref, gvo_ref, entries,
                           level_starts[lvl] + s0, cols, s_l, P, g,
                           acc_dtype)
        glx_lvl, gly_lvl, gat_lvl = _bwd_chain(parts, at, sums, h, w)
        glx_rows.append(glx_lvl)
        gly_rows.append(gly_lvl)
        gat_rows.append(gat_lvl)

    glx_ref[0, 0] = jnp.concatenate(glx_rows, axis=0)
    gly_ref[0, 0] = jnp.concatenate(gly_rows, axis=0)
    gat_ref[0, 0] = jnp.concatenate(gat_rows, axis=0)

    # Overflow tail: windows 1..count-1 for levels whose window does not
    # already cover the whole packed level (see the forward kernels).
    live = [lvl for lvl, (h, w) in enumerate(spatial_shapes)
            if s_tiles[lvl] < -(-h * w // 2)]
    if not live:
        return
    overflow = ranges_ref[0, 0, live[0], 1]
    for lvl in live[1:]:
        overflow = jnp.maximum(overflow, ranges_ref[0, 0, lvl, 1])

    @pl.when(overflow > 1)
    def _tail():
        cx_rows = []
        cy_rows = []
        ca_rows = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            if lvl not in live:
                z = jnp.zeros((P, Qt), f32)
                cx_rows.append(z)
                cy_rows.append(z)
                ca_rows.append(z)
                continue
            s_l = s_tiles[lvl]
            entries, parts, at = lvl_rows(lvl)
            start_t = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]
            rows0 = iotas[s_l]

            def body(t, carry, lvl=lvl, s_l=s_l, entries=entries,
                     start_t=start_t, rows0=rows0):
                s0 = pl.multiple_of(start_t + t * s_l, 8)
                cols = rows0 + s0.astype(f32)
                sums = _bwd_window(ve_ref, vo_ref, gve_ref, gvo_ref,
                                   entries, level_starts[lvl] + s0, cols,
                                   s_l, P, g, acc_dtype)
                return _add_sums(carry, sums)

            tail_sums = jax.lax.fori_loop(1, num_t, body,
                                          _zero_sums(P, Qt))
            cx_l, cy_l, ca_l = _bwd_chain(parts, at, tail_sums, h, w)
            cx_rows.append(cx_l)
            cy_rows.append(cy_l)
            ca_rows.append(ca_l)
        glx_ref[0, 0] += jnp.concatenate(cx_rows, axis=0)
        gly_ref[0, 0] += jnp.concatenate(cy_rows, axis=0)
        gat_ref[0, 0] += jnp.concatenate(ca_rows, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9))
def _bwd_call_rows(spatial_shapes: Shapes, value_e, value_o, lx, ly, at,
                   g_bm, q_tile: int, s_tiles, groups: int = 1):
    """lx/ly/at: (B·M·G, L·P, q_pad) f32 raw rows (forward operands);
    g_bm: (B·M·G, q_pad, D). `s_tiles`: per-level static window sizes (the
    value must be packed with the same tuple). Returns
    (gve, gvo, glx, gly, gat)."""
    BM, S_pad, D = value_e.shape
    BMG, LP, q_pad = lx.shape
    L = len(spatial_shapes)
    P = LP // L
    s_tiles = _as_level_tiles(spatial_shapes, s_tiles)
    ranges = _row_ranges_bwd(lx, ly, spatial_shapes, q_tile, s_tiles, P)
    lx, ly, at = (_tile_q(a, q_tile) for a in (lx, ly, at))
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tiles,
                                           tight=True)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    ranges_spec = pl.BlockSpec((1, 1, L, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)
    value_spec = pl.BlockSpec((1, S_pad, D),
                              lambda bm, qt: (bm // groups, 0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, LP, q_tile),
                            lambda bm, qt: (bm, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                          memory_space=pltpu.VMEM)
    gval_spec = pl.BlockSpec((1, S_pad, D),
                             lambda bm, qt: (bm // groups, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel_rows,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts, s_tiles=s_tiles,
                               P=P, acc_dtype=acc_dtype, groups=groups)
    nqt = q_pad // q_tile
    gve, gvo, glx, gly, gat = pl.pallas_call(
        kernel,
        grid=(BMG, nqt),
        in_specs=[ranges_spec, value_spec, value_spec,
                  row_spec, row_spec, row_spec, g_spec],
        out_specs=(gval_spec, gval_spec, row_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BM, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BM, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BMG, nqt, LP, q_tile), jnp.float32),
            jax.ShapeDtypeStruct((BMG, nqt, LP, q_tile), jnp.float32),
            jax.ShapeDtypeStruct((BMG, nqt, LP, q_tile), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_e, value_o, lx, ly, at, g_bm)

    def _untile(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BMG, LP, q_pad)
    return gve, gvo, _untile(glx), _untile(gly), _untile(gat)


def _bwd_kernel_rows_temporal(ranges_ref, *refs, spatial_shapes,
                              level_starts, s_tiles, P: int, acc_dtype,
                              F: int):
    """`_bwd_kernel_rows` (region-free form) with F per-frame value operand
    pairs (index-mapped like `_fwd_kernel_temporal`): global level lvl reads
    value slot lvl // L at local level lvl % L and accumulates grad_value
    into that slot's OWN per-program output block (slots are folded onto
    frames by the caller — output blocks are never shared across programs,
    so no revisit hazard)."""
    ve_refs = refs[:F]
    vo_refs = refs[F:2 * F]
    lx_ref, ly_ref, at_ref, g_ref = refs[2 * F:2 * F + 4]
    gve_refs = refs[2 * F + 4:3 * F + 4]
    gvo_refs = refs[3 * F + 4:4 * F + 4]
    glx_ref, gly_ref, gat_ref = refs[4 * F + 4:4 * F + 7]
    L = len(spatial_shapes)
    Qt = g_ref.shape[1]
    f32 = jnp.float32
    iotas = {s: jax.lax.broadcasted_iota(jnp.int32, (s, Qt), 0).astype(f32)
             for s in sorted(set(s_tiles))}
    g = g_ref[0].astype(f32)                              # (Qt, D)

    qt_i = pl.program_id(1)

    @pl.when(qt_i == 0)
    def _():
        for j in range(F):
            gve_refs[j][0] = jnp.zeros_like(gve_refs[j][0])
            gvo_refs[j][0] = jnp.zeros_like(gvo_refs[j][0])

    def lvl_rows(lvl):
        h, w = spatial_shapes[lvl % L]
        lx = lx_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        ly = ly_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        at = at_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        entries, parts = _level_entries_bwd(lx, ly, at, h, w)
        return entries, parts, at

    # Collected per level, stored as one aligned full-block write (see
    # `_bwd_kernel_rows`: 4-row-offset stores are not sublane-tile aligned).
    glx_rows, gly_rows, gat_rows = [], [], []
    for lvl in range(F * L):
        ll = lvl % L
        h, w = spatial_shapes[ll]
        s_l = s_tiles[ll]
        entries, parts, at = lvl_rows(lvl)
        start_t = ranges_ref[0, 0, lvl, 0]
        s0 = pl.multiple_of(start_t, 8)
        cols = iotas[s_l] + s0.astype(f32)
        sums = _bwd_window(ve_refs[lvl // L], vo_refs[lvl // L],
                           gve_refs[lvl // L], gvo_refs[lvl // L], entries,
                           level_starts[ll] + s0, cols, s_l, P, g,
                           acc_dtype)
        glx_lvl, gly_lvl, gat_lvl = _bwd_chain(parts, at, sums, h, w)
        glx_rows.append(glx_lvl)
        gly_rows.append(gly_lvl)
        gat_rows.append(gat_lvl)

    glx_ref[0, 0] = jnp.concatenate(glx_rows, axis=0)
    gly_ref[0, 0] = jnp.concatenate(gly_rows, axis=0)
    gat_ref[0, 0] = jnp.concatenate(gat_rows, axis=0)

    live = [lvl for lvl in range(F * L)
            if s_tiles[lvl % L]
            < -(-spatial_shapes[lvl % L][0] * spatial_shapes[lvl % L][1]
                // 2)]
    if not live:
        return
    overflow = ranges_ref[0, 0, live[0], 1]
    for lvl in live[1:]:
        overflow = jnp.maximum(overflow, ranges_ref[0, 0, lvl, 1])

    @pl.when(overflow > 1)
    def _tail():
        cx_rows = []
        cy_rows = []
        ca_rows = []
        for lvl in range(F * L):
            if lvl not in live:
                z = jnp.zeros((P, Qt), f32)
                cx_rows.append(z)
                cy_rows.append(z)
                ca_rows.append(z)
                continue
            ll = lvl % L
            h, w = spatial_shapes[ll]
            s_l = s_tiles[ll]
            entries, parts, at = lvl_rows(lvl)
            start_t = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]
            rows0 = iotas[s_l]

            def body(t, carry, ll=ll, s_l=s_l, entries=entries,
                     start_t=start_t, rows0=rows0,
                     ve_ref=ve_refs[lvl // L], vo_ref=vo_refs[lvl // L],
                     gve_ref=gve_refs[lvl // L],
                     gvo_ref=gvo_refs[lvl // L]):
                s0 = pl.multiple_of(start_t + t * s_l, 8)
                cols = rows0 + s0.astype(f32)
                sums = _bwd_window(ve_ref, vo_ref, gve_ref, gvo_ref,
                                   entries, level_starts[ll] + s0, cols,
                                   s_l, P, g, acc_dtype)
                return _add_sums(carry, sums)

            tail_sums = jax.lax.fori_loop(1, num_t, body,
                                          _zero_sums(P, Qt))
            cx_l, cy_l, ca_l = _bwd_chain(parts, at, tail_sums, h, w)
            cx_rows.append(cx_l)
            cy_rows.append(cy_l)
            ca_rows.append(ca_l)
        glx_ref[0, 0] += jnp.concatenate(cx_rows, axis=0)
        gly_ref[0, 0] += jnp.concatenate(cy_rows, axis=0)
        gat_ref[0, 0] += jnp.concatenate(ca_rows, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10))
def _bwd_call_rows_temporal(spatial_shapes: Shapes, value_e, value_o, lx, ly,
                            at, g_bm, q_tile: int, s_tiles, T: int,
                            rule):
    """Temporal rows backward over per-frame packed values: value_e/value_o
    (T·M, S_pad, D) read via the forward's closed-form frame index maps (no
    F×-stacked value materialization), rows (T·M, Lf·P, q_pad) f32.
    `s_tiles`: per-level static windows (value packed with the same tuple).
    Returns (gve_0..gve_{F-1}, gvo_0..gvo_{F-1}, glx, gly, gat) — per-SLOT
    value grads in the program's own frame order; the caller folds slots
    onto frames with the rule's frame table."""
    TM, S_pad, D = value_e.shape
    M = TM // T
    F = 1 + _rule_window(rule, T)
    LP, q_pad = lx.shape[1], lx.shape[2]
    fused_shapes = _temporal_fused_shapes(spatial_shapes, F)
    P = LP // len(fused_shapes)
    Lf = F * len(spatial_shapes)
    s_tiles = _as_level_tiles(spatial_shapes, s_tiles)
    ranges = _row_ranges_bwd(lx, ly, fused_shapes, q_tile, s_tiles * F, P)
    lx, ly, at = (_tile_q(a, q_tile) for a in (lx, ly, at))
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tiles,
                                           tight=True)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    ranges_spec = pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)

    def _value_spec(j):
        if j == 0:
            return pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm, 0, 0),
                                memory_space=pltpu.VMEM)

        def index_map(bm, qt, j=j - 1):
            t = bm // M
            f = _temporal_frame_expr(rule, j, t, T)
            return (f * M + bm % M, 0, 0)
        return pl.BlockSpec((1, S_pad, D), index_map,
                            memory_space=pltpu.VMEM)

    row_spec = pl.BlockSpec((1, 1, LP, q_tile),
                            lambda bm, qt: (bm, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                          memory_space=pltpu.VMEM)
    gval_spec = pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel_rows_temporal,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts, s_tiles=s_tiles,
                               P=P, acc_dtype=acc_dtype, F=F)
    specs = [_value_spec(j) for j in range(F)]
    nqt = q_pad // q_tile
    gval_shape = jax.ShapeDtypeStruct((TM, S_pad, D), jnp.float32)
    row_shape = jax.ShapeDtypeStruct((TM, nqt, LP, q_tile), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ranges_spec] + specs + specs
        + [row_spec, row_spec, row_spec, g_spec],
        out_specs=tuple([gval_spec] * (2 * F)
                        + [row_spec, row_spec, row_spec]),
        out_shape=tuple([gval_shape] * (2 * F) + [row_shape] * 3),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, *([value_e] * F), *([value_o] * F), lx, ly, at, g_bm)

    def _untile(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(TM, LP, q_pad)
    return tuple(outs[:2 * F]) + tuple(_untile(x) for x in outs[2 * F:])


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

Q_TILE = 256
S_TILE = 128          # PACKED rows per tile — covers 256 raster rows


def _pack_levels(value_bm, spatial_shapes: Shapes, s_tile,
                 tight: bool = False):
    """(B·M, S, D) → (V_even, V_odd), each (B·M, S_pad, D): every level split
    by raster parity (V_even[m] = V[2m], V_odd[m] = V[2m+1]) and padded to an
    s_tile multiple in packed space. `s_tile` may be one int or a per-level
    tuple (projection-fused path); `tight` must match
    `_padded_level_starts`."""
    tiles = _as_level_tiles(spatial_shapes, s_tile)
    starts = _level_starts(spatial_shapes)
    BM, _, D = value_bm.shape
    evens, odds = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        n2 = -(-n // 2)
        s = tiles[lvl]
        seg = jax.lax.slice_in_dim(value_bm, starts[lvl], starts[lvl] + n,
                                   axis=1)
        target = _round_up(n2 + s, 32) if tight else _round_up(n2, s) + s
        pad_rows = target * 2 - n
        seg = jnp.pad(seg, ((0, 0), (0, pad_rows), (0, 0)))
        seg = seg.reshape(BM, -1, 2, D)
        evens.append(seg[:, :, 0])
        odds.append(seg[:, :, 1])
    return jnp.concatenate(evens, axis=1), jnp.concatenate(odds, axis=1)


def _unpack_levels(packed_e, packed_o, spatial_shapes: Shapes, s_tile,
                   tight: bool = False):
    """Inverse of `_pack_levels`: interleave parity classes back into raster
    order along axis 1."""
    pstarts, _ = _padded_level_starts(spatial_shapes, s_tile, tight)
    BM, _, D = packed_e.shape
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        n2 = -(-n // 2)
        e = jax.lax.slice_in_dim(packed_e, pstarts[lvl], pstarts[lvl] + n2,
                                 axis=1)
        o = jax.lax.slice_in_dim(packed_o, pstarts[lvl], pstarts[lvl] + n2,
                                 axis=1)
        inter = jnp.stack([e, o], axis=2).reshape(BM, 2 * n2, D)
        parts.append(inter[:, :n])
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
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tile)
    return value_e, value_o, idx, wt, ranges, L, K, q_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes: Shapes, sampling_locations,
                          attention_weights, q_tile: int = 0):
    """Pallas forward; same contract as `ms_deform_attn` (xla backend).
    q_tile=0 → the default Q_TILE; callers with very large query counts per
    batch item (deformable conv) pass a bigger tile to cut grid steps."""
    out, _ = _fwd_res(value, spatial_shapes, sampling_locations,
                      attention_weights, q_tile or None)
    return out


def _fwd_res(value, spatial_shapes, loc, att, q_tile=None):
    # Small query counts (decoder: 60/frame) waste lanes on a 256 q-tile;
    # round down to one 128-query tile when everything fits.
    q_tile = q_tile or (128 if loc.shape[1] <= 128 else Q_TILE)
    B, S, M, D = value.shape
    _, Q, MG, L, P, _ = loc.shape
    groups = MG // M
    q_pad = _round_up(Q, q_tile)
    # Raw location/attention rows in kernel layout — taps are generated
    # in-kernel (8/3 less operand traffic than pre-expanded idx/wt).
    locf = loc.astype(jnp.float32)
    lx = jnp.transpose(locf[..., 0], (0, 2, 3, 4, 1)).reshape(B * MG, L * P, Q)
    ly = jnp.transpose(locf[..., 1], (0, 2, 3, 4, 1)).reshape(B * MG, L * P, Q)
    at = jnp.transpose(att.astype(jnp.float32),
                       (0, 2, 3, 4, 1)).reshape(B * MG, L * P, Q)
    if q_pad != Q:
        qp = ((0, 0), (0, 0), (0, q_pad - Q))
        lx = jnp.pad(lx, qp, constant_values=-10.0)   # OOB → all weights 0
        ly = jnp.pad(ly, qp, constant_values=-10.0)
        at = jnp.pad(at, qp)
    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    ranges = _row_ranges(lx, ly, spatial_shapes, q_tile, s_tiles, P)
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles,
                                    tight=True)
    out_bm = _fwd_call_fused(spatial_shapes, value_e, value_o, lx, ly, at,
                             ranges, q_tile, s_tiles, groups)
    out = out_bm.reshape(B, MG, D, q_pad)[..., :Q]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(B, Q, MG * D)
    return out.astype(value.dtype), (value, loc, att)


def _fwd_fwd(value, spatial_shapes, loc, att, q_tile: int = 0):
    return _fwd_res(value, spatial_shapes, loc, att, q_tile or None)


def _fwd_bwd(spatial_shapes, q_tile, res, g):
    value, loc, att = res
    q_tile = q_tile or (128 if loc.shape[1] <= 128 else Q_TILE)
    B, S, M, D = value.shape
    Q = loc.shape[1]
    MG = loc.shape[2]
    groups = MG // M
    value_e, value_o, idx, wt, ranges, L, K, q_pad = _prep(
        value, spatial_shapes, loc, att, q_tile, S_TILE)
    g_bm = jnp.transpose(g.reshape(B, Q, MG, D), (0, 2, 1, 3)) \
        .reshape(B * MG, Q, D)
    g_bm = jnp.pad(g_bm, ((0, 0), (0, q_pad - Q), (0, 0))) \
        .astype(value_e.dtype)
    gve, gvo, gwt = _bwd_call(spatial_shapes, value_e, value_o, idx, wt,
                              ranges, g_bm, q_tile, S_TILE, groups)
    gval = _unpack_levels(gve, gvo, spatial_shapes, S_TILE)
    gval = gval.reshape(B, M, S, D).transpose(0, 2, 1, 3)
    # back to (B, MG, Q, L, K), then chain rule through the tap builder
    gwt = gwt.reshape(B, MG, L, K, q_pad)[..., :Q].transpose(0, 1, 4, 2, 3)
    _, vjp = jax.vjp(lambda l, a: _taps(spatial_shapes, l, a)[1], loc, att)
    gloc, gatt = vjp(gwt)
    return gval.astype(value.dtype), gloc.astype(loc.dtype), \
        gatt.astype(att.dtype)


ms_deform_attn_pallas.defvjp(_fwd_fwd, _fwd_bwd)


# ---------------------------------------------------------------------------
# Rows-form op: sampling locations already in kernel layout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def ms_deform_attn_rows(value, spatial_shapes: Shapes, lx, ly, at,
                        n_queries: int, q_tile: int = 0):
    """Rows-form multi-scale deformable attention.

    value: (B, S, M, D); lx/ly/at: (B·M·G, L·P, q_pad) sampling-location /
    attention rows in kernel layout (queries on lanes, padded queries must
    carry an out-of-range location and zero attention). Returns
    (B, n_queries, M·G·D). Same semantics as `ms_deform_attn_pallas` with the
    q-major transposes lifted to the caller — attention modules that build
    their projections in transposed layout skip the per-call loc/att
    materialization entirely."""
    out, _ = _rows_fwd(value, spatial_shapes, lx, ly, at, n_queries, q_tile)
    return out


def _rows_fwd(value, spatial_shapes, lx, ly, at, n_queries, q_tile):
    B, S, M, D = value.shape
    BMG, LP, q_pad = lx.shape
    MG = BMG // B
    groups = MG // M
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    assert q_pad % q_tile == 0, (q_pad, q_tile)
    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    ranges = _row_ranges(lx.astype(jnp.float32), ly.astype(jnp.float32),
                         spatial_shapes, q_tile, s_tiles,
                         LP // len(spatial_shapes))
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles,
                                    tight=True)
    out_bm = _fwd_call_fused(spatial_shapes, value_e, value_o,
                             lx.astype(jnp.float32), ly.astype(jnp.float32),
                             at.astype(jnp.float32), ranges, q_tile, s_tiles,
                             groups)
    out = out_bm.reshape(B, MG, D, q_pad)[..., :n_queries]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(B, n_queries, MG * D)
    return out.astype(value.dtype), (value, lx, ly, at)


def _rows_fwd_fwd(value, spatial_shapes, lx, ly, at, n_queries, q_tile=0):
    return _rows_fwd(value, spatial_shapes, lx, ly, at, n_queries, q_tile)


def _rows_bwd_core(spatial_shapes, n_queries, q_tile, value, lx, ly, at, g):
    """Shared single-frame rows backward: in-kernel taps + in-kernel bilinear
    chain rule (`_bwd_call_rows`) — consumes the same raw f32 rows as the
    forward, no materialized idx/wt operands and no XLA `_taps_rows` VJP."""
    B, S, M, D = value.shape
    BMG, LP, q_pad = lx.shape
    MG = BMG // B
    groups = MG // M
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    # per-level static windows (the region-free backward's straight-line
    # window sizes — same sizing rule as the forward proj kernels)
    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles,
                                    tight=True)
    g_bm = jnp.transpose(g.reshape(B, n_queries, MG, D), (0, 2, 1, 3)) \
        .reshape(BMG, n_queries, D)
    g_bm = jnp.pad(g_bm, ((0, 0), (0, q_pad - n_queries), (0, 0))) \
        .astype(value_e.dtype)
    gve, gvo, glx, gly, gat = _bwd_call_rows(
        spatial_shapes, value_e, value_o, lx.astype(jnp.float32),
        ly.astype(jnp.float32), at.astype(jnp.float32), g_bm, q_tile,
        s_tiles, groups)
    gval = _unpack_levels(gve, gvo, spatial_shapes, s_tiles,
                          tight=True)
    gval = gval.reshape(B, M, S, D).transpose(0, 2, 1, 3)
    return gval, glx, gly, gat


def _rows_fwd_bwd(spatial_shapes, n_queries, q_tile, res, g):
    value, lx, ly, at = res
    gval, glx, gly, gat = _rows_bwd_core(spatial_shapes, n_queries, q_tile,
                                         value, lx, ly, at, g)
    return (gval.astype(value.dtype), glx.astype(lx.dtype),
            gly.astype(ly.dtype), gat.astype(at.dtype))


ms_deform_attn_rows.defvjp(_rows_fwd_fwd, _rows_fwd_bwd)


# ---------------------------------------------------------------------------
# Temporal multi-operand op: per-frame packed values, no stacked replication
# ---------------------------------------------------------------------------
#
# The DeVIS temporal attention samples, for query frame t, the current frame's
# L levels plus the SAME L levels of W other frames. Materializing that as a
# stacked (T, (1+W)·S) value (reference devis_transformer.py's
# `value[temporal_frames].flatten(0,1)`) replicates every frame ~W times and
# re-packs the replicas per layer — measured ~20 ms/clip of pure HBM traffic.
# Here the kernel instead receives the per-frame packed value ONCE and maps
# each grid row's (1+W) value blocks onto it with closed-form frame index
# maps, so the replication never exists in memory:
#   * connect-all  (rule ("all",)): j-th temporal frame of t = j + (j >= t)
#   * sliding window (rule ("window", offsets)): t+o with edge reflection
# (reference devis_transformer.py:96-112 — both connectivities).


def _temporal_frame_expr(rule, j, t, T: int):
    """Traced scalar: absolute source frame of temporal slot j for frame t."""
    if rule[0] == "all":
        return j + jnp.where(t <= j, 1, 0)
    o = rule[1][j]
    cand = t + o
    return jnp.where((cand < 0) | (cand > T - 1), t - o, cand)


def temporal_frame_rule(n_frames: int, t_window: int, connect_all: bool):
    """Static frame rule matching `_temporal_frame_index` in models/attention."""
    if connect_all:
        return ("all",)
    rel = tuple(o for o in range(-t_window // 2, t_window // 2 + 1) if o != 0)
    return ("window", rel)


def _rule_window(rule, T: int) -> int:
    return (T - 1) if rule[0] == "all" else len(rule[1])


def _fwd_kernel_temporal(ranges_ref, *refs, spatial_shapes, level_starts,
                         s_tile: int, P: int, acc_dtype, F: int):
    """`_fwd_kernel_fused` with F per-frame value operand pairs: global level
    lvl maps to value operand lvl // L at local level lvl % L."""
    ve_refs = refs[:F]
    vo_refs = refs[F:2 * F]
    lx_ref, ly_ref, at_ref, out_ref, we_ref, wo_ref = refs[2 * F:]
    L = len(spatial_shapes)
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    rows0 = jax.lax.broadcasted_iota(
        jnp.int32, (s_tile, Qt), 0).astype(jnp.float32)
    acc_e = jnp.zeros((D, Qt), jnp.float32)
    acc_o = jnp.zeros((D, Qt), jnp.float32)

    for lvl in range(F * L):
        ll = lvl % L
        h, w = spatial_shapes[ll]
        ve_ref = ve_refs[lvl // L]
        vo_ref = vo_refs[lvl // L]
        lx = lx_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        ly = ly_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        at = at_ref[0, 0, lvl * P:(lvl + 1) * P, :]
        entries = _level_entries(lx, ly, at, h, w)
        base_w = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        def body(t, accs, ll=ll, entries=entries, base_w=base_w,
                 ve_ref=ve_ref, vo_ref=vo_ref):
            acc_e, acc_o = accs
            s0 = pl.multiple_of(base_w + t * s_tile, 8)
            vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            cols = rows0 + s0.astype(jnp.float32)
            we_ref[:] = jnp.zeros_like(we_ref)
            wo_ref[:] = jnp.zeros_like(wo_ref)
            zero = jnp.zeros((), we_ref.dtype)
            for ide, wte, ido, wto in entries:
                for p in range(P):
                    we_ref[:] += jnp.where(ide[p:p + 1, :] == cols,
                                           wte[p:p + 1, :], zero)
                    wo_ref[:] += jnp.where(ido[p:p + 1, :] == cols,
                                           wto[p:p + 1, :], zero)
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we_ref[:].astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo_ref[:].astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_e, acc_o

        acc_e, acc_o = jax.lax.fori_loop(0, num_t, body, (acc_e, acc_o))
    out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10))
def _fwd_call_temporal(spatial_shapes: Shapes, value_e, value_o, lx, ly, at,
                       ranges, q_tile: int, s_tile: int, T: int, rule):
    """value_e/value_o: (T·M, S_pad, D) per-frame parity-packed;
    lx/ly/at: (T·M, Lf·P, q_pad) rows over the fused (current + temporal)
    level stack, Lf = (1+W)·L."""
    TM, S_pad, D = value_e.shape
    M = TM // T
    W = _rule_window(rule, T)
    F = 1 + W
    LP, q_pad = lx.shape[1], lx.shape[2]
    Lf = ranges.shape[2]
    L = len(spatial_shapes)
    assert Lf == F * L, (Lf, F, L)
    P = LP // Lf
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tile)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    ranges_spec = pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)

    def _value_spec(j):
        if j == 0:
            return pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm, 0, 0),
                                memory_space=pltpu.VMEM)

        def index_map(bm, qt, j=j - 1):
            t = bm // M
            f = _temporal_frame_expr(rule, j, t, T)
            return (f * M + bm % M, 0, 0)
        return pl.BlockSpec((1, S_pad, D), index_map,
                            memory_space=pltpu.VMEM)

    lx, ly, at = (_tile_q(a, q_tile) for a in (lx, ly, at))
    row_spec = pl.BlockSpec((1, 1, LP, q_tile),
                            lambda bm, qt: (bm, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_temporal,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts,
                               s_tile=s_tile, P=P, acc_dtype=acc_dtype, F=F)
    specs = [_value_spec(j) for j in range(F)]
    nqt = q_pad // q_tile
    out = pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ranges_spec] + specs + specs
        + [row_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, 1, D, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, D, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((s_tile, q_tile), jnp.float32),
                        pltpu.VMEM((s_tile, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, *([value_e] * F), *([value_o] * F), lx, ly, at)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(TM, D, q_pad)


def _temporal_frame_table(rule, T: int) -> np.ndarray:
    """Concrete (T, W) frame-index table for the rule (backward pass)."""
    W = _rule_window(rule, T)
    rows = []
    for t in range(T):
        if rule[0] == "all":
            rows.append([f for f in range(T) if f != t])
        else:
            rows.append([t - o if (t + o < 0 or t + o > T - 1) else t + o
                         for o in rule[1]])
    return np.asarray(rows, np.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def ms_deform_attn_rows_temporal(value, spatial_shapes: Shapes, lx, ly, at,
                                 n_queries: int, rule=("all",),
                                 q_tile: int = 0):
    """Temporal rows-form attention over per-frame values.

    value: (T, S, M, D) — ONE copy per frame (not the stacked replication);
    lx/ly/at: (T·M, Lf·P, q_pad) rows over the fused level stack in
    frame-major order: [current frame's L levels] + [W temporal frames × L].
    Semantically identical to stacking `value[frame_table].flatten()` behind
    the current frame and calling `ms_deform_attn_rows` — minus the ~W×
    value materialization per call."""
    out, _ = _temporal_fwd(value, spatial_shapes, lx, ly, at, n_queries,
                           rule, q_tile)
    return out


def _temporal_fused_shapes(spatial_shapes: Shapes, F: int) -> Shapes:
    return tuple(spatial_shapes) * F


def _temporal_fwd(value, spatial_shapes, lx, ly, at, n_queries, rule, q_tile):
    T, S, M, D = value.shape
    LP, q_pad = lx.shape[1], lx.shape[2]
    F = 1 + _rule_window(rule, T)
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    assert q_pad % q_tile == 0, (q_pad, q_tile)
    fused_shapes = _temporal_fused_shapes(spatial_shapes, F)
    ranges = _row_ranges(lx.astype(jnp.float32), ly.astype(jnp.float32),
                         fused_shapes, q_tile, S_TILE, LP // len(fused_shapes))
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(T * M, S, D)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, S_TILE)
    out_bm = _fwd_call_temporal(tuple(spatial_shapes), value_e, value_o,
                                lx.astype(jnp.float32),
                                ly.astype(jnp.float32),
                                at.astype(jnp.float32), ranges, q_tile,
                                S_TILE, T, rule)
    out = out_bm.reshape(T, M, D, q_pad)[..., :n_queries]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(T, n_queries, M * D)
    return out.astype(value.dtype), (value, lx, ly, at)


def _temporal_fwd_fwd(value, spatial_shapes, lx, ly, at, n_queries,
                      rule=("all",), q_tile=0):
    return _temporal_fwd(value, spatial_shapes, lx, ly, at, n_queries,
                         rule, q_tile)


def _temporal_bwd_core(spatial_shapes, n_queries, rule, q_tile, value,
                       lx, ly, at, g):
    """Shared temporal backward: in-kernel taps + in-kernel bilinear chain
    rule over per-frame packed values (`_bwd_call_rows_temporal`) — no
    F×-stacked value materialization and no idx/wt operands; per-slot value
    grads are folded back onto the frames with a tiny one-hot einsum
    (exact: the op is linear in the value and each slot reads one whole
    frame). Returns (gval, glx, gly, gat)."""
    T, S, M, D = value.shape
    LP, q_pad = lx.shape[1], lx.shape[2]
    F = 1 + _rule_window(rule, T)
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    table = _temporal_frame_table(rule, T)                   # (T, W)
    slots = np.concatenate([np.arange(T)[:, None], table], axis=1)  # (T, F)

    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(T * M, S, D)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles,
                                    tight=True)
    g_bm = jnp.transpose(g.reshape(T, n_queries, M, D), (0, 2, 1, 3)) \
        .reshape(T * M, n_queries, D)
    g_bm = jnp.pad(g_bm, ((0, 0), (0, q_pad - n_queries), (0, 0))) \
        .astype(value_e.dtype)
    outs = _bwd_call_rows_temporal(
        tuple(spatial_shapes), value_e, value_o, lx.astype(jnp.float32),
        ly.astype(jnp.float32), at.astype(jnp.float32), g_bm, q_tile,
        s_tiles, T, rule)
    glx, gly, gat = outs[2 * F:]
    gslot = jnp.stack([
        _unpack_levels(outs[j], outs[F + j], spatial_shapes, s_tiles,
                       tight=True)
        for j in range(F)])                                  # (F, T·M, S, D)
    gslot = gslot.reshape(F, T, M, S, D)
    onehot = jnp.asarray(slots.T[:, :, None] == np.arange(T)[None, None, :],
                         jnp.float32)                        # (F, T, T)
    gval = jnp.einsum("jtf,jtmsd->fsmd", onehot, gslot)
    return gval, glx, gly, gat


def _temporal_fwd_bwd(spatial_shapes, n_queries, rule, q_tile, res, g):
    value, lx, ly, at = res
    gval, glx, gly, gat = _temporal_bwd_core(
        spatial_shapes, n_queries, rule, q_tile, value, lx, ly, at, g)
    return (gval.astype(value.dtype), glx.astype(lx.dtype),
            gly.astype(ly.dtype), gat.astype(at.dtype))


ms_deform_attn_rows_temporal.defvjp(_temporal_fwd_fwd, _temporal_fwd_bwd)


# ---------------------------------------------------------------------------
# Projection-fused temporal op (encoder hot path)
# ---------------------------------------------------------------------------
#
# The encoder's sampling locations are ref + off / (w_l, h_l) with the
# temporal reference pinned to level 0, and the attention weights are a joint
# softmax over the current+temporal logits (reference ms_deform_attn.py
# L112-117, L247-254, L447). Materializing lx/ly/at rows in f32 costs
# ~3×90 MB of HBM per layer; this variant moves the location math and the
# softmax INTO the kernel, consuming the raw (bf16) offset/logit rows that
# fall straight out of transposed Dense projections with zero-copy reshapes.


def _entry_tree(entries, cols, P: int, parity: int):
    """One parity class's (s, Qt) one-hot W tile as an SSA select-tree: 8
    independent broadcast-compare selects combined pairwise — no serialized
    scratch accumulation and, crucially, no control-flow region."""
    sels = []
    for ide, wte, ido, wto in entries:
        i_, w_ = (ide, wte) if parity == 0 else (ido, wto)
        sels += [jnp.where(i_[p:p + 1, :] == cols, w_[p:p + 1, :], 0.0)
                 for p in range(P)]
    while len(sels) > 1:
        nxt = [a + b for a, b in zip(sels[0::2], sels[1::2])]
        if len(sels) % 2:
            nxt.append(sels[-1])
        sels = nxt
    return sels[0]


def _batched_level_entries(spatial_shapes: Shapes, F: int, P: int,
                           rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref,
                           att_c, att_t, Qt: int):
    """Tap generation for ALL F·L levels in one full-tile pass.

    `_level_entries` runs on (P, Qt) = (4, 256) rows — half a sublane group
    — so the 24 per-level passes of the proj kernels waste ≥half the VPU and
    pay their op overheads 24×. This computes the identical math on ONE
    (F·L·P, Qt) tile: per-level constants (w, h, 1/w, 1/h) become broadcast
    columns, which multiply each row by the same scalar value the per-level
    form used — bit-identical results, so the windows from
    `_ranges_proj_kernel` (same arithmetic) still cover every live tap
    exactly.

    Returns [(idx_e, wt_e, idx_o, wt_o)] for top and bottom tap rows, each
    (F·L·P, Qt) f32; level lvl's entries are rows [lvl·P, (lvl+1)·P)."""
    L = len(spatial_shapes)
    W = F - 1
    f32 = jnp.float32

    def cols(vals, rep):
        return jnp.concatenate(
            [jnp.full((P, 1), v, f32) for v in vals] * rep, axis=0)
    w_c = cols([float(w) for _, w in spatial_shapes], 1)      # (L·P, 1)
    h_c = cols([float(h) for h, _ in spatial_shapes], 1)
    iw_c = cols([np.float32(1.0 / w) for _, w in spatial_shapes], 1)
    ih_c = cols([np.float32(1.0 / h) for h, _ in spatial_shapes], 1)
    rx_l = rx_ref[0, 0].astype(f32)                           # (L, Qt)
    ry_l = ry_ref[0, 0].astype(f32)
    rx_rep = jnp.concatenate(
        [jnp.broadcast_to(rx_l[l:l + 1], (P, Qt)) for l in range(L)], 0)
    ry_rep = jnp.concatenate(
        [jnp.broadcast_to(ry_l[l:l + 1], (P, Qt)) for l in range(L)], 0)
    # identical op order to `lvl_entries`: lx = ref + off·(1/w), x = lx·w − ½
    lx = rx_rep + cx_ref[0, 0].astype(f32) * iw_c
    ly = ry_rep + cy_ref[0, 0].astype(f32) * ih_c
    at = att_c
    wr, hr = w_c, h_c
    if W:
        # temporal levels: reference pinned to level 0 (reference L447)
        rx0 = jnp.broadcast_to(rx_l[0:1], (W * L * P, Qt))
        ry0 = jnp.broadcast_to(ry_l[0:1], (W * L * P, Qt))
        w_t = jnp.concatenate([w_c] * W, 0)                   # (W·L·P, 1)
        h_t = jnp.concatenate([h_c] * W, 0)
        iw_t = jnp.concatenate([iw_c] * W, 0)
        ih_t = jnp.concatenate([ih_c] * W, 0)
        lx = jnp.concatenate(
            [lx, rx0 + tx_ref[0, 0].astype(f32) * iw_t], 0)   # (F·L·P, Qt)
        ly = jnp.concatenate(
            [ly, ry0 + ty_ref[0, 0].astype(f32) * ih_t], 0)
        at = jnp.concatenate([att_c, att_t], 0)
        wr = jnp.concatenate([w_c, w_t], 0)
        hr = jnp.concatenate([h_c, h_t], 0)
    # `_level_entries` body with (rows, 1) shape columns for h/w
    x = lx * wr - 0.5
    y = ly * hr - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    one = jnp.float32(1.0)
    vx0 = (x0 >= 0) & (x0 <= wr - 1)
    vx1 = (x0 >= -1) & (x0 <= wr - 2)
    out = []
    for y_row, wy in ((y0, (1 - dy)), (y0 + 1, dy)):
        vy = (y_row >= 0) & (y_row <= hr - 1)
        wl = wy * (1 - dx) * at * jnp.where(vy & vx0, one, 0.0)
        wrgt = wy * dx * at * jnp.where(vy & vx1, one, 0.0)
        base = y_row * wr + x0
        m_l = jnp.floor(base * 0.5)
        m_r = jnp.floor((base + 1) * 0.5)
        even = (base - 2.0 * m_l) == 0
        out.append((jnp.where(even, m_l, m_r), jnp.where(even, wl, wrgt),
                    jnp.where(even, m_r, m_l), jnp.where(even, wrgt, wl)))
    return out


def _slice_entries(ents, lvl: int, P: int):
    """Level `lvl`'s `_level_entries`-format view of a batched entries set."""
    sl = slice(lvl * P, (lvl + 1) * P)
    return [(ie[sl], we[sl], io[sl], wo[sl]) for ie, we, io, wo in ents]


def _fwd_kernel_temporal_proj(ranges_ref, *refs, spatial_shapes, level_starts,
                              s_tiles, P: int, acc_dtype, F: int):
    """Straight-line forward: ONE per-level window of a per-level static
    size (`_proj_s_tiles`) executed with no control-flow regions, plus a
    single per-program `pl.when` overflow fallback for spans that exceed
    their window.

    Why: cost isolation (benchmarks/kernel_lab.py, r4) showed each
    per-level `fori_loop`/`pl.when` REGION costs ~600 cycles even at trip
    count 0 — 24 regions × 912 programs ≈ 14 ms of the op's 26.7 ms wall —
    while the dots and W-builds themselves are cheap. The region-free
    window-0-only variant measured 11.9 ms; the fallback (taken only by
    programs with an overflowing span — typically coarse-level query tiles
    sampling fine levels) restores exactness."""
    ve_refs = refs[:F]
    vo_refs = refs[F:2 * F]
    (rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref, ca_ref, ta_ref,
     out_ref, tl_ref) = refs[2 * F:]
    L = len(spatial_shapes)
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    f32 = jnp.float32
    iotas = {s: jax.lax.broadcasted_iota(jnp.int32, (s, Qt), 0).astype(f32)
             for s in sorted(set(s_tiles))}

    # Joint softmax over current + temporal logits (per query column).
    cl = ca_ref[0, 0].astype(f32)                    # (L·P, Qt)
    tl = ta_ref[0, 0].astype(f32)                    # (W·L·P, Qt)
    mx = jnp.maximum(jnp.max(cl, axis=0, keepdims=True),
                     jnp.max(tl, axis=0, keepdims=True))
    ec = jnp.exp(cl - mx)
    et = jnp.exp(tl - mx)
    inv = 1.0 / (jnp.sum(ec, axis=0, keepdims=True)
                 + jnp.sum(et, axis=0, keepdims=True))
    att_c = ec * inv
    att_t = et * inv

    def lvl_entries(lvl):
        ll = lvl % L
        h, w = spatial_shapes[ll]
        if lvl < L:
            offx = cx_ref[0, 0, ll * P:(ll + 1) * P, :].astype(f32)
            offy = cy_ref[0, 0, ll * P:(ll + 1) * P, :].astype(f32)
            at = att_c[ll * P:(ll + 1) * P, :]
            rxl = rx_ref[0, 0, ll:ll + 1, :]
            ryl = ry_ref[0, 0, ll:ll + 1, :]
        else:
            k = lvl - L
            offx = tx_ref[0, 0, k * P:(k + 1) * P, :].astype(f32)
            offy = ty_ref[0, 0, k * P:(k + 1) * P, :].astype(f32)
            at = att_t[k * P:(k + 1) * P, :]
            # temporal reference point = level-0 reference (reference L447)
            rxl = rx_ref[0, 0, 0:1, :]
            ryl = ry_ref[0, 0, 0:1, :]
        lx = rxl + offx * np.float32(1.0 / w)
        ly = ryl + offy * np.float32(1.0 / h)
        return _level_entries(lx, ly, at, h, w)

    ents = _batched_level_entries(spatial_shapes, F, P, rx_ref, ry_ref,
                                  cx_ref, cy_ref, tx_ref, ty_ref,
                                  att_c, att_t, Qt)
    acc_e = jnp.zeros((D, Qt), f32)
    acc_o = jnp.zeros((D, Qt), f32)
    for lvl in range(F * L):
        ll = lvl % L
        s_l = s_tiles[ll]
        entries = _slice_entries(ents, lvl, P)
        base_w = ranges_ref[0, 0, lvl, 0]
        s0 = pl.multiple_of(base_w, 8)
        vte = ve_refs[lvl // L][0, pl.ds(level_starts[ll] + s0, s_l), :]
        vto = vo_refs[lvl // L][0, pl.ds(level_starts[ll] + s0, s_l), :]
        cols = iotas[s_l] + s0.astype(f32)
        we = _entry_tree(entries, cols, P, 0)
        wo = _entry_tree(entries, cols, P, 1)
        acc_e = acc_e + jax.lax.dot_general(
            vte.astype(acc_dtype), we.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_o = acc_o + jax.lax.dot_general(
            vto.astype(acc_dtype), wo.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # Overflow fallback: windows 1..num_t-1 per level, entered at most once
    # per program. Entries are recomputed inside so nothing large is
    # carried across the region boundary; the f32 side-accumulator keeps
    # the math identical to the main path. Levels whose static window
    # covers the whole packed level (s_l >= ceil(h·w/2)) can never report
    # num_t > 1 — their tail loops are dead code and each dead `fori`
    # region still costs ~600 cycles per taken program, so skip them
    # statically.
    def _can_overflow(ll):
        h, w = spatial_shapes[ll]
        return s_tiles[ll] < -(-h * w // 2)

    live = [lvl for lvl in range(F * L) if _can_overflow(lvl % L)]
    if not live:                      # every window covers its whole level
        out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)
        return
    overflow = ranges_ref[0, 0, live[0], 1]
    for lvl in live[1:]:
        overflow = jnp.maximum(overflow, ranges_ref[0, 0, lvl, 1])
    tl_ref[:] = jnp.zeros_like(tl_ref)

    @pl.when(overflow > 1)
    def _tail():
        for lvl in live:
            ll = lvl % L
            s_l = s_tiles[ll]
            entries = lvl_entries(lvl)
            base_w = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]
            rows0 = iotas[s_l]

            def body(t, carry, ll=ll, s_l=s_l, entries=entries,
                     base_w=base_w, rows0=rows0,
                     ve_ref=ve_refs[lvl // L], vo_ref=vo_refs[lvl // L]):
                s0 = pl.multiple_of(base_w + t * s_l, 8)
                vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
                vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
                cols = rows0 + s0.astype(f32)
                we = _entry_tree(entries, cols, P, 0)
                wo = _entry_tree(entries, cols, P, 1)
                tl_ref[:] += (jax.lax.dot_general(
                    vte.astype(acc_dtype), we.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                    vto.astype(acc_dtype), wo.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                return carry
            jax.lax.fori_loop(1, num_t, body, 0)

    out_ref[0, 0] = (acc_e + acc_o + tl_ref[:]).astype(out_ref.dtype)


def _row_ranges_proj(rx, ry, cx, cy, tx, ty, spatial_shapes: Shapes, F: int,
                     q_tile: int, s_tile: int):
    """`_row_ranges` computed straight from references + offsets (bf16 rows,
    f32 math) — same arithmetic as the kernel, so the windows cover every
    live tap exactly. rx/ry: (T, L, q_pad); cx/cy: (T·M, L·P, q_pad);
    tx/ty: (T·M, W·L·P, q_pad). → (T·M, nqt, Lf, 2)."""
    T, L, q_pad = rx.shape
    TM, LP, _ = cx.shape
    M = TM // T
    P = LP // L
    nqt = q_pad // q_tile
    f32 = jnp.float32
    rx = rx.astype(f32).reshape(T, 1, L, 1, nqt, q_tile)
    ry = ry.astype(f32).reshape(T, 1, L, 1, nqt, q_tile)
    cx = cx.astype(f32).reshape(T, M, L, P, nqt, q_tile)
    cy = cy.astype(f32).reshape(T, M, L, P, nqt, q_tile)
    W = F - 1
    tx = tx.astype(f32).reshape(T, M, W * L, P, nqt, q_tile)
    ty = ty.astype(f32).reshape(T, M, W * L, P, nqt, q_tile)
    mns, mxs = [], []
    for lvl in range(F * L):
        h, w = spatial_shapes[lvl % L]
        if lvl < L:
            x = rx[:, :, lvl] + cx[:, :, lvl] * np.float32(1.0 / w)
            y = ry[:, :, lvl] + cy[:, :, lvl] * np.float32(1.0 / h)
        else:
            x = rx[:, :, 0] + tx[:, :, lvl - L] * np.float32(1.0 / w)
            y = ry[:, :, 0] + ty[:, :, lvl - L] * np.float32(1.0 / h)
        x = x * w - 0.5                                   # (T, M|1, P, nqt, qt)
        y = y * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        valid = (x > -1) & (x < w) & (y > -1) & (y < h)
        lo = jnp.floor((jnp.clip(y0, 0, h - 1) * w
                        + jnp.clip(x0, 0, w - 1)) * 0.5)
        hi = jnp.floor((jnp.clip(y0 + 1, 0, h - 1) * w
                        + jnp.clip(x0 + 1, 0, w - 1)) * 0.5)
        big = jnp.float32(1 << 30)
        mns.append(jnp.min(jnp.where(valid, lo, big), axis=(2, 4)))
        mxs.append(jnp.max(jnp.where(valid, hi, -1.0), axis=(2, 4)))
    mn = jnp.stack(mns, axis=-1).astype(jnp.int32)        # (T, M, nqt, Lf)
    mx = jnp.stack(mxs, axis=-1).astype(jnp.int32)
    mn = mn.reshape(TM, nqt, F * L)
    mx = mx.reshape(TM, nqt, F * L)
    base = (mn // 8) * 8
    count = jnp.where(mx >= 0, (mx - base) // s_tile + 1, 0)
    return jnp.stack([jnp.where(mx >= 0, base, 0),
                      count.astype(jnp.int32)], axis=-1)


def _ranges_proj_kernel(rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref,
                        out_ref, *, spatial_shapes: Shapes, F: int,
                        s_tiles, P: int):
    """In-kernel `_row_ranges_proj`: same f32 span math (windows stay exact
    supersets of the live taps), but the bf16 offset rows are read ONCE in
    VMEM tiles instead of XLA materializing f32 copies of every
    (ref + offset) location tensor per layer (~0.9 GB HBM round trips per
    6-layer clip at YT-VIS eval shapes)."""
    L = len(spatial_shapes)
    f32 = jnp.float32
    big = jnp.float32(1 << 30)
    for lvl in range(F * L):
        h, w = spatial_shapes[lvl % L]
        if lvl < L:
            rxl = rx_ref[0, 0, lvl:lvl + 1, :].astype(f32)     # (1, qt)
            ryl = ry_ref[0, 0, lvl:lvl + 1, :].astype(f32)
            ox = cx_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
            oy = cy_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
        else:
            rxl = rx_ref[0, 0, 0:1, :].astype(f32)
            ryl = ry_ref[0, 0, 0:1, :].astype(f32)
            j = lvl - L
            ox = tx_ref[0, 0, j * P:(j + 1) * P, :].astype(f32)
            oy = ty_ref[0, 0, j * P:(j + 1) * P, :].astype(f32)
        x = (rxl + ox * np.float32(1.0 / w)) * w - 0.5         # (P, qt)
        y = (ryl + oy * np.float32(1.0 / h)) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        valid = (x > -1) & (x < w) & (y > -1) & (y < h)
        lo = jnp.floor((jnp.clip(y0, 0, h - 1) * w
                        + jnp.clip(x0, 0, w - 1)) * 0.5)
        hi = jnp.floor((jnp.clip(y0 + 1, 0, h - 1) * w
                        + jnp.clip(x0 + 1, 0, w - 1)) * 0.5)
        mn = jnp.min(jnp.where(valid, lo, big)).astype(jnp.int32)
        mx = jnp.max(jnp.where(valid, hi, -1.0)).astype(jnp.int32)
        base = (mn // 8) * 8
        out_ref[0, 0, lvl, 0] = jnp.where(mx >= 0, base, 0)
        out_ref[0, 0, lvl, 1] = jnp.where(
            mx >= 0, (mx - base) // s_tiles[lvl % L] + 1, 0)


def _row_ranges_proj_pallas(rx, ry, cx, cy, tx, ty, spatial_shapes: Shapes,
                            F: int, q_tile: int, s_tiles, M: int):
    """Pallas launcher for `_ranges_proj_kernel` → (T·M, nqt, Lf, 2) i32.

    Operands arrive PRE-TILED in head-slab layout (tile-native
    `TransposedDense` outputs): rx/ry (T, nqt, L, q_tile),
    cx/cy (T, nqt, M·L·P, q_tile), tx/ty (T, nqt, M·W·L·P, q_tile)."""
    T, nqt, L, q_tile_ = rx.shape
    assert q_tile_ == q_tile
    LP = cx.shape[2] // M
    P = LP // L
    W = F - 1
    Lf = F * L
    TM = T * M
    if W == 0:
        # Single-frame form (image encoder): the kernel never reads the
        # temporal refs, but the specs must be non-empty — pass a 1-row
        # dummy so the unused operands DMA one row per grid step instead of
        # re-staging the full (L·P, q_tile) current-frame block twice.
        tx = jnp.zeros((T, nqt, 1, q_tile), cx.dtype)
        ty = tx
    ref_spec = pl.BlockSpec((1, 1, L, q_tile),
                            lambda bm, qt: (bm // M, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((1, 1, L * P, q_tile),
                            lambda bm, qt: (bm // M, qt, bm % M, 0),
                            memory_space=pltpu.VMEM)
    tmp_spec = pl.BlockSpec(
        (1, 1, max(W, 1) * L * P if W else 1, q_tile),
        (lambda bm, qt: (bm // M, qt, bm % M, 0)) if W
        else (lambda bm, qt: (bm // M, qt, 0, 0)),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_ranges_proj_kernel,
                               spatial_shapes=tuple(spatial_shapes), F=F,
                               s_tiles=_as_level_tiles(spatial_shapes,
                                                       s_tiles), P=P)
    return pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ref_spec, ref_spec, cur_spec, cur_spec, tmp_spec, tmp_spec],
        out_specs=pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, Lf, 2), jnp.int32),
        interpret=_interpret(),
    )(rx, ry, cx, cy, tx, ty)


def _build_rows_from_proj(spatial_shapes: Shapes, F: int, rx, ry, cx, cy,
                          tx, ty, ca, ta):
    """Differentiable XLA reconstruction of (lx, ly, at) rows from the
    projection-level inputs — the backward path and the parity oracle for
    `ms_deform_attn_temporal_proj`. Same math as the kernel."""
    T, L, q_pad = rx.shape
    TM, LP, _ = cx.shape
    M = TM // T
    P = LP // L
    W = F - 1
    f32 = jnp.float32
    rxr = rx.astype(f32).reshape(T, 1, L, 1, q_pad)
    ryr = ry.astype(f32).reshape(T, 1, L, 1, q_pad)
    cxr = cx.astype(f32).reshape(T, M, L, P, q_pad)
    cyr = cy.astype(f32).reshape(T, M, L, P, q_pad)
    txr = tx.astype(f32).reshape(T, M, W * L, P, q_pad)
    tyr = ty.astype(f32).reshape(T, M, W * L, P, q_pad)
    wn = np.asarray([w for _, w in spatial_shapes], np.float32)
    hn = np.asarray([h for h, _ in spatial_shapes], np.float32)
    inv_w = (1.0 / wn).reshape(1, 1, L, 1, 1)
    inv_h = (1.0 / hn).reshape(1, 1, L, 1, 1)
    inv_wt = np.tile(1.0 / wn, W).reshape(1, 1, W * L, 1, 1)
    inv_ht = np.tile(1.0 / hn, W).reshape(1, 1, W * L, 1, 1)
    lx_c = rxr + cxr * inv_w
    ly_c = ryr + cyr * inv_h
    lx_t = rxr[:, :, 0:1] + txr * inv_wt
    ly_t = ryr[:, :, 0:1] + tyr * inv_ht
    lx = jnp.concatenate([lx_c.reshape(TM, L * P, q_pad),
                          lx_t.reshape(TM, W * L * P, q_pad)], axis=1)
    ly = jnp.concatenate([ly_c.reshape(TM, L * P, q_pad),
                          ly_t.reshape(TM, W * L * P, q_pad)], axis=1)
    logits = jnp.concatenate([ca.astype(f32), ta.astype(f32)], axis=1)
    at = jax.nn.softmax(logits, axis=1)
    return lx, ly, at


@functools.partial(jax.jit, static_argnums=(0, 11, 12, 13))
def _fwd_call_temporal_proj(spatial_shapes: Shapes, value_e, value_o, rx, ry,
                            cx, cy, tx, ty, ca, ta, q_tile: int,
                            T: int, rule):
    TM, S_pad, D = value_e.shape
    M = TM // T
    F = 1 + _rule_window(rule, T)
    L = len(spatial_shapes)
    # PRE-TILED head-slab operand contract (produced tile-native by
    # `TransposedDense` on (T, nqt, q_tile, C) query tiles — the tiling
    # never exists as an XLA transpose copy, which measured ~17 ms/layer):
    #   rx/ry: (T, nqt, L, q_tile); cx/cy/ca: (T, nqt, M·L·P, q_tile);
    #   tx/ty/ta: (T, nqt, M·W·L·P, q_tile). A program (bm = t·M + m, qt)
    #   reads block (t, qt, head-slab m, :) — strided-free, transpose-free.
    nqt = rx.shape[1]
    q_pad = nqt * q_tile
    P = cx.shape[2] // (M * L)
    s_tiles = _proj_s_tiles(spatial_shapes, q_tile)
    ranges = _row_ranges_proj_pallas(rx, ry, cx, cy, tx, ty, spatial_shapes,
                                     F, q_tile, s_tiles, M)
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tiles)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    Lf = F * L
    ranges_spec = pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)

    def _value_spec(j):
        if j == 0:
            return pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm, 0, 0),
                                memory_space=pltpu.VMEM)

        def index_map(bm, qt, j=j - 1):
            t = bm // M
            f = _temporal_frame_expr(rule, j, t, T)
            return (f * M + bm % M, 0, 0)
        return pl.BlockSpec((1, S_pad, D), index_map,
                            memory_space=pltpu.VMEM)

    def row_spec(rows):
        # dim-2 block index bm % M selects head m's slab of `rows` rows
        return pl.BlockSpec((1, 1, rows, q_tile),
                            lambda bm, qt: (bm // M, qt, bm % M, 0),
                            memory_space=pltpu.VMEM)

    ref_spec = pl.BlockSpec((1, 1, L, q_tile),
                            lambda bm, qt: (bm // M, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_temporal_proj,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts,
                               s_tiles=s_tiles, P=P, acc_dtype=acc_dtype,
                               F=F)
    specs = [_value_spec(j) for j in range(F)]
    W = F - 1
    nqt = q_pad // q_tile
    out = pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ranges_spec] + specs + specs
        + [ref_spec, ref_spec,
           row_spec(L * P), row_spec(L * P),
           row_spec(W * L * P), row_spec(W * L * P),
           row_spec(L * P), row_spec(W * L * P)],
        out_specs=pl.BlockSpec((1, 1, D, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, D, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((D, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, *([value_e] * F), *([value_o] * F), rx, ry, cx, cy, tx, ty,
      ca, ta)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(TM, D, q_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 10, 11, 12))
def ms_deform_attn_temporal_proj(value, spatial_shapes: Shapes, rx, ry,
                                 cx, cy, tx, ty, ca, ta, n_queries: int,
                                 rule=("all",), q_tile: int = 0):
    """Projection-fused temporal attention (encoder semantics).

    PRE-TILED head-slab operands (see `_tile_headmajor`): rx/ry
    (T, nqt, L, q_tile) per-level reference points (padded queries carry
    −10); cx/cy (T, nqt, M·L·P, q_tile) current offsets; tx/ty
    (T, nqt, M·W·L·P, q_tile) temporal offsets (frame-major level order);
    ca/ta pre-softmax attention logits of the same shapes; value
    (T, S, M, D) per-frame. Locations = ref + off/(w_l, h_l) with the
    temporal reference pinned to level 0, weights = joint softmax over
    current+temporal — both computed in-kernel. Returns
    (T, n_queries, M·D)."""
    out, _ = _temporal_proj_fwd(value, spatial_shapes, rx, ry, cx, cy, tx,
                                ty, ca, ta, n_queries, rule, q_tile)
    return out


def _temporal_proj_fwd(value, spatial_shapes, rx, ry, cx, cy, tx, ty, ca, ta,
                       n_queries, rule, q_tile):
    T, S, M, D = value.shape
    q_tile_in = rx.shape[3]
    q_pad = rx.shape[1] * q_tile_in
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    assert q_tile == q_tile_in, (q_tile, q_tile_in)
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(T * M, S, D)
    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles)
    out_bm = _fwd_call_temporal_proj(tuple(spatial_shapes), value_e, value_o,
                                     rx, ry, cx, cy, tx, ty, ca, ta,
                                     q_tile, T, rule)
    out = out_bm.reshape(T, M, D, q_pad)[..., :n_queries]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(T, n_queries, M * D)
    return out.astype(value.dtype), (value, rx, ry, cx, cy, tx, ty, ca, ta)


def _temporal_proj_fwd_fwd(value, spatial_shapes, rx, ry, cx, cy, tx, ty,
                           ca, ta, n_queries, rule=("all",), q_tile=0):
    return _temporal_proj_fwd(value, spatial_shapes, rx, ry, cx, cy, tx, ty,
                              ca, ta, n_queries, rule, q_tile)


def _temporal_proj_fwd_bwd(spatial_shapes, n_queries, rule, q_tile, res, g):
    value, rx, ry, cx, cy, tx, ty, ca, ta = res
    M = value.shape[2]
    F = 1 + _rule_window(rule, value.shape[0])

    def build(rx, ry, cx, cy, tx, ty, ca, ta):
        # tiled head-slab residuals → untiled rows for the XLA oracle
        # (training-path-only transposes; eval never materializes these)
        return _build_rows_from_proj(
            tuple(spatial_shapes), F, _untile_ref(rx), _untile_ref(ry),
            *(_untile_headmajor(a, M) for a in (cx, cy, tx, ty, ca, ta)))
    (lx, ly, at), vjp_rows = jax.vjp(build, rx, ry, cx, cy, tx, ty, ca, ta)
    gval, glx, gly, gat = _temporal_bwd_core(
        spatial_shapes, n_queries, rule, q_tile, value, lx, ly, at, g)
    grads = vjp_rows((glx.astype(jnp.float32), gly.astype(jnp.float32),
                      gat.astype(jnp.float32)))
    return (gval.astype(value.dtype),) + tuple(
        gr.astype(r.dtype) for gr, r in zip(grads,
                                            (rx, ry, cx, cy, tx, ty, ca, ta)))


ms_deform_attn_temporal_proj.defvjp(_temporal_proj_fwd_fwd,
                                    _temporal_proj_fwd_bwd)


# ---------------------------------------------------------------------------
# Projection-fused single-frame op (image-model encoder hot path)
# ---------------------------------------------------------------------------


def _fwd_kernel_proj(ranges_ref, ve_ref, vo_ref, rx_ref, ry_ref, cx_ref,
                     cy_ref, ca_ref, out_ref, tl_ref, *,
                     spatial_shapes, level_starts, s_tiles, P: int,
                     acc_dtype):
    """Single-frame analog of `_fwd_kernel_temporal_proj`: raw offset/logit
    rows in, per-head softmax over L·P and location math in-kernel
    (reference ms_deform_attn.py L99-117). Same straight-line window-0 +
    per-program overflow-fallback structure (see the temporal kernel's
    docstring for the region-cost rationale)."""
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    f32 = jnp.float32
    iotas = {s: jax.lax.broadcasted_iota(jnp.int32, (s, Qt), 0).astype(f32)
             for s in sorted(set(s_tiles))}

    cl = ca_ref[0, 0].astype(f32)                     # (L·P, Qt)
    mx = jnp.max(cl, axis=0, keepdims=True)
    ec = jnp.exp(cl - mx)
    att = ec / jnp.sum(ec, axis=0, keepdims=True)

    def lvl_entries(lvl):
        h, w = spatial_shapes[lvl]
        offx = cx_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
        offy = cy_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
        at = att[lvl * P:(lvl + 1) * P, :]
        lx = rx_ref[0, 0, lvl:lvl + 1, :] + offx * np.float32(1.0 / w)
        ly = ry_ref[0, 0, lvl:lvl + 1, :] + offy * np.float32(1.0 / h)
        return _level_entries(lx, ly, at, h, w)

    ents = _batched_level_entries(spatial_shapes, 1, P, rx_ref, ry_ref,
                                  cx_ref, cy_ref, None, None, att, None, Qt)
    acc_e = jnp.zeros((D, Qt), f32)
    acc_o = jnp.zeros((D, Qt), f32)
    for lvl in range(len(spatial_shapes)):
        s_l = s_tiles[lvl]
        entries = _slice_entries(ents, lvl, P)
        base_w = ranges_ref[0, 0, lvl, 0]
        s0 = pl.multiple_of(base_w, 8)
        vte = ve_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
        vto = vo_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
        cols = iotas[s_l] + s0.astype(f32)
        we = _entry_tree(entries, cols, P, 0)
        wo = _entry_tree(entries, cols, P, 1)
        acc_e = acc_e + jax.lax.dot_general(
            vte.astype(acc_dtype), we.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_o = acc_o + jax.lax.dot_general(
            vto.astype(acc_dtype), wo.astype(acc_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # skip tail loops for levels whose window covers the whole packed level
    # (they can never report num_t > 1 — see the temporal kernel)
    live = [lvl for lvl, (h, w) in enumerate(spatial_shapes)
            if s_tiles[lvl] < -(-h * w // 2)]
    if not live:
        out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)
        return
    overflow = ranges_ref[0, 0, live[0], 1]
    for lvl in live[1:]:
        overflow = jnp.maximum(overflow, ranges_ref[0, 0, lvl, 1])
    tl_ref[:] = jnp.zeros_like(tl_ref)

    @pl.when(overflow > 1)
    def _tail():
        for lvl in live:
            s_l = s_tiles[lvl]
            entries = lvl_entries(lvl)
            base_w = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]
            rows0 = iotas[s_l]

            def body(t, carry, lvl=lvl, s_l=s_l, entries=entries,
                     base_w=base_w, rows0=rows0):
                s0 = pl.multiple_of(base_w + t * s_l, 8)
                vte = ve_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
                vto = vo_ref[0, pl.ds(level_starts[lvl] + s0, s_l), :]
                cols = rows0 + s0.astype(f32)
                we = _entry_tree(entries, cols, P, 0)
                wo = _entry_tree(entries, cols, P, 1)
                tl_ref[:] += (jax.lax.dot_general(
                    vte.astype(acc_dtype), we.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                    vto.astype(acc_dtype), wo.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                return carry
            jax.lax.fori_loop(1, num_t, body, 0)

    out_ref[0, 0] = (acc_e + acc_o + tl_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 8))
def _fwd_call_proj(spatial_shapes: Shapes, value_e, value_o, rx, ry, cx, cy,
                   ca, q_tile: int):
    BM, S_pad, D = value_e.shape
    B = rx.shape[0]
    M = BM // B
    L = len(spatial_shapes)
    # head-slab tiled contract: rx/ry (B, nqt, L, q_tile),
    # cx/cy/ca (B, nqt, M·L·P, q_tile) — see `_fwd_call_temporal_proj`
    nqt = rx.shape[1]
    q_pad = nqt * q_tile
    P = cx.shape[2] // (M * L)
    s_tiles = _proj_s_tiles(spatial_shapes, q_tile)
    ranges = _row_ranges_proj_pallas(rx, ry, cx, cy, cx, cy, spatial_shapes,
                                     1, q_tile, s_tiles, M)
    level_starts, _ = _padded_level_starts(spatial_shapes, s_tiles)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    val_spec = pl.BlockSpec((1, S_pad, D), lambda bm, qt: (bm, 0, 0),
                            memory_space=pltpu.VMEM)
    ref_spec = pl.BlockSpec((1, 1, L, q_tile),
                            lambda bm, qt: (bm // M, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, L * P, q_tile),
                            lambda bm, qt: (bm // M, qt, bm % M, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_proj,
                               spatial_shapes=spatial_shapes,
                               level_starts=level_starts,
                               s_tiles=s_tiles, P=P, acc_dtype=acc_dtype)
    nqt = q_pad // q_tile
    out = pl.pallas_call(
        kernel,
        grid=(BM, nqt),
        in_specs=[pl.BlockSpec((1, 1, L, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM),
                  val_spec, val_spec, ref_spec, ref_spec,
                  row_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, 1, D, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, nqt, D, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((D, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ranges, value_e, value_o, rx, ry, cx, cy, ca)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(BM, D, q_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 7, 8))
def ms_deform_attn_proj(value, spatial_shapes: Shapes, rx, ry, cx, cy, ca,
                        n_queries: int, q_tile: int = 0):
    """Projection-fused single-frame attention (encoder semantics).

    PRE-TILED head-slab operands (see `_tile_headmajor`): rx/ry
    (B, nqt, L, q_tile) per-level reference points (padded queries carry
    −10); cx/cy (B, nqt, M·L·P, q_tile) raw offsets; ca pre-softmax
    attention logits of the same shape; value (B, S, M, D). Locations
    = ref + off/(w_l, h_l) and the per-head softmax over L·P both run
    in-kernel. Returns (B, n_queries, M·D)."""
    out, _ = _proj_fwd(value, spatial_shapes, rx, ry, cx, cy, ca,
                       n_queries, q_tile)
    return out


def _proj_fwd(value, spatial_shapes, rx, ry, cx, cy, ca, n_queries, q_tile):
    B, S, M, D = value.shape
    q_tile_in = rx.shape[3]
    q_pad = rx.shape[1] * q_tile_in
    q_tile = q_tile or (128 if q_pad <= 128 else Q_TILE)
    assert q_tile == q_tile_in, (q_tile, q_tile_in)
    value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    s_tiles = _proj_s_tiles(tuple(spatial_shapes), q_tile)
    value_e, value_o = _pack_levels(value_bm, spatial_shapes, s_tiles)
    out_bm = _fwd_call_proj(tuple(spatial_shapes), value_e, value_o,
                            rx, ry, cx, cy, ca, q_tile)
    out = out_bm.reshape(B, M, D, q_pad)[..., :n_queries]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(B, n_queries, M * D)
    return out.astype(value.dtype), (value, rx, ry, cx, cy, ca)


def _build_rows_from_proj_single(spatial_shapes: Shapes, rx, ry, cx, cy, ca):
    """Differentiable XLA rows reconstruction for the single-frame proj op —
    backward path and parity oracle. Same math as `_fwd_kernel_proj`."""
    B, L, q_pad = rx.shape
    BM = cx.shape[0]
    M = BM // B
    P = cx.shape[1] // L
    f32 = jnp.float32
    rxr = rx.astype(f32).reshape(B, 1, L, 1, q_pad)
    ryr = ry.astype(f32).reshape(B, 1, L, 1, q_pad)
    cxr = cx.astype(f32).reshape(B, M, L, P, q_pad)
    cyr = cy.astype(f32).reshape(B, M, L, P, q_pad)
    wn = np.asarray([w for _, w in spatial_shapes], np.float32)
    hn = np.asarray([h for h, _ in spatial_shapes], np.float32)
    lx = (rxr + cxr * (1.0 / wn).reshape(1, 1, L, 1, 1)).reshape(
        BM, L * P, q_pad)
    ly = (ryr + cyr * (1.0 / hn).reshape(1, 1, L, 1, 1)).reshape(
        BM, L * P, q_pad)
    at = jax.nn.softmax(ca.astype(f32), axis=1)
    return lx, ly, at


def _proj_fwd_fwd(value, spatial_shapes, rx, ry, cx, cy, ca, n_queries,
                  q_tile=0):
    return _proj_fwd(value, spatial_shapes, rx, ry, cx, cy, ca, n_queries,
                     q_tile)


def _proj_fwd_bwd(spatial_shapes, n_queries, q_tile, res, g):
    value, rx, ry, cx, cy, ca = res
    M = value.shape[2]

    def build(rx, ry, cx, cy, ca):
        return _build_rows_from_proj_single(
            tuple(spatial_shapes), _untile_ref(rx), _untile_ref(ry),
            *(_untile_headmajor(a, M) for a in (cx, cy, ca)))
    (lx, ly, at), vjp_rows = jax.vjp(build, rx, ry, cx, cy, ca)
    gval, glx, gly, gat = _rows_bwd_core(spatial_shapes, n_queries, q_tile,
                                         value, lx, ly, at, g)
    grads = vjp_rows((glx.astype(jnp.float32), gly.astype(jnp.float32),
                      gat.astype(jnp.float32)))
    return (gval.astype(value.dtype),) + tuple(
        gr.astype(r.dtype) for gr, r in zip(grads, (rx, ry, cx, cy, ca)))


ms_deform_attn_proj.defvjp(_proj_fwd_fwd, _proj_fwd_bwd)


def ms_deform_attn_temporal(value, spatial_shapes: Shapes, loc, att,
                            rule=("all",), q_tile: int = 0):
    """Q-major convenience wrapper over `ms_deform_attn_rows_temporal`:
    loc (T, Q, M, Lf, P, 2) / att (T, Q, M, Lf, P) over the fused level
    stack; value (T, S, M, D) per-frame. Used by the decoder, whose query
    count is small enough that the rows transposes are negligible."""
    T, Q, M, Lf, P, _ = loc.shape
    q_tile = q_tile or (128 if Q <= 128 else Q_TILE)
    q_pad = _round_up(Q, q_tile)
    locf = loc.astype(jnp.float32)
    lx = jnp.transpose(locf[..., 0], (0, 2, 3, 4, 1)).reshape(T * M, Lf * P, Q)
    ly = jnp.transpose(locf[..., 1], (0, 2, 3, 4, 1)).reshape(T * M, Lf * P, Q)
    at = jnp.transpose(att.astype(jnp.float32),
                       (0, 2, 3, 4, 1)).reshape(T * M, Lf * P, Q)
    if q_pad != Q:
        qp = ((0, 0), (0, 0), (0, q_pad - Q))
        lx = jnp.pad(lx, qp, constant_values=-10.0)
        ly = jnp.pad(ly, qp, constant_values=-10.0)
        at = jnp.pad(at, qp)
    return ms_deform_attn_rows_temporal(value, tuple(spatial_shapes), lx, ly,
                                        at, Q, rule, q_tile)


# ---------------------------------------------------------------------------
# VMEM-bounded level grouping
# ---------------------------------------------------------------------------

VMEM_VALUE_BUDGET = 12 * 1024 * 1024


def _value_vmem_bytes(spatial_shapes: Shapes, D: int, itemsize: int) -> int:
    """VMEM footprint of the two resident parity-packed value blocks for one
    grid row (minor dim lane-padded to a 128 multiple)."""
    _, s_pad = _padded_level_starts(spatial_shapes, S_TILE)
    lanes = _round_up(max(D, 1), 128)
    return 2 * s_pad * lanes * itemsize


def level_groups(spatial_shapes: Shapes, D: int, itemsize: int,
                 budget=None):
    """Split the level list into contiguous groups whose packed value blocks
    fit the VMEM budget. The attention output is a sum over levels, so the
    kernel can run once per group and accumulate (attention weights are
    already normalized jointly; slicing them keeps the weighting exact)."""
    if budget is None:
        budget = VMEM_VALUE_BUDGET
    groups = []
    start = 0
    L = len(spatial_shapes)
    while start < L:
        end = start + 1
        while end < L and _value_vmem_bytes(
                spatial_shapes[start:end + 1], D, itemsize) <= budget:
            end += 1
        groups.append((start, end))
        start = end
    return groups


def ms_deform_attn_pallas_auto(value, spatial_shapes: Shapes, loc, att,
                               q_tile: int = 0):
    """`ms_deform_attn_pallas` with automatic VMEM-bounded level grouping:
    large pyramids / wide dtypes whose packed value blocks exceed the VMEM
    budget run as one kernel call per level group, summed (exact — the op is
    a sum over levels)."""
    D = value.shape[-1]
    groups = level_groups(spatial_shapes, D, value.dtype.itemsize)
    if len(groups) == 1:
        return ms_deform_attn_pallas(value, spatial_shapes, loc, att, q_tile)
    starts = _level_starts(spatial_shapes) + (value.shape[1],)
    out = None
    for l0, l1 in groups:
        v = jax.lax.slice_in_dim(value, starts[l0], starts[l1], axis=1)
        o = ms_deform_attn_pallas(v, spatial_shapes[l0:l1],
                                  loc[:, :, :, l0:l1], att[:, :, :, l0:l1],
                                  q_tile)
        out = o if out is None else out + o
    return out


def ms_deform_attn_rows_auto(value, spatial_shapes: Shapes, lx, ly, at,
                             n_queries: int, q_tile: int = 0):
    """`ms_deform_attn_rows` with automatic VMEM-bounded level grouping."""
    D = value.shape[-1]
    P = lx.shape[1] // len(spatial_shapes)
    groups = level_groups(spatial_shapes, D, value.dtype.itemsize)
    if len(groups) == 1:
        return ms_deform_attn_rows(value, spatial_shapes, lx, ly, at,
                                   n_queries, q_tile)
    starts = _level_starts(spatial_shapes) + (value.shape[1],)
    out = None
    for l0, l1 in groups:
        v = jax.lax.slice_in_dim(value, starts[l0], starts[l1], axis=1)
        o = ms_deform_attn_rows(v, spatial_shapes[l0:l1],
                                lx[:, l0 * P:l1 * P], ly[:, l0 * P:l1 * P],
                                at[:, l0 * P:l1 * P], n_queries, q_tile)
        out = o if out is None else out + o
    return out
