"""Kernel lab: cost isolation + variants for the encoder temporal-proj MSDA
kernel. NOT part of the product — a measurement harness for kernel work.

Variants (selected by argv):
  base       exact copy of `_fwd_kernel_temporal_proj` (sanity vs bench)
  noentries  static dummy tap entries (removes location math + entry gen;
             keeps W-build + matmuls + machinery)
  nowbuild   W tiles stay zero (removes W-build AND the dead entries math;
             keeps value DMA + matmuls + machinery)
  nomxu      no dot_general; accumulates a W-tile slice (keeps entries +
             W-build; removes MXU)
  batched    full-tile batched tap generation (one (rows, Qt) pass for all
             F*L levels instead of 24 sub-sublane passes)

Usage: python benchmarks/kernel_lab.py [variant ...]   (default: all)
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from devis_tpu.ops import ms_deform_attn_pallas as mp
from bench_encoder_kernel import make_operands, ESHAPES, T, M, D, P, RULE


# --------------------------------------------------------------------------
# per-level-tile (pltile) machinery: local copies of the packing/ranges
# helpers generalized to one static window size per level
# --------------------------------------------------------------------------

def _starts_ml(spatial_shapes, s_tiles):
    starts = [0]
    for (h, w), s in zip(spatial_shapes, s_tiles):
        starts.append(starts[-1] + mp._round_up(-(-h * w // 2), s) + s)
    return tuple(starts[:-1]), starts[-1]


def _pack_levels_ml(value_bm, spatial_shapes, s_tiles):
    starts = mp._level_starts(spatial_shapes)
    BM, _, D = value_bm.shape
    evens, odds = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        n2 = -(-n // 2)
        s = s_tiles[lvl]
        seg = jax.lax.slice_in_dim(value_bm, starts[lvl], starts[lvl] + n,
                                   axis=1)
        pad_rows = (mp._round_up(n2, s) + s) * 2 - n
        seg = jnp.pad(seg, ((0, 0), (0, pad_rows), (0, 0)))
        seg = seg.reshape(BM, -1, 2, D)
        evens.append(seg[:, :, 0])
        odds.append(seg[:, :, 1])
    return jnp.concatenate(evens, axis=1), jnp.concatenate(odds, axis=1)


def _ranges_kernel_ml(rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref,
                      out_ref, *, spatial_shapes, F, s_tiles, P):
    L = len(spatial_shapes)
    f32 = jnp.float32
    big = jnp.float32(1 << 30)
    for lvl in range(F * L):
        h, w = spatial_shapes[lvl % L]
        s_l = s_tiles[lvl % L]
        if lvl < L:
            rxl = rx_ref[0, 0, lvl:lvl + 1, :].astype(f32)
            ryl = ry_ref[0, 0, lvl:lvl + 1, :].astype(f32)
            ox = cx_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
            oy = cy_ref[0, 0, lvl * P:(lvl + 1) * P, :].astype(f32)
        else:
            rxl = rx_ref[0, 0, 0:1, :].astype(f32)
            ryl = ry_ref[0, 0, 0:1, :].astype(f32)
            j = lvl - L
            ox = tx_ref[0, 0, j * P:(j + 1) * P, :].astype(f32)
            oy = ty_ref[0, 0, j * P:(j + 1) * P, :].astype(f32)
        x = (rxl + ox * np.float32(1.0 / w)) * w - 0.5
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
            mx >= 0, (mx - base) // s_l + 1, 0)


def _ranges_ml(rx, ry, cx, cy, tx, ty, spatial_shapes, F, q_tile, s_tiles,
               M):
    T, nqt, L, q_tile_ = rx.shape
    LP = cx.shape[2] // M
    P = LP // L
    W = F - 1
    Lf = F * L
    TM = T * M
    if W == 0:
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
    kernel = functools.partial(_ranges_kernel_ml,
                               spatial_shapes=tuple(spatial_shapes), F=F,
                               s_tiles=tuple(s_tiles), P=P)
    return pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ref_spec, ref_spec, cur_spec, cur_spec, tmp_spec, tmp_spec],
        out_specs=pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, Lf, 2), jnp.int32),
        interpret=mp._interpret(),
    )(rx, ry, cx, cy, tx, ty)


def _kernel_ml(ranges_ref, *refs, spatial_shapes, level_starts, s_tiles, P,
               acc_dtype, F, win1=False):
    ve_refs = refs[:F]
    vo_refs = refs[F:2 * F]
    (rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref, ca_ref, ta_ref,
     out_ref, we_ref, wo_ref) = refs[2 * F:]
    L = len(spatial_shapes)
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    f32 = jnp.float32
    iotas = {s: jax.lax.broadcasted_iota(jnp.int32, (s, Qt), 0).astype(f32)
             for s in sorted(set(s_tiles))}

    cl = ca_ref[0, 0].astype(f32)
    tl = ta_ref[0, 0].astype(f32)
    mx = jnp.maximum(jnp.max(cl, axis=0, keepdims=True),
                     jnp.max(tl, axis=0, keepdims=True))
    ec = jnp.exp(cl - mx)
    et = jnp.exp(tl - mx)
    inv = 1.0 / (jnp.sum(ec, axis=0, keepdims=True)
                 + jnp.sum(et, axis=0, keepdims=True))
    att_c = ec * inv
    att_t = et * inv

    acc_e = jnp.zeros((D, Qt), f32)
    acc_o = jnp.zeros((D, Qt), f32)
    for lvl in range(F * L):
        ll = lvl % L
        h, w = spatial_shapes[ll]
        s_l = s_tiles[ll]
        ve_ref = ve_refs[lvl // L]
        vo_ref = vo_refs[lvl // L]
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
            rxl = rx_ref[0, 0, 0:1, :]
            ryl = ry_ref[0, 0, 0:1, :]
        lx = rxl + offx * np.float32(1.0 / w)
        ly = ryl + offy * np.float32(1.0 / h)
        entries = mp._level_entries(lx, ly, at, h, w)
        base_w = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        if win1:
            # single straight-line window per level (INEXACT when the span
            # overflows s_l — speed probe for the big-window + overflow
            # fallback design)
            s0 = pl.multiple_of(base_w, 8)
            vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
            vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
            cols = iotas[s_l] + s0.astype(f32)

            def tree(pairs):
                sels = [jnp.where(i[p:p + 1, :] == cols, w_[p:p + 1, :], 0.0)
                        for i, w_ in pairs for p in range(P)]
                while len(sels) > 1:
                    sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
                return sels[0]
            we = tree([(ie, wt) for ie, wt, _, _ in entries])
            wo = tree([(io, wt) for _, _, io, wt in entries])
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue

        def body(t, accs, ll=ll, entries=entries, base_w=base_w,
                 ve_ref=ve_ref, vo_ref=vo_ref, s_l=s_l):
            acc_e, acc_o = accs
            s0 = pl.multiple_of(base_w + t * s_l, 8)
            vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
            vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_l), :]
            cols = iotas[s_l] + s0.astype(f32)
            we_ref[0:s_l, :] = jnp.zeros((s_l, Qt), we_ref.dtype)
            wo_ref[0:s_l, :] = jnp.zeros((s_l, Qt), wo_ref.dtype)
            zero = jnp.zeros((), we_ref.dtype)
            for ide, wte, ido, wto in entries:
                for p in range(P):
                    we_ref[0:s_l, :] += jnp.where(ide[p:p + 1, :] == cols,
                                                  wte[p:p + 1, :], zero)
                    wo_ref[0:s_l, :] += jnp.where(ido[p:p + 1, :] == cols,
                                                  wto[p:p + 1, :], zero)
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we_ref[0:s_l, :].astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo_ref[0:s_l, :].astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_e, acc_o

        acc_e, acc_o = jax.lax.fori_loop(0, num_t, body, (acc_e, acc_o))
    out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 11, 12, 13, 14, 15, 16))
def _call_ml(spatial_shapes, value_e, value_o, rx, ry, cx, cy, tx, ty, ca,
             ta, q_tile, s_tiles, T, rule, max_s, win1=False):
    TM, S_pad, Dd = value_e.shape
    Mh = TM // T
    F = 1 + mp._rule_window(rule, T)
    L = len(spatial_shapes)
    nqt = rx.shape[1]
    q_pad = nqt * q_tile
    Pp = cx.shape[2] // (Mh * L)
    ranges = _ranges_ml(rx, ry, cx, cy, tx, ty, spatial_shapes, F, q_tile,
                        s_tiles, Mh)
    level_starts, _ = _starts_ml(spatial_shapes, s_tiles)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    Lf = F * L
    ranges_spec = pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)

    def _value_spec(j):
        if j == 0:
            return pl.BlockSpec((1, S_pad, Dd), lambda bm, qt: (bm, 0, 0),
                                memory_space=pltpu.VMEM)

        def index_map(bm, qt, j=j - 1):
            t = bm // Mh
            f = mp._temporal_frame_expr(rule, j, t, T)
            return (f * Mh + bm % Mh, 0, 0)
        return pl.BlockSpec((1, S_pad, Dd), index_map,
                            memory_space=pltpu.VMEM)

    def row_spec(rows):
        return pl.BlockSpec((1, 1, rows, q_tile),
                            lambda bm, qt: (bm // Mh, qt, bm % Mh, 0),
                            memory_space=pltpu.VMEM)

    ref_spec = pl.BlockSpec((1, 1, L, q_tile),
                            lambda bm, qt: (bm // Mh, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_ml, spatial_shapes=spatial_shapes,
                               level_starts=level_starts, s_tiles=s_tiles,
                               P=Pp, acc_dtype=acc_dtype, F=F, win1=win1)
    specs = [_value_spec(j) for j in range(F)]
    W = F - 1
    out = pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ranges_spec] + specs + specs
        + [ref_spec, ref_spec,
           row_spec(L * Pp), row_spec(L * Pp),
           row_spec(W * L * Pp), row_spec(W * L * Pp),
           row_spec(L * Pp), row_spec(W * L * Pp)],
        out_specs=pl.BlockSpec((1, 1, Dd, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, Dd, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((max_s, q_tile), jnp.float32),
                        pltpu.VMEM((max_s, q_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=mp._interpret(),
    )(ranges, *([value_e] * F), *([value_o] * F), rx, ry, cx, cy, tx, ty,
      ca, ta)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(TM, Dd, q_pad)


def run_pltile(ops, s_tiles, reps=3, n=10, win1=False):
    value, shapes, rx, ry, cx, cy, tx, ty, ca, ta, Q = ops
    Tn, S, Mh, Dd = value.shape
    s_tiles = tuple(s_tiles)

    def fn(value, rx, ry, cx, cy, tx, ty, ca, ta):
        value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(Tn * Mh, S, Dd)
        value_e, value_o = _pack_levels_ml(value_bm, shapes, s_tiles)
        return _call_ml(shapes, value_e, value_o, rx, ry, cx, cy, tx, ty,
                        ca, ta, mp.Q_TILE, s_tiles, Tn, RULE, max(s_tiles),
                        win1)

    jf = jax.jit(fn)
    args = (value, rx, ry, cx, cy, tx, ty, ca, ta)
    out = jf(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jf(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    name = ("w1-" if win1 else "") + "pltile" + "/".join(str(s) for s in s_tiles)
    print(f"{name:22s}: {best * 1000:6.2f} ms", flush=True)
    return best, out


# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------

def _kernel(ranges_ref, *refs, spatial_shapes, level_starts, s_tile, P,
            acc_dtype, F, mode):
    ve_refs = refs[:F]
    vo_refs = refs[F:2 * F]
    (rx_ref, ry_ref, cx_ref, cy_ref, tx_ref, ty_ref, ca_ref, ta_ref,
     out_ref, we_ref, wo_ref, tl_ref) = refs[2 * F:]
    L = len(spatial_shapes)
    D = out_ref.shape[-2]
    Qt = out_ref.shape[-1]
    f32 = jnp.float32
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (s_tile, Qt), 0).astype(f32)

    cl = ca_ref[0, 0].astype(f32)
    tl = ta_ref[0, 0].astype(f32)
    mx = jnp.maximum(jnp.max(cl, axis=0, keepdims=True),
                     jnp.max(tl, axis=0, keepdims=True))
    ec = jnp.exp(cl - mx)
    et = jnp.exp(tl - mx)
    inv = 1.0 / (jnp.sum(ec, axis=0, keepdims=True)
                 + jnp.sum(et, axis=0, keepdims=True))
    att_c = ec * inv
    att_t = et * inv

    if mode == "batched":
        # ---- full-tile tap generation for ALL F*L levels at once ----
        W = F - 1
        w_c = jnp.concatenate([jnp.full((P, 1), float(w), f32)
                               for _, w in spatial_shapes], 0)   # (L·P, 1)
        h_c = jnp.concatenate([jnp.full((P, 1), float(h), f32)
                               for h, _ in spatial_shapes], 0)
        w_t = jnp.concatenate([w_c] * W, 0)                      # (W·L·P, 1)
        h_t = jnp.concatenate([h_c] * W, 0)
        rx_l = rx_ref[0, 0].astype(f32)                      # (L, Qt)
        ry_l = ry_ref[0, 0].astype(f32)
        rx_rep = jnp.concatenate(
            [jnp.broadcast_to(rx_l[l:l + 1], (P, Qt)) for l in range(L)], 0)
        ry_rep = jnp.concatenate(
            [jnp.broadcast_to(ry_l[l:l + 1], (P, Qt)) for l in range(L)], 0)
        rx0 = jnp.broadcast_to(rx_l[0:1], (W * L * P, Qt))
        ry0 = jnp.broadcast_to(ry_l[0:1], (W * L * P, Qt))
        # x = lx*w - 0.5 with lx = r + off/w  =>  x = r*w + off - 0.5
        x_c = rx_rep * w_c + cx_ref[0, 0].astype(f32) - 0.5
        y_c = ry_rep * h_c + cy_ref[0, 0].astype(f32) - 0.5
        x_t = rx0 * w_t + tx_ref[0, 0].astype(f32) - 0.5
        y_t = ry0 * h_t + ty_ref[0, 0].astype(f32) - 0.5
        x = jnp.concatenate([x_c, x_t], 0)                   # (F·L·P, Qt)
        y = jnp.concatenate([y_c, y_t], 0)
        at = jnp.concatenate([att_c, att_t], 0)
        wr = jnp.concatenate([w_c, w_t], 0)                  # (F·L·P, 1)
        hr = jnp.concatenate([h_c, h_t], 0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0
        one = jnp.float32(1.0)
        vx0 = (x0 >= 0) & (x0 <= wr - 1)
        vx1 = (x0 >= -1) & (x0 <= wr - 2)
        ents = []
        for y_row, wy in ((y0, 1 - dy), (y0 + 1, dy)):
            vy = (y_row >= 0) & (y_row <= hr - 1)
            wl = wy * (1 - dx) * at * jnp.where(vy & vx0, one, 0.0)
            wrt = wy * dx * at * jnp.where(vy & vx1, one, 0.0)
            base = y_row * wr + x0
            m_l = jnp.floor(base * 0.5)
            m_r = jnp.floor((base + 1) * 0.5)
            even = (base - 2.0 * m_l) == 0
            ents.append((jnp.where(even, m_l, m_r), jnp.where(even, wl, wrt),
                         jnp.where(even, m_r, m_l), jnp.where(even, wrt, wl)))

    if mode == "when2":
        # Phase 1: win1-style straight-line window-0 for every level (SSA
        # accumulators, zero control-flow regions). Phase 2: per-level tail
        # regions that are fully SELF-CONTAINED — they re-read logits/offsets
        # from the operand refs and recompute entries inside, so nothing is
        # live across a region boundary and an untaken region should cost
        # only its branch.
        LP = L * P
        # park the softmax in scratch so NOTHING (SSA) is live across the
        # phase-2 regions: tails re-read attention rows from here
        tl_ref[0:LP, :] = att_c
        tl_ref[LP:LP + (F - 1) * LP, :] = att_t
        acc_e = jnp.zeros((D, Qt), f32)
        acc_o = jnp.zeros((D, Qt), f32)

        def lvl_rows(lvl):
            ll = lvl % L
            h, w = spatial_shapes[ll]
            at = tl_ref[lvl * P:(lvl + 1) * P, :]
            if lvl < L:
                offx = cx_ref[0, 0, ll * P:(ll + 1) * P, :].astype(f32)
                offy = cy_ref[0, 0, ll * P:(ll + 1) * P, :].astype(f32)
                rxl = rx_ref[0, 0, ll:ll + 1, :]
                ryl = ry_ref[0, 0, ll:ll + 1, :]
            else:
                k = lvl - L
                offx = tx_ref[0, 0, k * P:(k + 1) * P, :].astype(f32)
                offy = ty_ref[0, 0, k * P:(k + 1) * P, :].astype(f32)
                rxl = rx_ref[0, 0, 0:1, :]
                ryl = ry_ref[0, 0, 0:1, :]
            lx = rxl + offx * np.float32(1.0 / w)
            ly = ryl + offy * np.float32(1.0 / h)
            return mp._level_entries(lx, ly, at, h, w)

        def tree(pairs, cols):
            sels = [jnp.where(i[p:p + 1, :] == cols, w_[p:p + 1, :], 0.0)
                    for i, w_ in pairs for p in range(P)]
            while len(sels) > 1:
                sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
            return sels[0]

        for lvl in range(F * L):
            ll = lvl % L
            entries = lvl_rows(lvl)
            base_w = ranges_ref[0, 0, lvl, 0]
            s0 = pl.multiple_of(base_w, 8)
            vte = ve_refs[lvl // L][0,
                                    pl.ds(level_starts[ll] + s0, s_tile), :]
            vto = vo_refs[lvl // L][0,
                                    pl.ds(level_starts[ll] + s0, s_tile), :]
            cols = rows0 + s0.astype(f32)
            we = tree([(ie, wt) for ie, wt, _, _ in entries], cols)
            wo = tree([(io, wt) for _, _, io, wt in entries], cols)
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # park phase-1 result; phase-2 regions accumulate on top of it
        out_ref[0, 0] = (acc_e + acc_o).astype(out_ref.dtype)

        for lvl in range(F * L):
            num_t = ranges_ref[0, 0, lvl, 1]

            @pl.when(num_t > 1)
            def _tail(lvl=lvl):
                ll = lvl % L
                entries = lvl_rows(lvl)       # recomputed only when taken
                base_w = ranges_ref[0, 0, lvl, 0]
                nt = ranges_ref[0, 0, lvl, 1]
                rows0_i = jax.lax.broadcasted_iota(
                    jnp.int32, (s_tile, Qt), 0).astype(f32)

                def body(t, carry):
                    s0 = pl.multiple_of(base_w + t * s_tile, 8)
                    vte = ve_refs[lvl // L][
                        0, pl.ds(level_starts[ll] + s0, s_tile), :]
                    vto = vo_refs[lvl // L][
                        0, pl.ds(level_starts[ll] + s0, s_tile), :]
                    cols = rows0_i + s0.astype(f32)
                    we_ref[:] = jnp.zeros_like(we_ref)
                    wo_ref[:] = jnp.zeros_like(wo_ref)
                    zero = jnp.zeros((), we_ref.dtype)
                    for ide, wte, ido, wto in entries:
                        for p in range(P):
                            we_ref[:] += jnp.where(
                                ide[p:p + 1, :] == cols,
                                wte[p:p + 1, :], zero)
                            wo_ref[:] += jnp.where(
                                ido[p:p + 1, :] == cols,
                                wto[p:p + 1, :], zero)
                    out_ref[0, 0] += (jax.lax.dot_general(
                        vte.astype(acc_dtype), we_ref[:].astype(acc_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                        vto.astype(acc_dtype), wo_ref[:].astype(acc_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)).astype(
                            out_ref.dtype)
                    return carry
                jax.lax.fori_loop(1, nt, body, 0)
        return

    acc_e = jnp.zeros((D, Qt), f32)
    acc_o = jnp.zeros((D, Qt), f32)
    if mode == "when":
        tl_ref[0:D, :] = jnp.zeros((D, Qt), tl_ref.dtype)
    for lvl in range(F * L):
        ll = lvl % L
        h, w = spatial_shapes[ll]
        ve_ref = ve_refs[lvl // L]
        vo_ref = vo_refs[lvl // L]
        if mode == "when":
            # EXACT fast form: window 0 straight-line into SSA accumulators
            # (the common case — no loop region, no carried values); the
            # rare multi-window tail accumulates into a side-effect scratch
            # under pl.when, so untaken regions carry nothing.
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
                rxl = rx_ref[0, 0, 0:1, :]
                ryl = ry_ref[0, 0, 0:1, :]
            lx = rxl + offx * np.float32(1.0 / w)
            ly = ryl + offy * np.float32(1.0 / h)
            entries = mp._level_entries(lx, ly, at, h, w)
            base_w = ranges_ref[0, 0, lvl, 0]
            num_t = ranges_ref[0, 0, lvl, 1]

            def tree(pairs, cols):
                sels = [jnp.where(i[p:p + 1, :] == cols, w_[p:p + 1, :], 0.0)
                        for i, w_ in pairs for p in range(P)]
                while len(sels) > 1:
                    sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
                return sels[0]

            s0 = pl.multiple_of(base_w, 8)
            vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            cols = rows0 + s0.astype(f32)
            we = tree([(ie, wt) for ie, wt, _, _ in entries], cols)
            wo = tree([(io, wt) for _, _, io, wt in entries], cols)
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(num_t > 1)
            def _tail(ll=ll, entries=entries, base_w=base_w, num_t=num_t,
                      ve_ref=ve_ref, vo_ref=vo_ref):
                def body(t, carry):
                    s0 = pl.multiple_of(base_w + t * s_tile, 8)
                    vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                    vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                    cols = rows0 + s0.astype(f32)
                    we_ref[:] = jnp.zeros_like(we_ref)
                    wo_ref[:] = jnp.zeros_like(wo_ref)
                    zero = jnp.zeros((), we_ref.dtype)
                    for ide, wte, ido, wto in entries:
                        for p in range(P):
                            we_ref[:] += jnp.where(ide[p:p + 1, :] == cols,
                                                   wte[p:p + 1, :], zero)
                            wo_ref[:] += jnp.where(ido[p:p + 1, :] == cols,
                                                   wto[p:p + 1, :], zero)
                    tl_ref[0:D, :] += (jax.lax.dot_general(
                        vte.astype(acc_dtype), we_ref[:].astype(acc_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                        vto.astype(acc_dtype), wo_ref[:].astype(acc_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    return carry
                jax.lax.fori_loop(1, num_t, body, 0)
            continue
        if mode == "batched":
            sl = slice(lvl * P, (lvl + 1) * P)
            entries = [(ie[sl], we[sl], io[sl], wo[sl])
                       for ie, we, io, wo in ents]
        elif mode == "noentries":
            # static plausible entries: point p hits packed row p (weights
            # from att so the softmax isn't dead)
            if lvl < L:
                at = att_c[ll * P:(ll + 1) * P, :]
            else:
                at = att_t[(lvl - L) * P:(lvl - L + 1) * P, :]
            const = at * 0.0
            entries = [(const, at, const + 1.0, at),
                       (const + 2.0, at, const + 3.0, at)]
        else:
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
                rxl = rx_ref[0, 0, 0:1, :]
                ryl = ry_ref[0, 0, 0:1, :]
            lx = rxl + offx * np.float32(1.0 / w)
            ly = ryl + offy * np.float32(1.0 / h)
            entries = mp._level_entries(lx, ly, at, h, w)
        base_w = ranges_ref[0, 0, lvl, 0]
        num_t = ranges_ref[0, 0, lvl, 1]

        if mode in ("win1", "win1s"):
            # CEILING PROBES (not exact): win1 assumes num_t==1 everywhere
            # (drops the tail fori region entirely); win1s additionally uses
            # STATIC value slices (level start, ignoring the range base) to
            # price the dynamic-slice overhead. Output is wrong whenever the
            # real range differs — timing only.
            def tree(pairs, cols):
                sels = [jnp.where(i[p:p + 1, :] == cols, w[p:p + 1, :], 0.0)
                        for i, w in pairs for p in range(P)]
                while len(sels) > 1:
                    sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
                return sels[0]
            if mode == "win1s":
                vte = ve_ref[0, level_starts[ll]:level_starts[ll] + s_tile, :]
                vto = vo_ref[0, level_starts[ll]:level_starts[ll] + s_tile, :]
                cols = rows0
            else:
                s0 = pl.multiple_of(base_w, 8)
                vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                cols = rows0 + s0.astype(f32)
            we = tree([(ie, wt) for ie, wt, _, _ in entries], cols)
            wo = tree([(io, wt) for _, _, io, wt in entries], cols)
            acc_e = acc_e + jax.lax.dot_general(
                vte.astype(acc_dtype), we.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_o = acc_o + jax.lax.dot_general(
                vto.astype(acc_dtype), wo.astype(acc_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue

        if mode == "straight":
            # Window 0 as straight-line SSA code (no fori region, no scratch)
            # — the common case is num_t == 1, and keeping all 24 levels'
            # W-builds and dots in ONE instruction stream lets the scheduler
            # run level l+1's VPU select-tree under level l's MXU matmul.
            # When num_t == 0 every entry weight is 0 ⇒ W = 0 ⇒ no-op dot.
            def tree(pairs, cols):
                sels = [jnp.where(i[p:p + 1, :] == cols, w[p:p + 1, :], 0.0)
                        for i, w in pairs for p in range(P)]
                while len(sels) > 1:
                    sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
                return sels[0]

            def window(s0, acc_e, acc_o, ll=ll, entries=entries,
                       ve_ref=ve_ref, vo_ref=vo_ref):
                vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
                cols = rows0 + s0.astype(f32)
                we = tree([(ie, wt) for ie, wt, _, _ in entries], cols)
                wo = tree([(io, wt) for _, _, io, wt in entries], cols)
                acc_e = acc_e + jax.lax.dot_general(
                    vte.astype(acc_dtype), we.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_o = acc_o + jax.lax.dot_general(
                    vto.astype(acc_dtype), wo.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_e, acc_o

            s0 = pl.multiple_of(base_w, 8)
            acc_e, acc_o = window(s0, acc_e, acc_o)

            def tail(t, accs):
                s0 = pl.multiple_of(base_w + t * s_tile, 8)
                return window(s0, *accs)
            acc_e, acc_o = jax.lax.fori_loop(1, num_t, tail, (acc_e, acc_o))
            continue

        def body(t, accs, ll=ll, entries=entries, base_w=base_w,
                 ve_ref=ve_ref, vo_ref=vo_ref):
            acc_e, acc_o = accs
            s0 = pl.multiple_of(base_w + t * s_tile, 8)
            vte = ve_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            vto = vo_ref[0, pl.ds(level_starts[ll] + s0, s_tile), :]
            cols = rows0 + s0.astype(f32)
            if mode == "tree":
                # SSA select-tree: 8 independent selects per parity combined
                # in a binary tree — no serialized scratch-ref accumulation
                def tree(pairs):
                    sels = [jnp.where(i[p:p + 1, :] == cols, w[p:p + 1, :],
                                      0.0)
                            for i, w in pairs for p in range(P)]
                    while len(sels) > 1:
                        sels = [a + b for a, b in zip(sels[0::2], sels[1::2])]
                    return sels[0]
                we = tree([(ide, wte) for ide, wte, _, _ in entries])
                wo = tree([(ido, wto) for _, _, ido, wto in entries])
                acc_e = acc_e + jax.lax.dot_general(
                    vte.astype(acc_dtype), we.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_o = acc_o + jax.lax.dot_general(
                    vto.astype(acc_dtype), wo.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_e, acc_o
            if mode == "bf16rel":
                # Entire W-build in bf16 on WINDOW-RELATIVE indices:
                # rel = idx - s0 is exact in bf16 iff it's an integer in
                # [-256, 256]; in-window taps (rel in [0, s)) compare exact,
                # out-of-window values round to integers outside [0, s) and
                # can never equal a lane of the bf16 iota. Halves VPU op
                # slots and W-tile VMEM traffic vs the f32 build.
                bf = jnp.bfloat16
                colsb = rows0.astype(bf)          # 0..s_tile-1 exact
                s0f = s0.astype(f32)
                zero = jnp.zeros((), bf)
                we_ref[:] = jnp.zeros_like(we_ref)
                wo_ref[:] = jnp.zeros_like(wo_ref)
                for ide, wte, ido, wto in entries:
                    for p in range(P):
                        ree = (ide[p:p + 1, :] - s0f).astype(bf)
                        reo = (ido[p:p + 1, :] - s0f).astype(bf)
                        we_ref[:] += jnp.where(ree == colsb,
                                               wte[p:p + 1, :].astype(bf),
                                               zero)
                        wo_ref[:] += jnp.where(reo == colsb,
                                               wto[p:p + 1, :].astype(bf),
                                               zero)
            elif mode != "nowbuild":
                we_ref[:] = jnp.zeros_like(we_ref)
                wo_ref[:] = jnp.zeros_like(wo_ref)
                zero = jnp.zeros((), we_ref.dtype)
                wdt = we_ref.dtype
                for ide, wte, ido, wto in entries:
                    for p in range(P):
                        we_ref[:] += jnp.where(ide[p:p + 1, :] == cols,
                                               wte[p:p + 1, :].astype(wdt),
                                               zero)
                        wo_ref[:] += jnp.where(ido[p:p + 1, :] == cols,
                                               wto[p:p + 1, :].astype(wdt),
                                               zero)
            if mode == "nomxu":
                acc_e = acc_e + we_ref[:D, :]
                acc_o = acc_o + wo_ref[:D, :]
            else:
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
    acc = acc_e + acc_o
    if mode == "when":
        acc = acc + tl_ref[0:D, :]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


# --------------------------------------------------------------------------
# launcher (copy of _fwd_call_temporal_proj with pluggable kernel body)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 11, 12, 13, 14, 15))
def _call(spatial_shapes, value_e, value_o, rx, ry, cx, cy, tx, ty, ca, ta,
          q_tile, s_tile, T, rule, mode):
    TM, S_pad, Dd = value_e.shape
    Mh = TM // T
    F = 1 + mp._rule_window(rule, T)
    L = len(spatial_shapes)
    nqt = rx.shape[1]
    q_pad = nqt * q_tile
    Pp = cx.shape[2] // (Mh * L)
    ranges = mp._row_ranges_proj_pallas(rx, ry, cx, cy, tx, ty,
                                        spatial_shapes, F, q_tile, s_tile, Mh)
    level_starts, _ = mp._padded_level_starts(spatial_shapes, s_tile)
    acc_dtype = value_e.dtype if value_e.dtype == jnp.bfloat16 \
        else jnp.float32
    Lf = F * L
    ranges_spec = pl.BlockSpec((1, 1, Lf, 2), lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.SMEM)

    def _value_spec(j):
        if j == 0:
            return pl.BlockSpec((1, S_pad, Dd), lambda bm, qt: (bm, 0, 0),
                                memory_space=pltpu.VMEM)

        def index_map(bm, qt, j=j - 1):
            t = bm // Mh
            f = mp._temporal_frame_expr(rule, j, t, T)
            return (f * Mh + bm % Mh, 0, 0)
        return pl.BlockSpec((1, S_pad, Dd), index_map,
                            memory_space=pltpu.VMEM)

    def row_spec(rows):
        return pl.BlockSpec((1, 1, rows, q_tile),
                            lambda bm, qt: (bm // Mh, qt, bm % Mh, 0),
                            memory_space=pltpu.VMEM)

    ref_spec = pl.BlockSpec((1, 1, L, q_tile),
                            lambda bm, qt: (bm // Mh, qt, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, spatial_shapes=spatial_shapes,
                               level_starts=level_starts, s_tile=s_tile,
                               P=Pp, acc_dtype=acc_dtype, F=F, mode=mode)
    specs = [_value_spec(j) for j in range(F)]
    W = F - 1
    out = pl.pallas_call(
        kernel,
        grid=(TM, nqt),
        in_specs=[ranges_spec] + specs + specs
        + [ref_spec, ref_spec,
           row_spec(L * Pp), row_spec(L * Pp),
           row_spec(W * L * Pp), row_spec(W * L * Pp),
           row_spec(L * Pp), row_spec(W * L * Pp)],
        out_specs=pl.BlockSpec((1, 1, Dd, q_tile),
                               lambda bm, qt: (bm, qt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, nqt, Dd, q_tile), value_e.dtype),
        scratch_shapes=[pltpu.VMEM((s_tile, q_tile),
                                   jnp.bfloat16 if mode in ("bf16w", "bf16rel")
                                   else jnp.float32),
                        pltpu.VMEM((s_tile, q_tile),
                                   jnp.bfloat16 if mode in ("bf16w", "bf16rel")
                                   else jnp.float32),
                        pltpu.VMEM((max(Dd, F * L * Pp), q_tile),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=mp._interpret(),
    )(ranges, *([value_e] * F), *([value_o] * F), rx, ry, cx, cy, tx, ty,
      ca, ta)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(TM, Dd, q_pad)


def run_variant(mode, ops, reps=3, n=10):
    value, shapes, rx, ry, cx, cy, tx, ty, ca, ta, Q = ops
    Tn, S, Mh, Dd = value.shape

    def fn(value, rx, ry, cx, cy, tx, ty, ca, ta):
        value_bm = jnp.transpose(value, (0, 2, 1, 3)).reshape(Tn * Mh, S, Dd)
        value_e, value_o = mp._pack_levels(value_bm, shapes, mp.S_TILE)
        return _call(shapes, value_e, value_o, rx, ry, cx, cy, tx, ty, ca,
                     ta, mp.Q_TILE, mp.S_TILE, Tn, RULE, mode)

    jf = jax.jit(fn)
    args = (value, rx, ry, cx, cy, tx, ty, ca, ta)
    out = jf(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jf(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{mode:10s}: {best * 1000:6.2f} ms", flush=True)
    return best, out


def main(variants):
    ops = make_operands()
    outs = {}
    for v in variants:
        if v.startswith("pl:"):
            parts = v[3:].split(",")
            win1 = parts[-1] == "w"
            s_tiles = tuple(int(s) for s in (parts[:-1] if win1 else parts))
            outs[v] = run_pltile(ops, s_tiles, win1=win1)
        else:
            outs[v] = run_variant(v, ops)
    base = outs.get("base")
    for v, (t, out) in outs.items():
        if base is None or v == "base" or v in ("noentries", "nowbuild",
                                                "nomxu"):
            continue
        a = np.asarray(base[1], np.float32)
        b = np.asarray(out, np.float32)
        print(f"{v} vs base max abs diff: {np.abs(a - b).max():.3e}")


if __name__ == "__main__":
    vs = sys.argv[1:] or ["base", "nowbuild", "noentries", "nomxu", "batched"]
    main(vs)
