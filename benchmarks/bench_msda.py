"""Microbenchmark: MSDeformAttn backends at DeVIS eval shapes (360×640, T=6).

Run on the real TPU:  python benchmarks/bench_msda.py
Prints per-op latency for the pallas kernel vs the XLA-gather fallback,
forward and backward, plus parity checks. Timing uses chained executions with
one final host readback (block_until_ready is unreliable through the axon
device tunnel).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from devis_tpu.ops import ms_deform_attn_pallas as mp
from devis_tpu.ops.ms_deform_attn import _ms_deform_attn_xla

ESHAPES = ((45, 80), (23, 40), (12, 20), (6, 10))   # stride 8/16/32/64 @360p
M, D, P = 8, 32, 4


def timed(name, fn, *args, n=5, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best * 1000:.2f} ms")
    return best


def local_locations(rs, Q, shapes, n_levels, spread=0.05):
    ref = []
    for h, w in ESHAPES:
        yy, xx = np.meshgrid((np.arange(h) + .5) / h, (np.arange(w) + .5) / w,
                             indexing="ij")
        ref.append(np.stack([xx.ravel(), yy.ravel()], -1))
    ref = np.concatenate(ref)[:Q]
    off = (rs.rand(Q, M, n_levels, P, 2) - .5) * spread
    return jnp.asarray((ref[:, None, None, None] + off)[None], jnp.float32)


def span_elements(loc, shapes, q_tile=None, s_tile=mp.S_TILE) -> int:
    """Total one-hot W-tile elements the kernel streams for these sampling
    locations — the kernel-health denominator (docs/PERFORMANCE.md
    §MSDeformAttn: time is weight-load bound, ∝ Σ span·q_tile over
    (batch·head, q-tile, level) triples).

    Numpy replica of the in-kernel range computation (`_ranges_kernel`):
    per level the live s-window spans the min/max PACKED raster row touched
    by any tap of the (head, q-tile) block, rounded to s_tile tiles."""
    loc = np.asarray(loc, np.float32)
    B, Q, M_, L, P_, _ = loc.shape
    q_tile = q_tile or (128 if Q <= 128 else mp.Q_TILE)
    n_qt = -(-Q // q_tile)
    total = 0
    for lvl in range(L):
        h, w = shapes[lvl]
        x = loc[..., lvl, :, 0] * w - 0.5            # (B, Q, M, P)
        y = loc[..., lvl, :, 1] * h - 0.5
        x0, y0 = np.floor(x), np.floor(y)
        valid = (x > -1) & (x < w) & (y > -1) & (y < h)
        lo = np.floor((np.clip(y0, 0, h - 1) * w
                       + np.clip(x0, 0, w - 1)) / 2)
        hi = np.floor((np.clip(y0 + 1, 0, h - 1) * w
                       + np.clip(x0 + 1, 0, w - 1)) / 2)
        lo = np.where(valid, lo, np.inf)
        hi = np.where(valid, hi, -1.0)
        for b in range(B):
            for m in range(M_):
                for qt in range(n_qt):
                    sl = slice(qt * q_tile, (qt + 1) * q_tile)
                    mn, mx = lo[b, sl, m].min(), hi[b, sl, m].max()
                    if mx < 0:
                        continue
                    base = (int(mn) // 8) * 8
                    tiles = (int(mx) - base) // s_tile + 1
                    total += tiles * s_tile * q_tile
    return total


def case(name, shapes, Q, value_dtype=jnp.bfloat16, bwd=False):
    rs = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rs.rand(1, S, M, D), value_dtype)
    loc = local_locations(rs, Q, shapes, L)
    att = jax.nn.softmax(jnp.asarray(rs.rand(1, Q, M, L * P), jnp.float32),
                         -1).reshape(1, Q, M, L, P)
    fp = jax.jit(lambda v: mp.ms_deform_attn_pallas(v, shapes, loc, att).sum())
    fx = jax.jit(lambda v: _ms_deform_attn_xla(v, shapes, loc, att).sum())
    tp = timed(f"{name} pallas fwd", fp, value)
    tx = timed(f"{name} xla fwd", fx, value)
    print(f"{name}: pallas {tx / tp:.1f}x faster fwd")
    # Kernel health: W-element streaming rate vs the MXU weight-load bound
    # (~128 elem/cycle ≈ 190 Gelem/s at the v5e clock). Regressions show
    # here even when useful-MFU (a formulation property) doesn't move.
    elems = span_elements(loc, shapes)
    rate = elems / tp / 1e9
    print(f"{name}: kernel-health {elems / 1e6:.0f} M W-elems, "
          f"{rate:.0f} Gelem/s ({rate / 190 * 100:.0f}% of weight-load "
          "bound)")
    if bwd:
        gp = jax.jit(jax.grad(lambda v: fp(v)))
        gx = jax.jit(jax.grad(lambda v: fx(v)))
        tbp = timed(f"{name} pallas bwd", gp, value)
        tbx = timed(f"{name} xla bwd", gx, value)
        print(f"{name}: pallas {tbx / tbp:.1f}x faster bwd")


def parity():
    rs = np.random.RandomState(1)
    shapes = ((12, 16), (6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, Q, L = 2, 50, len(shapes)
    value = jnp.asarray(rs.rand(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rs.rand(B, Q, M, L, P, 2) * 1.2 - 0.1, jnp.float32)
    att = jax.nn.softmax(jnp.asarray(rs.rand(B, Q, M, L * P), jnp.float32)
                         ).reshape(B, Q, M, L, P)
    op = np.asarray(mp.ms_deform_attn_pallas(value, shapes, loc, att))
    ox = np.asarray(_ms_deform_attn_xla(value, shapes, loc, att))
    print("fwd parity (max abs):", np.abs(op - ox).max())
    gp = jax.grad(lambda v: (mp.ms_deform_attn_pallas(v, shapes, loc, att)
                             ** 2).sum())(value)
    gx = jax.grad(lambda v: (_ms_deform_attn_xla(v, shapes, loc, att)
                             ** 2).sum())(value)
    print("grad_value parity (max abs):", float(jnp.abs(gp - gx).max()))


if __name__ == "__main__":
    jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    parity()
    S1 = sum(h * w for h, w in ESHAPES)
    case("encoder-current  (L=4,  Q=S)", ESHAPES, S1, bwd=True)
    case("encoder-temporal (L=20, Q=S)", ESHAPES * 5, S1)
    case("decoder          (L=4,  Q=360)", ESHAPES, 360)
