"""Focused microbenchmark for the encoder hot kernel: the projection-fused
temporal MSDA op (`ms_deform_attn_temporal_proj`) at the YT-VIS bench shapes.

The full clip forward spends ~126 ms in 6 of these (one per encoder layer,
`docs/PERFORMANCE.md`), so per-op wall here is the number to cut. Operands
are generated in the pre-tiled head-slab layout exactly as `attention.py`'s
`_fused_rows` emits them (TransposedDense outputs), with realistic
locally-clustered sampling offsets.

Run on the real TPU:  python benchmarks/bench_encoder_kernel.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from devis_tpu.ops import ms_deform_attn_pallas as mp

ESHAPES = ((45, 80), (23, 40), (12, 20), (6, 10))
T, M, D, P = 6, 8, 32, 4
RULE = ("all",)


def make_operands(dtype=jnp.bfloat16):
    rs = np.random.RandomState(0)
    L = len(ESHAPES)
    S = sum(h * w for h, w in ESHAPES)
    Q = S                                    # encoder: one query per pixel
    W = T - 1
    q_tile = mp.Q_TILE
    q_pad = mp._round_up(Q, q_tile)
    nqt = q_pad // q_tile

    # per-level normalized reference grid (same as the transformer's
    # get_reference_points), padded queries carry -10
    refs = []
    for h, w in ESHAPES:
        yy, xx = np.meshgrid((np.arange(h) + .5) / h,
                             (np.arange(w) + .5) / w, indexing="ij")
        refs.append(np.stack([xx.ravel(), yy.ravel()], -1))
    ref = np.concatenate(refs)               # (Q, 2)
    ref = np.pad(ref, ((0, q_pad - Q), (0, 0)), constant_values=-10.0)
    # rx/ry: (T, nqt, L, q_tile) — every level carries the same point here
    rx = np.broadcast_to(ref[:, 0].reshape(1, nqt, 1, q_tile),
                         (T, nqt, L, q_tile)).astype(np.float32)
    ry = np.broadcast_to(ref[:, 1].reshape(1, nqt, 1, q_tile),
                         (T, nqt, L, q_tile)).astype(np.float32)

    # raw offsets in PIXELS of each level (the kernel divides by (w,h)):
    # small local spread like a trained model
    def offs(rows):
        return (rs.rand(T, nqt, rows, q_tile).astype(np.float32) - .5) * 4.0

    cx, cy = offs(M * L * P), offs(M * L * P)
    tx, ty = offs(M * W * L * P), offs(M * W * L * P)
    ca = rs.rand(T, nqt, M * L * P, q_tile).astype(np.float32)
    ta = rs.rand(T, nqt, M * W * L * P, q_tile).astype(np.float32)
    value = rs.rand(T, S, M, D).astype(np.float32)
    j = jnp.asarray
    return (j(value, dtype), tuple(ESHAPES), j(rx, dtype), j(ry, dtype),
            j(cx, dtype), j(cy, dtype), j(tx, dtype), j(ty, dtype),
            j(ca, dtype), j(ta, dtype), Q)


def main(reps=3, n=10):
    ops = make_operands()
    value, shapes, rx, ry, cx, cy, tx, ty, ca, ta, Q = ops

    fn = jax.jit(lambda *a: mp.ms_deform_attn_temporal_proj(
        a[0], shapes, *a[1:], n_queries=Q, rule=RULE, q_tile=mp.Q_TILE))
    args = (value, rx, ry, cx, cy, tx, ty, ca, ta)
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"out {out.shape} {out.dtype}", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"temporal_proj encoder op: {best * 1000:.2f} ms "
          f"(x6 layers = {best * 6000:.1f} ms/clip)")
    return best


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
