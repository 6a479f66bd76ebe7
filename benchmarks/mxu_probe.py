"""MXU cost-model probe for the MSDA one-hot dots.

The encoder kernel issues, per (program=bm,qt), 24 levels x 2 parity dots of
(K=128, D=32)^T x (K=128, N=256). This probe times bare pallas kernels doing
the same dot pattern from VMEM-resident operands, sweeping how the dots are
shaped/merged, to learn what the MXU actually charges for:

  fill-bound?    fewer, taller-K dots win
  stream-bound?  cost ~ (K/128) * N regardless of merging
  issue-bound?   cost ~ n_dots

Usage: python benchmarks/mxu_probe.py
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

GRID = 912          # matches the encoder op (48 bm x 19 q-tiles)
D = 32


def probe(n_dots: int, K: int, N: int, dtype=jnp.bfloat16):
    def kernel(v_ref, w_ref, o_ref):
        acc = jnp.zeros((D, N), jnp.float32)
        for i in range(n_dots):
            acc = acc + jax.lax.dot_general(
                v_ref[:], w_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    v = jnp.ones((K, D), dtype)
    w = jnp.ones((K, N), dtype)
    fn = jax.jit(lambda v, w: pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((K, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((D, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, N), dtype),
    )(v, w))
    out = fn(v, w)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(v, w)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / 10)
    macs = GRID * n_dots * K * D * N
    cyc = best * 0.94e9 / GRID / n_dots
    print(f"dots={n_dots:3d} K={K:5d} N={N:3d}: {best * 1000:7.2f} ms "
          f"({cyc:6.0f} cyc/dot, {macs / best / 1e12:5.1f} TMAC/s)",
          flush=True)
    return best


if __name__ == "__main__":
    jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    probe(48, 128, 256)       # current shape: 24 levels x 2 parities
    probe(24, 256, 256)       # parity-merged along K
    probe(12, 512, 256)       # 2-level merged
    probe(2, 3072, 256)       # fully merged
    probe(48, 128, 128)       # N effect (half queries; x2 grid NOT applied)
    probe(96, 128, 256)       # 2x dots (span 2 windows everywhere)
    probe(48, 64, 256)        # short-K (small span levels)
    probe(48, 32, 256)        # shorter-K
