"""Microbenchmark: banded tent enumeration vs per-lane dynamic gather.

The banded deform-conv kernel's dominant cost is the ncand² tent FMA stage
(~144·Cout·N VPU ops per position set). If in-kernel `jnp.take_along_axis`
along lanes lowers to an efficient tpu.dynamic_gather, the stage shrinks to
4 gathers + 4 FMAs per position (2×2 bilinear, data-dependent indices) and
becomes EXACT for every tap inside the DMA window. This measures both on one
(Cout, N) block shape to decide.

Run on the real TPU:  python benchmarks/bench_tent_gather.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tent_kernel(u_ref, dy_ref, dx_ref, out_ref, *, ncand, Wp, N, reps):
    lo = (ncand - 1) // 2
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for r in range(reps):
        dy = dy_ref[0] + r * 1e-6
        dx = dx_ref[0]
        uls = [u_ref[:, lo + l:lo + l + ncand * Wp + N - Wp]
               for l in range(ncand)]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (l - lo)))
               for l in range(ncand)]
        for j in range(ncand):
            wyj = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (j - lo)))
            for l in range(ncand):
                w = wyj * wxs[l]
                acc = acc + w * uls[l][:, j * Wp:j * Wp + N]
    out_ref[:] = acc


def _gather_kernel(u_ref, dy_ref, dx_ref, out_ref, *, ncand, Wp, N, reps):
    lo = (ncand - 1) // 2
    C = out_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, N), 1)
    for r in range(reps):
        dy = dy_ref[0] + r * 1e-6
        dx = dx_ref[0]
        jy = jnp.floor(dy)
        jx = jnp.floor(dx)
        fy = dy - jy
        fx = dx - jx
        idx = (lanes + (jy.astype(jnp.int32) + lo) * Wp
               + jx.astype(jnp.int32) + 2 * lo)
        u = u_ref[:, :]
        for sy in (0, 1):
            for sx in (0, 1):
                sel = jnp.take_along_axis(
                    u, jnp.broadcast_to(idx + sy * Wp + sx, (C, N)), axis=1)
                wy = (1.0 - fy) if sy == 0 else fy
                wx = (1.0 - fx) if sx == 0 else fx
                acc = acc + (wy * wx) * sel
    out_ref[:] = acc


def run(kernel_fn, C, N, Wp, ncand, reps, name):
    NW = N + ncand * Wp
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(C, NW), jnp.float32)
    dy = jnp.asarray(rng.rand(1, N) * 2 - 1, jnp.float32)
    dx = jnp.asarray(rng.rand(1, N) * 2 - 1, jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel_fn, ncand=ncand, Wp=Wp, N=N, reps=reps),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    out = f(u, dy, dx)
    out.block_until_ready()
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = f(u, dy, dx)
    _ = np.asarray(out)[:1, :1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e6:.0f} us for {reps} position-sets "
          f"(C={C}, N={N})")
    return out


def main():
    import os
    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    C, Wp, ncand, reps = 16, 384, 4, 9
    N = 32 * Wp
    a = run(_tent_kernel, C, N, Wp, ncand, reps, "tent-enum ")
    b = run(_gather_kernel, C, N, Wp, ncand, reps, "lane-gather")
    print("parity max-abs:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
