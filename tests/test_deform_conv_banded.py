"""Rebased-window deformable-conv kernel parity vs the jnp-gather oracle
(CPU interpret mode; the same cases are exercised on real TPU hardware —
see docs/PERFORMANCE.md). The kernel is exact when each position's offsets
stay within the candidate window around the per-instance mean y-offset
(rows are rebased; columns use the static window alone)."""
import numpy as np

import jax
import jax.numpy as jnp

from devis_tpu.ops.deform_conv import _deform_conv2d_xla
from devis_tpu.ops.deform_conv_banded import deform_conv2d_banded


def _case(rng, B, H, W, Cin, Cout, scale, shift_y=0.0, lo=0.9, hi=1.85, K=3):
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    offset[..., 0::2] = shift_y + (rng.randn(B, H, W, K * K)
                                   * scale).clip(-lo, hi)
    offset[..., 1::2] = (rng.randn(B, H, W, K * K) * scale).clip(-lo, hi)
    mask = rng.rand(B, H, W, K * K).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = rng.randn(Cout).astype(np.float32)
    return tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))


def test_banded_matches_oracle_random_offsets(rng):
    args = _case(rng, 2, 30, 46, 8, 4, scale=0.6)
    got = np.asarray(deform_conv2d_banded(*args))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_zero_offsets(rng):
    args = _case(rng, 1, 8, 8, 4, 3, scale=0.0)
    got = np.asarray(deform_conv2d_banded(*args))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_large_mean_y_offset_rebased(rng):
    """Large shared y-offsets are absorbed by the per-instance row rebase."""
    for shift in (5.0, -7.0):
        args = _case(rng, 1, 16, 20, 4, 3, scale=0.5, shift_y=shift)
        got = np.asarray(deform_conv2d_banded(*args))
        want = np.asarray(_deform_conv2d_xla(*args))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_wider_window_ncand6(rng):
    """ncand=6 covers residuals in [-2, 3)."""
    args = _case(rng, 1, 12, 18, 4, 4, scale=1.2, lo=1.9, hi=2.85)
    got = np.asarray(deform_conv2d_banded(*args, ncand=6))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_multirow_blocks(rng):
    """H larger than the row block exercises the halo'd block DMA path."""
    args = _case(rng, 1, 70, 30, 6, 5, scale=0.6)
    got = np.asarray(deform_conv2d_banded(*args, row_block=16))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_out_of_window_taps_drop(rng):
    """Offsets beyond the candidate window are DROPPED (documented
    deviation): the result equals the oracle with those taps zeroed."""
    B, H, W, Cin, Cout, K = 1, 10, 14, 4, 3, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    offset[:, 5, 7, 1] = 6.5          # position 0 x-offset far out of window
    mask = np.ones((B, H, W, K * K), np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = np.zeros(Cout, np.float32)
    got = np.asarray(deform_conv2d_banded(*map(jnp.asarray,
                                               (x, offset, mask, weight, bias))))
    mask_dropped = mask.copy()
    mask_dropped[:, 5, 7, 0] = 0.0    # oracle with that tap masked
    want = np.asarray(_deform_conv2d_xla(*map(jnp.asarray,
                                              (x, offset, mask_dropped,
                                               weight, bias))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_matches_unfused_banded(rng):
    """The fully-fused DCNv2 kernel (in-kernel field convs) must reproduce
    the composition XLA-field-convs → banded kernel exactly, and its VJP
    must match the differentiable reference composition."""
    from devis_tpu.ops.deform_conv import (conv2d_nhwc,
                                           modulated_deform_conv2d)
    B, H, W, Cin, Cout, K = 2, 20, 30, 8, 5, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    # field magnitudes kept in-band so the banded forward is EXACT and the
    # fused loss equals the reference-composition loss (out-of-band tap
    # dropping is covered separately above)
    w_off = jnp.asarray(rng.randn(K, K, Cin, 2 * K * K) * 0.01, jnp.float32)
    b_off = jnp.asarray(rng.randn(2 * K * K) * 0.15, jnp.float32)
    w_mod = jnp.asarray(rng.randn(K, K, Cin, K * K) * 0.05, jnp.float32)
    b_mod = jnp.asarray(rng.randn(K * K) * 0.3, jnp.float32)
    weight = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32)
    out = modulated_deform_conv2d(x, w_off, b_off, w_mod, b_mod, weight,
                                  bias, 1)
    offset = conv2d_nhwc(x, w_off, b_off, 1)
    mod = 2.0 * jax.nn.sigmoid(conv2d_nhwc(x, w_mod, b_mod, 1))
    want = deform_conv2d_banded(x, offset, mod, weight, bias, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    args = (x, w_off, b_off, w_mod, b_mod, weight, bias)

    def loss(*a):
        return jnp.sum(modulated_deform_conv2d(*a, 1) ** 2)

    def loss_ref(x, w_off, b_off, w_mod, b_mod, weight, bias):
        # the exact composition the VJP differentiates (route-vs-route grad
        # parity pallas/xla is covered in test_deform_conv.py)
        from devis_tpu.ops.deform_conv import _deform_conv2d_pallas
        offset = conv2d_nhwc(x, w_off, b_off, 1)
        mod = 2.0 * jax.nn.sigmoid(conv2d_nhwc(x, w_mod, b_mod, 1))
        return jnp.sum(_deform_conv2d_pallas(x, offset, mod, weight, bias, 1)
                       ** 2)

    g = jax.grad(loss, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5 * float(
                                       jnp.max(jnp.abs(b))))
