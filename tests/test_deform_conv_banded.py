"""Banded deformable-conv kernel parity vs the jnp-gather oracle (CPU
interpret mode; the same cases are exercised on real TPU hardware — see
docs/PERFORMANCE.md)."""
import numpy as np

import jax.numpy as jnp

from devis_tpu.ops.deform_conv import _deform_conv2d_xla
from devis_tpu.ops.deform_conv_banded import deform_conv2d_banded


def _case(rng, B, H, W, Cin, Cout, off_scale, K=3):
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = (rng.randn(B, H, W, 2 * K * K) * off_scale) \
        .clip(-3.9, 3.9).astype(np.float32)
    mask = rng.rand(B, H, W, K * K).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = rng.randn(Cout).astype(np.float32)
    return tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))


def test_banded_matches_oracle_random_offsets(rng):
    args = _case(rng, 2, 30, 46, 8, 4, off_scale=1.5)
    got = np.asarray(deform_conv2d_banded(*args))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_matches_oracle_zero_offsets(rng):
    args = _case(rng, 1, 8, 8, 4, 3, off_scale=0.0)
    got = np.asarray(deform_conv2d_banded(*args))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_near_band_limit(rng):
    """Offsets right at the band edge (|Δ| < band) stay exact."""
    args = _case(rng, 1, 12, 18, 4, 4, off_scale=3.0)
    got = np.asarray(deform_conv2d_banded(*args))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_multirow_blocks(rng):
    """H larger than the row block exercises the halo'd block DMA path."""
    args = _case(rng, 1, 70, 30, 6, 5, off_scale=2.0)
    got = np.asarray(deform_conv2d_banded(*args, row_block=16))
    want = np.asarray(_deform_conv2d_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_banded_out_of_band_taps_drop(rng):
    """Offsets beyond the band are DROPPED (documented deviation): the result
    must equal the oracle evaluated with those taps' weights zeroed."""
    B, H, W, Cin, Cout, K = 1, 10, 14, 4, 3, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    offset[:, 5, 7, 0] = 6.5          # position 0 y-offset far out of band
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
