"""Resize parity vs torch.nn.functional.interpolate (the reference's
pervasive resizing primitive). Ours is formulated as constant-matrix matmuls;
semantics must still match torch exactly."""
import numpy as np
import pytest

import jax.numpy as jnp

from devis_tpu.ops.interpolate import (downsample_mask, resize_bilinear,
                                       resize_nearest)

torch = pytest.importorskip("torch")
F = torch.nn.functional

CASES = [((7, 9), (14, 18)), ((14, 18), (7, 9)), ((5, 5), (13, 7)),
         ((24, 40), (360, 640)), ((45, 80), (12, 20)), ((8, 8), (8, 8))]


@pytest.mark.parametrize("in_hw,out_hw", CASES)
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=out_hw, mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", CASES)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=out_hw, mode="nearest") \
        .permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_downsample_mask_matches_torch(rng):
    mask = rng.rand(3, 37, 53) > 0.5
    got = np.asarray(downsample_mask(jnp.asarray(mask), (10, 14)))
    want = F.interpolate(torch.from_numpy(mask).float()[:, None],
                         size=(10, 14))[:, 0].bool().numpy()
    np.testing.assert_array_equal(got, want)


def test_extra_batch_dims(rng):
    x = rng.randn(2, 3, 9, 11, 4).astype(np.float32)     # (B, N, H, W, C)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (18, 22)))
    assert got.shape == (2, 3, 18, 22, 4)
    per = np.asarray(resize_bilinear(jnp.asarray(x[0]), (18, 22)))
    np.testing.assert_allclose(got[0], per, rtol=1e-6)
