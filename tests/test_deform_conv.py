"""Modulated deformable conv parity vs a numpy oracle transcribing
torchvision.ops.deform_conv2d semantics (torchvision is not in the image, so
the oracle is a direct per-pixel transliteration of its bilinear rule)."""
import numpy as np

import jax.numpy as jnp

from devis_tpu.ops.deform_conv import deform_conv2d


def _oracle(x, offset, mask, weight, bias, padding=1):
    """x (B,H,W,Cin), offset (B,H,W,2KK) (y,x), mask (B,H,W,KK),
    weight (K,K,Cin,Cout)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    Cout = weight.shape[-1]
    out = np.zeros((B, H, W, Cout), np.float64)

    def bil(b, sy, sx):
        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
        dy, dx = sy - y0, sx - x0
        acc = np.zeros(Cin)
        for yy, wy in ((y0, 1 - dy), (y0 + 1, dy)):
            for xx, wx in ((x0, 1 - dx), (x0 + 1, dx)):
                if 0 <= yy < H and 0 <= xx < W:
                    acc += wy * wx * x[b, yy, xx]
        return acc

    for b in range(B):
        for i in range(H):
            for j in range(W):
                for k in range(K * K):
                    ky, kx = k // K, k % K
                    sy = i + ky - padding + offset[b, i, j, 2 * k]
                    sx = j + kx - padding + offset[b, i, j, 2 * k + 1]
                    v = bil(b, sy, sx) * mask[b, i, j, k]
                    out[b, i, j] += v @ weight[ky, kx]
    return out + bias


def test_deform_conv_vs_oracle(rng):
    B, H, W, Cin, Cout, K = 2, 7, 9, 5, 6, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = (rng.randn(B, H, W, 2 * K * K) * 1.5).astype(np.float32)
    mask = rng.rand(B, H, W, K * K).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = rng.randn(Cout).astype(np.float32)

    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(weight),
                                   jnp.asarray(bias)))
    want = _oracle(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deform_conv_onehot_matches_xla(rng):
    """The one-hot Pallas route (K×K MSDA gathers + channel mixes) must match
    the jnp-gather path exactly, for ANY offsets."""
    from devis_tpu.ops.deform_conv import deform_conv2d_onehot
    from devis_tpu.ops.ms_deform_attn import resolve_impl

    def dc(x, o, m, w, b, impl):
        if impl == "pallas":
            return deform_conv2d_onehot(x, o, m, w, b)
        from devis_tpu.ops.deform_conv import _deform_conv2d_xla
        return _deform_conv2d_xla(x, o, m, w, b)

    B, H, W, Cin, Cout, K = 2, 9, 11, 8, 6, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = (rng.randn(B, H, W, 2 * K * K) * 1.5).astype(np.float32)
    mask = rng.rand(B, H, W, K * K).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = rng.randn(Cout).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
    got = np.asarray(dc(*args, impl="pallas"))
    want = np.asarray(dc(*args, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deform_conv_dispatch_matches_xla_in_window(rng):
    """The default TPU dispatch (banded forward) matches the jnp-gather path
    for offsets inside the rebased candidate window."""
    from devis_tpu.ops.deform_conv import deform_conv2d as dc
    B, H, W, Cin, Cout, K = 2, 9, 11, 8, 6, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    offset = (rng.randn(B, H, W, 2 * K * K) * 0.6).clip(-0.9, 1.85) \
        .astype(np.float32)
    mask = rng.rand(B, H, W, K * K).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    bias = rng.randn(Cout).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
    got = np.asarray(dc(*args, impl="pallas"))
    want = np.asarray(dc(*args, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deform_conv_pallas_grad_matches_xla(rng):
    """Gradient parity of the Pallas route (U_k = x @ W_k einsum + rows-form
    MSDA custom VJP) against jax.grad of the jnp-gather route, w.r.t. every
    differentiable input (x, offset, mask, weight)."""
    import jax
    from devis_tpu.ops.deform_conv import deform_conv2d as dc
    B, H, W, Cin, Cout, K = 1, 7, 9, 8, 6, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    offset = jnp.asarray((rng.randn(B, H, W, 2 * K * K) * 1.5).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, K * K).astype(np.float32))
    weight = jnp.asarray((rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.randn(Cout).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, H, W, Cout).astype(np.float32))

    def loss(impl):
        return lambda xx, oo, mm, ww: jnp.sum(
            dc(xx, oo, mm, ww, bias, impl=impl) * cot)

    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for name, gp, gx in zip(("x", "offset", "mask", "weight"), g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets and unit modulation it must equal a plain 3x3 conv."""
    B, H, W, Cin, Cout, K = 1, 8, 8, 4, 3, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    weight = (rng.randn(K, K, Cin, Cout) * 0.3).astype(np.float32)
    bias = np.zeros(Cout, np.float32)
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    mask = np.ones((B, H, W, K * K), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(weight),
                                   jnp.asarray(bias)))
    import jax.lax as lax
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)
