"""Rebased-window deformable-conv kernel parity vs the jnp-gather oracle
(CPU interpret mode; the same cases are exercised on real TPU hardware —
see docs/PERFORMANCE.md). The kernel is exact when each position's offsets
stay within the candidate window around the per-instance mean y-offset
(rows are rebased; columns use the static window alone)."""
import numpy as np
import pytest

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


def test_band_coverage_report_realistic_regime(rng):
    """Coverage instrumentation (band_coverage_report): in the reference's
    regime — zero-init field convs drifting to smooth small offsets
    (deformable_segmentation.py:250-256) — the default window covers ~all
    modulation-weighted bilinear mass, and full coverage implies the banded
    forward is EXACT vs the oracle."""
    from devis_tpu.ops.deform_conv import conv2d_nhwc
    from devis_tpu.ops.deform_conv_banded import band_coverage_report

    from devis_tpu.ops.deform_conv_banded import deform_conv2d_banded_fused

    B, H, W, Cin, Cout, K = 2, 24, 32, 8, 4, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    # trained-smooth-field surrogate: small random field weights produce
    # offsets with |Δ| well inside the window (max residual asserted below)
    w_off = jnp.asarray(rng.randn(K, K, Cin, 2 * K * K) * 0.01, jnp.float32)
    b_off = jnp.asarray(rng.randn(2 * K * K) * 0.1, jnp.float32)
    w_mod = jnp.asarray(rng.randn(K, K, Cin, K * K) * 0.05, jnp.float32)
    b_mod = jnp.asarray(rng.randn(K * K) * 0.3, jnp.float32)
    rep = band_coverage_report(x, w_off, b_off, w_mod, b_mod,
                               ncand=4, ncand_y=3)
    # window bounds: y ∈ [-1, 1] (ncand_y=3), x ∈ [-1, 2] (ncand=4)
    assert rep["max_resid_y"] < 1.0 and rep["max_resid_x"] < 1.0, rep
    assert rep["covered_mass"] == 1.0, rep
    assert rep["exact_tap_frac"] == 1.0, rep

    # full coverage ⇒ the fused banded forward (whose channel-mean rebase
    # the report replicates) == exact oracle on the same fields
    weight = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.1, jnp.float32)
    bias = jnp.zeros((Cout,), jnp.float32)
    offset = conv2d_nhwc(x, w_off, b_off, 1)
    mod = 2.0 * jax.nn.sigmoid(conv2d_nhwc(x, w_mod, b_mod, 1))
    got = np.asarray(deform_conv2d_banded_fused(
        x, w_off, b_off, w_mod, b_mod, weight, bias, 1, ncand=4, ncand_y=3))
    want = np.asarray(_deform_conv2d_xla(x, offset, mod, weight, bias, 1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_band_coverage_report_flags_wide_fields(rng):
    """Out-of-band-heavy fields must REPORT low coverage (the detection the
    auto-widen policy keys on, docs/PERFORMANCE.md §Banded-DCNv2 risk)."""
    from devis_tpu.ops.deform_conv_banded import band_coverage_report

    B, H, W, Cin, K = 1, 16, 20, 6, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 3.0, jnp.float32)
    w_off = jnp.asarray(rng.randn(K, K, Cin, 2 * K * K) * 0.6, jnp.float32)
    b_off = jnp.asarray(rng.randn(2 * K * K) * 2.0, jnp.float32)
    w_mod = jnp.zeros((K, K, Cin, K * K), jnp.float32)
    b_mod = jnp.zeros((K * K,), jnp.float32)
    rep = band_coverage_report(x, w_off, b_off, w_mod, b_mod,
                               ncand=4, ncand_y=3)
    assert rep["covered_mass"] < 0.9, rep
    # widening the window must strictly improve coverage
    rep6 = band_coverage_report(x, w_off, b_off, w_mod, b_mod,
                                ncand=8, ncand_y=8)
    assert rep6["covered_mass"] > rep["covered_mass"], (rep, rep6)


@pytest.mark.slow
def test_devis_model_mdc_banded_vs_exact_oracle(rng):
    """Model-level parity on the FLAGSHIP mask-head path (USE_MDC=True):
    the DeVIS model with the banded/fused DCNv2 mask head (`impl='pallas'`,
    interpret mode on CPU; the transformer stays on the identical XLA route
    in both models so the comparison isolates the mask head) vs the exact
    jnp DCNv2 oracle route (`impl='xla'`), same variables, offset/modulator
    convs perturbed to realistic nonzero smooth fields (the reference
    zero-inits them and training drifts them small,
    deformable_segmentation.py:250-256; the perturbation is sized so the
    first layer's measured band coverage is ~1, mirroring that regime —
    out-of-band behavior is pinned by the coverage tests above).
    Asserts mask-logit parity at AP-safe tolerance."""
    from devis_tpu.config import get_cfg_defaults
    from devis_tpu.models import build_model

    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.LOSS.MASK_AUX_LOSS = []
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 1
    cfg.MODEL.DEVIS.NUM_FRAMES = 2
    cfg.MODEL.NUM_QUERIES = 8
    cfg.TEST.NUM_OUT = 4
    assert cfg.MODEL.MASK_HEAD.USE_MDC          # flagship default
    cfg.freeze()

    model_exact = build_model(num_classes=7, cfg=cfg, impl="xla")
    # banded mask head, SAME (xla) transformer: only the DCNv2 route differs
    model_banded = model_exact.clone(impl="pallas")

    T, H, W = 2, 64, 96
    imgs = jnp.asarray(rng.rand(T, H, W, 3), jnp.float32)
    pad = jnp.zeros((T, H, W), bool)
    variables = model_exact.init(jax.random.PRNGKey(0), imgs, pad,
                                 train=False)

    # perturb the zero-init field convs to small smooth nonzero fields
    def perturb(path, p):
        name = "/".join(str(k.key) for k in path)
        if "offset_conv" in name or "modulator_conv" in name:
            scale = 0.002 if p.ndim == 4 else 0.1
            return p + scale * jax.random.normal(
                jax.random.PRNGKey(hash(name) % (2 ** 31)), p.shape, p.dtype)
        return p
    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    _, res_x = model_exact.apply(variables, imgs, pad, train=False)
    _, res_p = model_banded.apply(variables, imgs, pad, train=False)

    mx = np.asarray(res_x["masks"], np.float32)
    mp = np.asarray(res_p["masks"], np.float32)
    # the perturbed offsets must actually exercise the deformable path
    assert float(np.abs(mx).max()) > 0
    scale = float(np.abs(mx).max())
    np.testing.assert_allclose(mp, mx, atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(res_p["scores"]),
                               np.asarray(res_x["scores"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_p["boxes"]),
                               np.asarray(res_x["boxes"]), atol=1e-4)
