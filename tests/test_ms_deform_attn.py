"""Parity + gradient tests for the multi-scale deformable attention op.

Replicates the reference's kernel test strategy (`src/models/ops/test.py:29-84`):
forward parity against a torch-CPU ``F.grid_sample`` oracle (the reference's
numerical oracle, `ms_deform_attn_func.py:102-122`) and gradient checks, across
channel sizes that exercise different code paths.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devis_tpu.ops.ms_deform_attn import (
    ms_deform_attn, ms_deform_attn_dense_reference, make_temporal_shapes,
    level_start_index)


def _torch_oracle(value, spatial_shapes, loc, att):
    """The reference oracle: per-level grid_sample(align_corners=False)."""
    import torch
    import torch.nn.functional as F
    value = torch.from_numpy(np.asarray(value)).double()
    loc = torch.from_numpy(np.asarray(loc)).double()
    att = torch.from_numpy(np.asarray(att)).double()
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(B * M, D, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                     align_corners=False))
    att_t = att.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * att_t).sum(-1)
    return out.view(B, M * D, Lq).transpose(1, 2).contiguous().numpy()


def _random_inputs(rng, B=2, M=4, D=8, Lq=17, P=3,
                   shapes=((6, 9), (4, 5), (2, 3))):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float64)
    # Locations mostly inside [0,1] with some outliers to hit the zero-padding.
    loc = rng.rand(B, Lq, M, L, P, 2) * 1.4 - 0.2
    att = rng.rand(B, Lq, M, L, P) + 1e-3
    att = att / att.sum(axis=(3, 4), keepdims=True)
    return value, shapes, loc.astype(np.float64), att.astype(np.float64)


class TestForwardParity:
    def test_vs_torch_oracle(self, rng):
        value, shapes, loc, att = _random_inputs(rng)
        ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(att))
        ref = _torch_oracle(value, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_vs_dense_reference(self, rng):
        value, shapes, loc, att = _random_inputs(rng, B=1, M=2, D=4, Lq=7, P=2)
        ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(att))
        ref = ms_deform_attn_dense_reference(value, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("D", [30, 32, 71])
    def test_channel_sizes(self, rng, D):
        value, shapes, loc, att = _random_inputs(rng, B=1, M=2, D=D, Lq=9, P=2)
        ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(att))
        ref = _torch_oracle(value, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_exact_border_taps(self, rng):
        """Locations exactly on corners/edges must match grid_sample padding."""
        shapes = ((4, 4),)
        value = rng.randn(1, 16, 1, 2)
        loc = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5], [0.125, 0.125],
                        [-0.1, 0.5], [0.5, 1.1]])[None, :, None, None, None, :]
        att = np.ones((1, 6, 1, 1, 1))
        ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(att))
        ref = _torch_oracle(value, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)

    def test_temporal_level_stacking(self, rng):
        """Stacked temporal frames behave as extra pyramid levels."""
        shapes = ((4, 6), (2, 3))
        t_shapes = make_temporal_shapes(shapes, 3)
        assert t_shapes == shapes * 3
        assert level_start_index(t_shapes) == (0, 24, 30, 54, 60, 84)
        value, _, loc, att = _random_inputs(rng, B=1, M=2, D=4, Lq=5, P=2,
                                            shapes=t_shapes)
        ours = ms_deform_attn(jnp.asarray(value), t_shapes, jnp.asarray(loc),
                              jnp.asarray(att))
        ref = _torch_oracle(value, t_shapes, loc, att)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


class TestGradients:
    def _torch_grads(self, value, shapes, loc, att, cotangent):
        import torch
        import torch.nn.functional as F
        tv = torch.from_numpy(value).double().requires_grad_(True)
        tl = torch.from_numpy(loc).double().requires_grad_(True)
        ta = torch.from_numpy(att).double().requires_grad_(True)
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        splits = [h * w for h, w in shapes]
        value_list = tv.split(splits, dim=1)
        grids = 2 * tl - 1
        sampled = []
        for lid, (h, w) in enumerate(shapes):
            v = value_list[lid].flatten(2).transpose(1, 2).reshape(B * M, D, h, w)
            g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
            sampled.append(F.grid_sample(v, g, mode="bilinear",
                                         padding_mode="zeros",
                                         align_corners=False))
        att_t = ta.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
        out = (torch.stack(sampled, dim=-2).flatten(-2) * att_t).sum(-1)
        out = out.view(B, M * D, Lq).transpose(1, 2)
        out.backward(torch.from_numpy(cotangent).double())
        return tv.grad.numpy(), tl.grad.numpy(), ta.grad.numpy()

    def test_grads_vs_torch(self, rng):
        value, shapes, loc, att = _random_inputs(rng, B=2, M=2, D=4, Lq=11, P=2)
        cot = rng.randn(2, 11, 2 * 4)

        def f(v, l, a):
            return (ms_deform_attn(v, shapes, l, a) * jnp.asarray(cot)).sum()

        gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(att))
        tgv, tgl, tga = self._torch_grads(value, shapes, loc, att, cot)
        np.testing.assert_allclose(np.asarray(gv), tgv, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ga), tga, rtol=1e-4, atol=1e-5)
        # Location grads are undefined exactly on integer grid lines
        # (floor discontinuity); random inputs avoid those with prob. 1.
        np.testing.assert_allclose(np.asarray(gl), tgl, rtol=1e-4, atol=1e-5)

    def test_jit_grad_compiles(self, rng):
        value, shapes, loc, att = _random_inputs(rng, B=1, M=2, D=4, Lq=5, P=2)

        @jax.jit
        def step(v, l, a):
            return jax.grad(lambda v_, l_, a_: ms_deform_attn(
                v_, shapes, l_, a_).sum())(v, l, a)

        g = step(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(att))
        assert g.shape == value.shape
        assert np.isfinite(np.asarray(g)).all()
