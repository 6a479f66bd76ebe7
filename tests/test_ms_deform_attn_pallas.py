"""Pallas MSDeformAttn kernel parity tests (interpret mode on CPU).

Mirrors the reference's kernel test strategy (`src/models/ops/test.py:29-84`):
forward parity against the dense oracle and the XLA backend, gradient parity
against XLA autodiff, plus range/padding edge cases specific to the
one-hot-tile design.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devis_tpu.ops.ms_deform_attn import (_ms_deform_attn_xla,
                                          ms_deform_attn,
                                          ms_deform_attn_dense_reference)
from devis_tpu.ops.ms_deform_attn_pallas import (_tile_ranges, _taps,
                                                 ms_deform_attn_pallas)

SHAPES = ((12, 16), (6, 8), (3, 4))
S = sum(h * w for h, w in SHAPES)


def _inputs(rng, B=2, Q=50, M=4, D=32, P=3, loc_scale=1.2, loc_shift=-0.1):
    L = len(SHAPES)
    value = jnp.asarray(rng.rand(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2) * loc_scale + loc_shift,
                      jnp.float32)
    att = jax.nn.softmax(
        jnp.asarray(rng.rand(B, Q, M, L * P), jnp.float32)).reshape(
        B, Q, M, L, P)
    return value, loc, att


class TestForward:
    def test_vs_dense_oracle(self, rng):
        value, loc, att = _inputs(rng)
        out = ms_deform_attn_pallas(value, SHAPES, loc, att)
        ref = ms_deform_attn_dense_reference(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def test_vs_xla_backend(self, rng):
        value, loc, att = _inputs(rng, B=1, Q=300)
        out_p = ms_deform_attn_pallas(value, SHAPES, loc, att)
        out_x = _ms_deform_attn_xla(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=1e-5, atol=1e-6)

    def test_impl_dispatch(self, rng):
        value, loc, att = _inputs(rng, B=1, Q=10)
        out = ms_deform_attn(value, SHAPES, loc, att, impl="pallas")
        ref = ms_deform_attn(value, SHAPES, loc, att, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_all_out_of_bounds(self, rng):
        """Fully OOB sampling → zero output (zero-padding semantics)."""
        value, loc, att = _inputs(rng, B=1, Q=8)
        loc = loc + 10.0
        out = ms_deform_attn_pallas(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_q_not_multiple_of_tile(self, rng):
        """Q smaller than / not divisible by the q-tile must pad correctly."""
        value, loc, att = _inputs(rng, B=1, Q=7)
        out = ms_deform_attn_pallas(value, SHAPES, loc, att)
        ref = ms_deform_attn_dense_reference(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def test_bf16_value(self, rng):
        value, loc, att = _inputs(rng, B=1, Q=40)
        out = ms_deform_attn_pallas(value.astype(jnp.bfloat16), SHAPES, loc, att)
        ref = ms_deform_attn_dense_reference(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out).astype(np.float32), ref,
                                   rtol=2e-2, atol=2e-2)


class TestGroupedHeads:
    def test_grouped_matches_replicated(self, rng):
        """G query-heads sharing one value head must equal running the op
        with the value explicitly replicated across heads."""
        B, Q, G, D, P = 2, 40, 3, 32, 2
        L = len(SHAPES)
        value = jnp.asarray(rng.rand(B, S, 1, D), jnp.float32)
        loc = jnp.asarray(rng.rand(B, Q, G, L, P, 2), jnp.float32)
        att = jax.nn.softmax(
            jnp.asarray(rng.rand(B, Q, G, L * P), jnp.float32)).reshape(
            B, Q, G, L, P)
        got = ms_deform_attn_pallas(value, SHAPES, loc, att)
        rep = jnp.broadcast_to(value, (B, S, G, D))
        want = ms_deform_attn_pallas(rep, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.slow
    def test_grouped_grads(self, rng):
        B, Q, G, D, P = 1, 20, 2, 32, 2
        L = len(SHAPES)
        value = jnp.asarray(rng.rand(B, S, 1, D), jnp.float32)
        loc = jnp.asarray(rng.rand(B, Q, G, L, P, 2), jnp.float32)
        att = jax.nn.softmax(
            jnp.asarray(rng.rand(B, Q, G, L * P), jnp.float32)).reshape(
            B, Q, G, L, P)

        def loss_grouped(v):
            return (ms_deform_attn_pallas(v, SHAPES, loc, att) ** 2).sum()

        def loss_replicated(v):
            rep = jnp.broadcast_to(v, (B, S, G, D))
            return (ms_deform_attn_pallas(rep, SHAPES, loc, att) ** 2).sum()

        g1 = jax.grad(loss_grouped)(value)
        g2 = jax.grad(loss_replicated)(value)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


class TestGradients:
    def test_grads_vs_xla(self, rng):
        value, loc, att = _inputs(rng)

        def loss_p(v, l, a):
            return (ms_deform_attn_pallas(v, SHAPES, l, a) * 0.01).sum()

        def loss_x(v, l, a):
            return (_ms_deform_attn_xla(v, SHAPES, l, a) * 0.01).sum()

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, att)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(value, loc, att)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_grad_value_deterministic(self, rng):
        """grad_value is a Wᵀ@g matmul, not an atomicAdd scatter (unlike the
        reference CUDA backward) — repeated runs must be bitwise equal."""
        value, loc, att = _inputs(rng, B=1, Q=64, M=2, D=32)

        def loss(v):
            return (ms_deform_attn_pallas(v, SHAPES, loc, att) ** 2).sum()

        g1 = np.asarray(jax.grad(loss)(value))
        g2 = np.asarray(jax.grad(loss)(value))
        np.testing.assert_array_equal(g1, g2)


class TestRanges:
    def test_ranges_cover_all_taps(self, rng):
        value, loc, att = _inputs(rng, B=1, Q=30)
        idx, wt = _taps(SHAPES, loc, att)
        q_tile, s_tile = 256, 512
        q_pad = 256
        r = np.asarray(_tile_ranges(idx, wt, SHAPES, q_tile, s_tile, q_pad))
        idxn, wtn = np.asarray(idx), np.asarray(wt)
        BM = idxn.shape[0] * idxn.shape[1]
        idxn = idxn.reshape(BM, -1, idxn.shape[3], idxn.shape[4])
        wtn = wtn.reshape(BM, -1, wtn.shape[3], wtn.shape[4])
        for bm in range(BM):
            for lvl in range(len(SHAPES)):
                start, cnt = r[bm, 0, lvl]
                live = wtn[bm, :, lvl] != 0
                if not live.any():
                    continue
                ii = idxn[bm, :, lvl][live]
                assert ii.min() >= start * s_tile
                assert ii.max() < (start + cnt) * s_tile

    def test_local_sampling_produces_small_ranges(self, rng):
        """Local offsets → per-level ranges much smaller than the level."""
        big = ((64, 64),)
        B, Q, M, P = 1, 4096, 1, 4
        yy, xx = np.meshgrid((np.arange(64) + .5) / 64, (np.arange(64) + .5) / 64,
                             indexing="ij")
        ref = np.stack([xx.ravel(), yy.ravel()], -1)          # (Q, 2)
        off = (rng.rand(Q, M, 1, P, 2) - .5) * 0.05
        loc = jnp.asarray((ref[:, None, None, None] + off)[None], jnp.float32)
        att = jnp.ones((B, Q, M, 1, P), jnp.float32) / P
        idx, wt = _taps(big, loc, att)
        r = np.asarray(_tile_ranges(idx, wt, big, 256, 512, 4096))
        assert r[..., 1].max() <= 3        # ≤3 of 8 s-tiles per q-tile


class TestRowsForm:
    """`ms_deform_attn_rows` must match the loc-based op exactly — same
    kernel, transposes lifted to the caller."""

    def _rows_from_loc(self, loc, att, q_pad):
        import jax.numpy as jnp
        B, Q, MG, L, P, _ = loc.shape
        lx = jnp.transpose(loc[..., 0], (0, 2, 3, 4, 1)).reshape(
            B * MG, L * P, Q)
        ly = jnp.transpose(loc[..., 1], (0, 2, 3, 4, 1)).reshape(
            B * MG, L * P, Q)
        at = jnp.transpose(att, (0, 2, 3, 4, 1)).reshape(B * MG, L * P, Q)
        pad = ((0, 0), (0, 0), (0, q_pad - Q))
        return (jnp.pad(lx, pad, constant_values=-10.0),
                jnp.pad(ly, pad, constant_values=-10.0),
                jnp.pad(at, pad))

    def test_forward_matches_loc_form(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_rows
        value, loc, att = _inputs(rng, B=2, Q=50)
        lx, ly, at = self._rows_from_loc(loc, att, 128)
        got = ms_deform_attn_rows(value, SHAPES, lx, ly, at, 50)
        want = ms_deform_attn_pallas(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.slow
    def test_grads_match_loc_form(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_rows
        value, loc, att = _inputs(rng, B=1, Q=40)
        lx, ly, at = self._rows_from_loc(loc, att, 128)

        def loss_rows(v, a, b, c):
            return (ms_deform_attn_rows(v, SHAPES, a, b, c, 40) ** 2).sum()

        def loss_loc(v, l, a):
            return (ms_deform_attn_pallas(v, SHAPES, l, a) ** 2).sum()

        gv, glx, gly, gat = jax.grad(loss_rows, argnums=(0, 1, 2, 3))(
            value, lx, ly, at)
        gv2, gl2, ga2 = jax.grad(loss_loc, argnums=(0, 1, 2))(value, loc, att)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv2),
                                   rtol=1e-5, atol=1e-6)
        # loc-form grads, re-laid out to rows, must match the rows-form grads
        gl_rows_x, gl_rows_y, ga_rows = self._rows_from_loc(
            jnp.stack([gl2[..., 0], gl2[..., 1]], -1), ga2, 128)
        # padding constants differ (grads are 0 in padding); compare live part
        # (rtol: the in-kernel chain rule reassociates the f32 tap sums vs
        # the loc-form's XLA vjp — identical math, different rounding)
        np.testing.assert_allclose(np.asarray(glx[:, :, :40]),
                                   np.asarray(gl_rows_x[:, :, :40]),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gly[:, :, :40]),
                                   np.asarray(gl_rows_y[:, :, :40]),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gat[:, :, :40]),
                                   np.asarray(ga_rows[:, :, :40]),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_encoder_fused_rows_matches_xla(rng):
    """The encoder's rows path (transposed projections + ms_deform_attn_rows)
    must match the q-major XLA path bit-for-bit in structure (same params)."""
    from devis_tpu.models.attention import TemporalMSDeformAttnEncoder
    d_model, n_heads, P, L = 64, 4, 2, len(SHAPES)
    T = 3
    enc_kwargs = dict(n_frames=T, d_model=d_model, n_levels=L, t_window=T - 1,
                      n_heads=n_heads, n_curr_points=P, n_temporal_points=P,
                      connect_all=True)
    query = jnp.asarray(rng.randn(T, S, d_model), jnp.float32)
    flat = jnp.asarray(rng.randn(T, S, d_model), jnp.float32)
    refpts = jnp.asarray(rng.rand(T, S, L, 2), jnp.float32)

    m_xla = TemporalMSDeformAttnEncoder(impl="xla", **enc_kwargs)
    params = m_xla.init(jax.random.PRNGKey(0), query, refpts, flat, SHAPES)
    out_xla = m_xla.apply(params, query, refpts, flat, SHAPES)
    m_rows = TemporalMSDeformAttnEncoder(impl="pallas", **enc_kwargs)
    out_rows = m_rows.apply(params, query, refpts, flat, SHAPES)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss_rows(p):
        return (m_rows.apply(p, query, refpts, flat, SHAPES) ** 2).sum()

    def loss_xla(p):
        return (m_xla.apply(p, query, refpts, flat, SHAPES) ** 2).sum()

    g_r = jax.grad(loss_rows)(params)
    g_x = jax.grad(loss_xla)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4), g_r, g_x)


def test_level_grouping_matches_single_call(rng):
    """Tiny-budget grouping must reproduce the single-call result exactly."""
    from devis_tpu.ops import ms_deform_attn_pallas as mp
    value, loc, att = _inputs(rng, B=1, Q=40)
    want = mp.ms_deform_attn_pallas(value, SHAPES, loc, att)
    orig = mp.VMEM_VALUE_BUDGET
    try:
        mp.VMEM_VALUE_BUDGET = 1           # force one group per level
        assert len(mp.level_groups(SHAPES, 32, 4, 1)) == len(SHAPES)
        got = mp.ms_deform_attn_pallas_auto(value, SHAPES, loc, att)
    finally:
        mp.VMEM_VALUE_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


class TestTemporalOp:
    """Per-frame multi-operand temporal op vs explicitly stacked values."""

    def _case(self, rng, T=4, M=2, D=16, P=2, rule=("all",)):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _round_up, _temporal_frame_table, _rule_window)
        L = len(SHAPES)
        W = _rule_window(rule, T)
        F = 1 + W
        Lf = F * L
        Q = 40
        q_pad = _round_up(Q, 128)
        value = jnp.asarray(rng.rand(T, S, M, D), jnp.float32)
        lx = jnp.asarray(rng.rand(T * M, Lf * P, q_pad) * 1.2 - 0.1,
                         jnp.float32)
        ly = jnp.asarray(rng.rand(T * M, Lf * P, q_pad) * 1.2 - 0.1,
                         jnp.float32)
        at = jnp.asarray(rng.rand(T * M, Lf * P, q_pad), jnp.float32)
        at = at / at.sum(axis=1, keepdims=True)
        # padded queries: OOB location + zero attention
        lx = lx.at[:, :, Q:].set(-10.0)
        ly = ly.at[:, :, Q:].set(-10.0)
        at = at.at[:, :, Q:].set(0.0)
        table = _temporal_frame_table(rule, T)
        return value, lx, ly, at, table, Q, F

    def _stacked(self, value, table):
        T = value.shape[0]
        slots = np.concatenate([np.arange(T)[:, None], table], axis=1)
        stacked = value[jnp.asarray(slots)]
        return stacked.reshape(T, -1, *value.shape[2:])

    @pytest.mark.parametrize("rule", [("all",), ("window", (-1, 1))])
    def test_forward_matches_stacked(self, rng, rule):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            ms_deform_attn_rows, ms_deform_attn_rows_temporal)
        value, lx, ly, at, table, Q, F = self._case(rng, rule=rule)
        out_t = ms_deform_attn_rows_temporal(value, SHAPES, lx, ly, at, Q,
                                             rule)
        fused = self._stacked(value, table)
        out_s = ms_deform_attn_rows(fused, SHAPES * F, lx, ly, at, Q)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_grads_match_stacked(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            ms_deform_attn_rows, ms_deform_attn_rows_temporal)
        rule = ("all",)
        value, lx, ly, at, table, Q, F = self._case(rng, T=3, rule=rule)
        T = value.shape[0]

        def f_t(v, a, b, c):
            return (ms_deform_attn_rows_temporal(v, SHAPES, a, b, c, Q,
                                                 rule) ** 2).sum()

        def f_s(v, a, b, c):
            fused = self._stacked(v, table)
            return (ms_deform_attn_rows(fused, SHAPES * F, a, b, c, Q)
                    ** 2).sum()

        g_t = jax.grad(f_t, argnums=(0, 1, 2, 3))(value, lx, ly, at)
        g_s = jax.grad(f_s, argnums=(0, 1, 2, 3))(value, lx, ly, at)
        for a, b in zip(g_t, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestTemporalProjOp:
    """Projection-fused temporal op (in-kernel location math + joint softmax)
    vs the rows op fed with XLA-built rows (`_build_rows_from_proj`)."""

    def _case(self, rng, T=3, M=2, D=16, P=2, rule=("all",)):
        from devis_tpu.ops.ms_deform_attn_pallas import (_round_up,
                                                         _rule_window)
        L = len(SHAPES)
        W = _rule_window(rule, T)
        Q = 40
        q_pad = _round_up(Q, 128)
        value = jnp.asarray(rng.rand(T, S, M, D), jnp.float32)
        rx = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        ry = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        rx = rx.at[:, :, Q:].set(-10.0)
        ry = ry.at[:, :, Q:].set(-10.0)
        def rows(n):
            return jnp.asarray(rng.randn(T * M, n * P, q_pad) * 3,
                               jnp.float32)
        cx, cy, ca = rows(L), rows(L), rows(L)
        tx, ty, ta = rows(W * L), rows(W * L), rows(W * L)
        return value, (rx, ry, cx, cy, tx, ty, ca, ta), Q, 1 + W

    @staticmethod
    def _tile(args, M):
        """untiled oracle args → the op's pre-tiled head-slab contract
        (differentiable, so grads comparisons flow through it)."""
        from devis_tpu.ops.ms_deform_attn_pallas import _tile_headmajor

        def tref(r):
            T, L, q_pad = r.shape
            return jnp.transpose(r.reshape(T, L, q_pad // 128, 128),
                                 (0, 2, 1, 3))
        rx, ry, cx, cy, tx, ty, ca, ta = args
        return (tref(rx), tref(ry)) + tuple(
            _tile_headmajor(a, M, 128) for a in (cx, cy, tx, ty, ca, ta))

    @pytest.mark.parametrize("rule", [("all",), ("window", (-1, 1))])
    def test_forward_matches_rows(self, rng, rule):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj, ms_deform_attn_rows_temporal,
            ms_deform_attn_temporal_proj)
        value, args, Q, F = self._case(rng, rule=rule)
        out = ms_deform_attn_temporal_proj(value, SHAPES,
                                           *self._tile(args, value.shape[2]),
                                           Q, rule)
        lx, ly, at = _build_rows_from_proj(SHAPES, F, *args)
        ref = ms_deform_attn_rows_temporal(value, SHAPES, lx, ly, at, Q, rule)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_rows(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj, ms_deform_attn_rows_temporal,
            ms_deform_attn_temporal_proj)
        rule = ("all",)
        value, args, Q, F = self._case(rng, rule=rule)

        def f_p(v, *a):
            return (ms_deform_attn_temporal_proj(
                v, SHAPES, *self._tile(a, v.shape[2]), Q, rule) ** 2).sum()

        def f_r(v, *a):
            lx, ly, at = _build_rows_from_proj(SHAPES, F, *a)
            return (ms_deform_attn_rows_temporal(v, SHAPES, lx, ly, at, Q,
                                                 rule) ** 2).sum()

        an = tuple(range(1 + len(args)))
        g_p = jax.grad(f_p, argnums=an)(value, *args)
        g_r = jax.grad(f_r, argnums=an)(value, *args)
        for a, b in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestProjOp:
    """Single-frame projection-fused op vs XLA-built rows."""

    def _case(self, rng, B=2, M=2, D=16, P=3):
        from devis_tpu.ops.ms_deform_attn_pallas import _round_up
        L = len(SHAPES)
        Q = 40
        q_pad = _round_up(Q, 128)
        value = jnp.asarray(rng.rand(B, S, M, D), jnp.float32)
        rx = jnp.asarray(rng.rand(B, L, q_pad), jnp.float32)
        ry = jnp.asarray(rng.rand(B, L, q_pad), jnp.float32)
        rx = rx.at[:, :, Q:].set(-10.0)
        ry = ry.at[:, :, Q:].set(-10.0)
        def rows():
            return jnp.asarray(rng.randn(B * M, L * P, q_pad) * 3,
                               jnp.float32)
        return value, (rx, ry, rows(), rows(), rows()), Q

    @staticmethod
    def _tile(args, M):
        from devis_tpu.ops.ms_deform_attn_pallas import _tile_headmajor

        def tref(r):
            B, L, q_pad = r.shape
            return jnp.transpose(r.reshape(B, L, q_pad // 128, 128),
                                 (0, 2, 1, 3))
        rx, ry, cx, cy, ca = args
        return (tref(rx), tref(ry)) + tuple(
            _tile_headmajor(a, M, 128) for a in (cx, cy, ca))

    def test_forward_matches_rows(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj_single, ms_deform_attn_proj,
            ms_deform_attn_rows)
        value, args, Q = self._case(rng)
        out = ms_deform_attn_proj(value, SHAPES,
                                  *self._tile(args, value.shape[2]), Q)
        lx, ly, at = _build_rows_from_proj_single(SHAPES, *args)
        ref = ms_deform_attn_rows(value, SHAPES, lx, ly, at, Q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_rows(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj_single, ms_deform_attn_proj,
            ms_deform_attn_rows)
        value, args, Q = self._case(rng, B=1)

        def f_p(v, *a):
            return (ms_deform_attn_proj(
                v, SHAPES, *self._tile(a, v.shape[2]), Q) ** 2).sum()

        def f_r(v, *a):
            lx, ly, at = _build_rows_from_proj_single(SHAPES, *a)
            return (ms_deform_attn_rows(v, SHAPES, lx, ly, at, Q) ** 2).sum()

        an = tuple(range(1 + len(args)))
        g_p = jax.grad(f_p, argnums=an)(value, *args)
        g_r = jax.grad(f_r, argnums=an)(value, *args)
        for a, b in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_msdeformattn_proj_matches_xla(rng):
    """MSDeformAttn's projection-fused path (2-dim refs) vs the q-major XLA
    path with shared params, forward and grads."""
    from devis_tpu.models.attention import MSDeformAttn
    d_model, M, P, L = 64, 4, 2, len(SHAPES)
    B = 2
    kwargs = dict(d_model=d_model, n_levels=L, n_heads=M, n_points=P)
    query = jnp.asarray(rng.randn(B, S, d_model), jnp.float32)
    flat = jnp.asarray(rng.randn(B, S, d_model), jnp.float32)
    refpts = jnp.asarray(rng.rand(B, S, L, 2), jnp.float32)
    m_xla = MSDeformAttn(impl="xla", **kwargs)
    params = m_xla.init(jax.random.PRNGKey(0), query, refpts, flat, SHAPES)
    out_xla = m_xla.apply(params, query, refpts, flat, SHAPES)
    m_p = MSDeformAttn(impl="pallas", **kwargs)
    out_p = m_p.apply(params, query, refpts, flat, SHAPES)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)
    g_p = jax.grad(lambda p: (m_p.apply(p, query, refpts, flat, SHAPES)
                              ** 2).sum())(params)
    g_x = jax.grad(lambda p: (m_xla.apply(p, query, refpts, flat, SHAPES)
                              ** 2).sum())(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4), g_p, g_x)


@pytest.mark.slow
def test_encoder_stacked_fallback_matches_xla(rng, monkeypatch):
    """Pyramids that exceed the VMEM level-group budget must route through
    `_fused_rows_stacked` and still match the q-major XLA path."""
    from devis_tpu.models.attention import TemporalMSDeformAttnEncoder
    from devis_tpu.ops import ms_deform_attn_pallas as mp
    d_model, n_heads, P, L = 32, 2, 2, len(SHAPES)
    T = 3
    enc_kwargs = dict(n_frames=T, d_model=d_model, n_levels=L, t_window=T - 1,
                      n_heads=n_heads, n_curr_points=P, n_temporal_points=P,
                      connect_all=True)
    query = jnp.asarray(rng.randn(T, S, d_model), jnp.float32)
    flat = jnp.asarray(rng.randn(T, S, d_model), jnp.float32)
    refpts = jnp.asarray(rng.rand(T, S, L, 2), jnp.float32)
    m_xla = TemporalMSDeformAttnEncoder(impl="xla", **enc_kwargs)
    params = m_xla.init(jax.random.PRNGKey(0), query, refpts, flat, SHAPES)
    out_xla = m_xla.apply(params, query, refpts, flat, SHAPES)
    monkeypatch.setattr(mp, "VMEM_VALUE_BUDGET", 1)
    m_rows = TemporalMSDeformAttnEncoder(impl="pallas", **enc_kwargs)
    out_rows = m_rows.apply(params, query, refpts, flat, SHAPES)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)


class TestProjOverflowFallback:
    """The proj kernels' exactness-critical branch: spans that exceed the
    static per-level window (`_proj_s_tiles`) must route through the
    `pl.when(overflow > 1)` tail and stay exact. At the small test SHAPES
    every window clamps to the full packed level (num_t <= 1), so these
    cases use larger pyramids + x40 offsets and assert the ranges actually
    report multi-window spans before checking parity."""

    SHAPES_BIG = ((24, 32), (12, 16), (6, 8), (3, 4))
    S_BIG = sum(h * w for h, w in SHAPES_BIG)

    def _assert_overflow(self, ranges):
        num_t = np.asarray(ranges)[..., 1]
        assert num_t.max() >= 2, (
            f"fallback not exercised: max num_t={num_t.max()} — widen "
            f"offsets or shapes")

    def test_temporal_proj_fallback_exact(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj, _proj_s_tiles, _row_ranges_proj_pallas,
            _round_up, _rule_window, _tile_headmajor,
            ms_deform_attn_rows_temporal, ms_deform_attn_temporal_proj)
        SH = self.SHAPES_BIG
        T, M, D, P, rule = 2, 2, 16, 2, ("all",)
        L = len(SH)
        W = _rule_window(rule, T)
        F = 1 + W
        Q = 40
        q_pad = _round_up(Q, 128)
        value = jnp.asarray(rng.rand(T, self.S_BIG, M, D), jnp.float32)
        rx = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        ry = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        rx = rx.at[:, :, Q:].set(-10.0)
        ry = ry.at[:, :, Q:].set(-10.0)

        def rows(n):
            return jnp.asarray(rng.randn(T * M, n * P, q_pad) * 40,
                               jnp.float32)
        cx, cy, ca = rows(L), rows(L), rows(L)
        tx, ty, ta = rows(W * L), rows(W * L), rows(W * L)
        args = (rx, ry, cx, cy, tx, ty, ca, ta)

        def tref(r):
            Tn, Ln, qp = r.shape
            return jnp.transpose(r.reshape(Tn, Ln, qp // 128, 128),
                                 (0, 2, 1, 3))
        tiled = (tref(rx), tref(ry)) + tuple(
            _tile_headmajor(a, M, 128) for a in (cx, cy, tx, ty, ca, ta))
        s_tiles = _proj_s_tiles(SH, 128)
        ranges = _row_ranges_proj_pallas(*tiled[:6], SH, F, 128, s_tiles, M)
        self._assert_overflow(ranges)

        out = ms_deform_attn_temporal_proj(value, SH, *tiled, Q, rule)
        lx, ly, at = _build_rows_from_proj(SH, F, *args)
        ref = ms_deform_attn_rows_temporal(value, SH, lx, ly, at, Q, rule)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_single_proj_fallback_exact(self, rng):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            _build_rows_from_proj_single, _proj_s_tiles,
            _row_ranges_proj_pallas, _round_up, _tile_headmajor,
            ms_deform_attn_proj, ms_deform_attn_rows)
        SH = self.SHAPES_BIG
        B, M, D, P = 1, 2, 16, 3
        L = len(SH)
        Q = 40
        q_pad = _round_up(Q, 128)
        value = jnp.asarray(rng.rand(B, self.S_BIG, M, D), jnp.float32)
        rx = jnp.asarray(rng.rand(B, L, q_pad), jnp.float32)
        ry = jnp.asarray(rng.rand(B, L, q_pad), jnp.float32)
        rx = rx.at[:, :, Q:].set(-10.0)
        ry = ry.at[:, :, Q:].set(-10.0)

        def rows():
            return jnp.asarray(rng.randn(B * M, L * P, q_pad) * 40,
                               jnp.float32)
        cx, cy, ca = rows(), rows(), rows()
        args = (rx, ry, cx, cy, ca)

        def tref(r):
            Bn, Ln, qp = r.shape
            return jnp.transpose(r.reshape(Bn, Ln, qp // 128, 128),
                                 (0, 2, 1, 3))
        tiled = (tref(rx), tref(ry)) + tuple(
            _tile_headmajor(a, M, 128) for a in (cx, cy, ca))
        s_tiles = _proj_s_tiles(SH, 128)
        ranges = _row_ranges_proj_pallas(*tiled[:4], tiled[2], tiled[3],
                                         SH, 1, 128, s_tiles, M)
        self._assert_overflow(ranges)

        out = ms_deform_attn_proj(value, SH, *tiled, Q)
        lx, ly, at = _build_rows_from_proj_single(SH, *args)
        ref = ms_deform_attn_rows(value, SH, lx, ly, at, Q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestRangesProjPallas:
    """The in-kernel s-window computation must match the XLA reference
    bit-for-bit (the windows gate which value tiles the forward kernel
    DMAs — any divergence drops live taps)."""

    @pytest.mark.parametrize("rule", [("all",), ("window", (-1, 1))])
    def test_matches_xla_reference(self, rng, rule):
        from devis_tpu.ops.ms_deform_attn_pallas import (
            S_TILE, _row_ranges_proj, _row_ranges_proj_pallas, _round_up,
            _rule_window, _tile_headmajor)
        T, M, P = 3, 2, 2
        L = len(SHAPES)
        W = _rule_window(rule, T)
        F = 1 + W
        Q = 40
        q_pad = _round_up(Q, 128)
        rx = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        ry = jnp.asarray(rng.rand(T, L, q_pad), jnp.float32)
        rx = rx.at[:, :, Q:].set(-10.0)
        ry = ry.at[:, :, Q:].set(-10.0)

        def rows(n):
            return jnp.asarray(rng.randn(T * M, n * P, q_pad) * 3,
                               jnp.float32)
        cx, cy = rows(L), rows(L)
        tx, ty = rows(W * L), rows(W * L)
        want = _row_ranges_proj(rx, ry, cx, cy, tx, ty, SHAPES, F,
                                128, S_TILE)
        # the launcher takes PRE-TILED head-slab operands
        def tref(r):
            T, L, q_pad = r.shape
            return jnp.transpose(r.reshape(T, L, q_pad // 128, 128),
                                 (0, 2, 1, 3))
        got = _row_ranges_proj_pallas(
            tref(rx), tref(ry),
            *(_tile_headmajor(a, M, 128) for a in (cx, cy, tx, ty)),
            SHAPES, F, 128, S_TILE, M)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
