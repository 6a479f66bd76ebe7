"""Multi-scale deformable attention — the core op of the framework.

TPU-native reimplementation of the reference's CUDA op
(`/root/reference/src/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238` forward,
`:957` backward dispatch) and of the pure-PyTorch oracle
(`/root/reference/src/models/ops/functions/ms_deform_attn_func.py:102-122`).

Semantics (identical to the reference):
  * ``value``               (B, S, M, D)   — flattened multi-scale features split
                            into M heads; S = sum_l H_l * W_l.
  * ``spatial_shapes``      static tuple ((H_0, W_0), ...) — Python ints so the
                            whole op traces with static shapes (one jit cache
                            entry per pyramid geometry).
  * ``sampling_locations``  (B, Lq, M, L, P, 2) — (x, y) in [0, 1] normalized to
                            each level's full (padded) extent.
  * ``attention_weights``   (B, Lq, M, L, P) — softmax-normalized over (L, P).
  * returns                 (B, Lq, M*D).

The bilinear convention matches ``F.grid_sample(align_corners=False,
padding_mode='zeros')``: pixel-space coordinate ``p = loc * size - 0.5``; taps
falling outside the feature map contribute zero (their bilinear weight is
masked, equivalent to zero padding).

Two backends:
  * ``xla``    — jnp gathers (``take_along_axis``); differentiable end-to-end
                 with a deterministic scatter-add transpose for grad_value
                 (unlike the reference's atomicAdd backward, this is bitwise
                 deterministic).
  * ``pallas`` — hand-written TPU kernel (see ``ms_deform_attn_pallas.py``) with
                 a custom VJP; used for the hot encoder path.

The temporal attention of DeVIS needs no dedicated op: temporal frames enter as
extra pyramid levels (the reference's level-stacking trick,
`ops/modules/ms_deform_attn.py:355-361`).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]


def normalize_shapes(spatial_shapes) -> Shapes:
    """Coerce spatial shapes into a hashable static tuple of int pairs."""
    return tuple((int(h), int(w)) for h, w in spatial_shapes)


def level_start_index(spatial_shapes: Shapes) -> Tuple[int, ...]:
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def resolve_impl(impl: str) -> str:
    """'auto' → the Pallas kernel on TPU (XLA's serial row-gather is the
    model bottleneck there), plain XLA gathers elsewhere.

    The resolution is a TRACE-time choice keyed on the DEFAULT backend.
    Computations lowered for a non-default device (e.g. parameter init
    jitted onto CPU while the default backend is TPU) must not rely on
    'auto': build the model with an explicit ``impl='xla'``
    (`build_model(..., impl='xla')`) for such traces."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes,
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   impl: str = "auto") -> jnp.ndarray:
    """Multi-scale deformable attention. See module docstring for semantics."""
    spatial_shapes = normalize_shapes(spatial_shapes)
    impl = resolve_impl(impl)
    if impl == "pallas":
        from .ms_deform_attn_pallas import ms_deform_attn_pallas_auto
        return ms_deform_attn_pallas_auto(value, spatial_shapes,
                                          sampling_locations,
                                          attention_weights)
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)


@functools.partial(jax.jit, static_argnums=(1,))
def _ms_deform_attn_xla(value, spatial_shapes: Shapes, sampling_locations,
                        attention_weights):
    B, S, M, D = value.shape
    _, Lq, M2, L, P, _ = sampling_locations.shape
    assert M == M2 and L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes), \
        f"value length {S} != sum of spatial shapes {spatial_shapes}"

    # (B, M, S, D): head-major so each gather has batch dims (B, M).
    value_hm = jnp.transpose(value, (0, 2, 1, 3))

    starts = level_start_index(spatial_shapes)
    out = jnp.zeros((B, M, Lq, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_hm, starts[lvl], starts[lvl] + h * w, axis=2)
        loc = sampling_locations[:, :, :, lvl]        # (B, Lq, M, P, 2)
        att = attention_weights[:, :, :, lvl]         # (B, Lq, M, P)
        out = out + _sample_level(v_l, loc, att, h, w)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def _sample_level(v_l, loc, att, h: int, w: int):
    """Bilinear-sample one pyramid level and apply attention weights.

    v_l: (B, M, H*W, D); loc: (B, Lq, M, P, 2); att: (B, Lq, M, P).
    Returns (B, M, Lq, D) float32.
    """
    B, M, _, D = v_l.shape
    _, Lq, _, P, _ = loc.shape

    x = loc[..., 0].astype(jnp.float32) * w - 0.5     # (B, Lq, M, P)
    y = loc[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - jax.lax.stop_gradient(x0)
    dy = y - jax.lax.stop_gradient(y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # 4 taps: (y0,x0) (y0,x1) (y1,x0) (y1,x1); bilinear weights with zero
    # padding expressed by masking out-of-range taps.
    tap_w = [(1 - dy) * (1 - dx), (1 - dy) * dx, dy * (1 - dx), dy * dx]
    tap_xy = [(y0i, x0i), (y0i, x0i + 1), (y0i + 1, x0i), (y0i + 1, x0i + 1)]

    idxs, wts = [], []
    for (yi, xi), tw in zip(tap_xy, tap_w):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(jnp.float32)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        idxs.append(idx)
        wts.append(tw * valid * att.astype(jnp.float32))

    # (B, Lq, M, P, 4) -> (B, M, Lq*P*4)
    idx_all = jnp.stack(idxs, axis=-1)
    wt_all = jnp.stack(wts, axis=-1)
    idx_flat = jnp.transpose(idx_all, (0, 2, 1, 3, 4)).reshape(B, M, Lq * P * 4)
    wt_flat = jnp.transpose(wt_all, (0, 2, 1, 3, 4)).reshape(B, M, Lq * P * 4)

    gathered = jnp.take_along_axis(v_l, idx_flat[..., None], axis=2)  # (B, M, LqP4, D)
    weighted = gathered.astype(jnp.float32) * wt_flat[..., None]
    return weighted.reshape(B, M, Lq, P * 4, D).sum(axis=3)


def ms_deform_attn_dense_reference(value, spatial_shapes, sampling_locations,
                                   attention_weights):
    """Slow, obviously-correct oracle used only by tests.

    Computes every tap independently with explicit Python loops over levels and
    points via vectorized map_coordinates-style indexing. Mirrors the
    reference's pure-PyTorch oracle (`ms_deform_attn_func.py:102-122`).
    """
    import numpy as np
    value = np.asarray(value, dtype=np.float64)
    loc = np.asarray(sampling_locations, dtype=np.float64)
    att = np.asarray(attention_weights, dtype=np.float64)
    spatial_shapes = normalize_shapes(spatial_shapes)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    starts = level_start_index(spatial_shapes)
    out = np.zeros((B, Lq, M, D))
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lvl]:starts[lvl] + h * w].reshape(B, h, w, M, D)
        for p in range(P):
            x = loc[:, :, :, lvl, p, 0] * w - 0.5
            y = loc[:, :, :, lvl, p, 1] * h - 0.5
            x0 = np.floor(x).astype(np.int64)
            y0 = np.floor(y).astype(np.int64)
            dx, dy = x - x0, y - y0
            for oy, ox, tw in ((0, 0, (1 - dy) * (1 - dx)), (0, 1, (1 - dy) * dx),
                               (1, 0, dy * (1 - dx)), (1, 1, dy * dx)):
                yi, xi = y0 + oy, x0 + ox
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                yc = np.clip(yi, 0, h - 1)
                xc = np.clip(xi, 0, w - 1)
                for b in range(B):
                    for m in range(M):
                        g = v[b, yc[b, :, m], xc[b, :, m], m]     # (Lq, D)
                        wgt = (tw[b, :, m] * valid[b, :, m] *
                               att[b, :, m, lvl, p])[:, None]
                        out[b, :, m] += g * wgt
    return out.reshape(B, Lq, M * D)


def make_temporal_shapes(spatial_shapes: Shapes, n_temporal_frames: int) -> Shapes:
    """Level-stacked pyramid geometry for temporal attention.

    The temporal value tensor stacks the (T-1) other frames along the level
    axis, so the geometry is simply the per-frame pyramid repeated
    (reference: devis_transformer.py:97, ms_deform_attn.py:355-361).
    """
    return tuple(spatial_shapes) * n_temporal_frames
