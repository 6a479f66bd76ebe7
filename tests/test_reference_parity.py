"""Numerical parity against the REFERENCE torch modules.

Imports the reference implementation from /root/reference (read-only) on CPU,
patching its compiled CUDA op with its own pure-PyTorch oracle
(`ms_deform_attn_core_pytorch`, the reference's declared numerical ground
truth — src/models/ops/test.py:29) and stubbing unavailable third-party deps.
Weights are transplanted torch→flax and outputs compared elementwise — this
validates the attention-module wiring (offset bias init, sampling-location
formula, joint projections) and the kernel numerics end to end against the
genuine reference code, not a transcription.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference modules with CUDA/third-party stubs installed."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    mods = {}
    for name in ["MultiScaleDeformableAttention", "visdom", "pycocotools",
                 "pycocotools.mask", "timm", "timm.models",
                 "timm.models.layers"]:
        mods[name] = sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["visdom"].Visdom = object
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    tv.__version__ = "0.0"
    for sub in ["torchvision.models", "torchvision.ops",
                "torchvision.ops.boxes", "torchvision.models._utils",
                "torchvision.datasets"]:
        sys.modules.setdefault(sub, types.ModuleType(sub))
    sys.modules["torchvision.ops"].deform_conv2d = lambda *a, **k: None

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    sys.modules["torchvision.ops.boxes"].box_area = box_area
    sys.modules["torchvision.models._utils"].IntermediateLayerGetter = object
    sys.modules["timm.models.layers"].DropPath = torch.nn.Identity
    sys.modules["timm.models.layers"].trunc_normal_ = lambda *a, **k: None
    sys.modules["timm.models.layers"].to_2tuple = lambda x: (x, x)

    import src.models.ops.functions.ms_deform_attn_func as F_
    core = F_.ms_deform_attn_core_pytorch

    class PyFn:
        @staticmethod
        def apply(value, shapes, level_start_index, loc, att, step):
            return core(value, shapes, loc, att)

    F_.MSDeformAttnFunction = PyFn
    import src.models.ops.modules.ms_deform_attn as M_
    M_.MSDeformAttnFunction = PyFn
    return M_


SHAPES = ((12, 16), (6, 8), (3, 4))
S = sum(h * w for h, w in SHAPES)


def _torch_linear_to_flax(linear):
    return {"kernel": jnp.asarray(linear.weight.detach().numpy().T),
            "bias": jnp.asarray(linear.bias.detach().numpy())}


class TestMSDeformAttnModule:
    def test_forward_parity(self, ref_modules, rng):
        d_model, n_heads, n_points, L = 64, 4, 2, len(SHAPES)
        ref = ref_modules.MSDeformAttn(d_model=d_model, n_levels=L,
                                       n_heads=n_heads, n_points=n_points)
        ref.eval()

        from devis_tpu.models.attention import MSDeformAttn as Mine
        mine = Mine(d_model=d_model, n_levels=L, n_heads=n_heads,
                    n_points=n_points, impl="xla")

        B, Lq = 2, 30
        query = rng.randn(B, Lq, d_model).astype(np.float32)
        value = rng.randn(B, S, d_model).astype(np.float32)
        refpts = rng.rand(B, Lq, L, 2).astype(np.float32)
        pad = np.zeros((B, S), bool)
        pad[0, -10:] = True

        with torch.no_grad():
            out_ref = ref(torch.from_numpy(query),
                          torch.from_numpy(refpts),
                          torch.from_numpy(value),
                          torch.tensor(SHAPES, dtype=torch.long),
                          torch.tensor([0, 192, 240], dtype=torch.long),
                          torch.from_numpy(pad))[0].numpy()

        params = {"params": {
            "sampling_offsets": _torch_linear_to_flax(ref.sampling_offsets),
            "attention_weights": _torch_linear_to_flax(ref.attention_weights),
            "value_proj": _torch_linear_to_flax(ref.value_proj),
            "output_proj": _torch_linear_to_flax(ref.output_proj),
        }}
        out_mine = mine.apply(params, jnp.asarray(query), jnp.asarray(refpts),
                              jnp.asarray(value), SHAPES,
                              padding_mask=jnp.asarray(pad))
        np.testing.assert_allclose(np.asarray(out_mine), out_ref,
                                   rtol=2e-4, atol=2e-5)

    def test_offset_bias_init_matches_reference(self, ref_modules):
        """Our directional-grid bias init must equal the reference's
        `_reset_parameters` (ms_deform_attn.py:64-82)."""
        from devis_tpu.models.attention import sampling_offsets_bias_init
        ref = ref_modules.MSDeformAttn(d_model=64, n_levels=3, n_heads=4,
                                       n_points=2)
        want = ref.sampling_offsets.bias.detach().numpy()
        got = sampling_offsets_bias_init(4, 3, 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def _transplant_temporal(self, ref):
        return {"params": {
            "sampling_offsets": _torch_linear_to_flax(ref.sampling_offsets),
            "attention_weights": _torch_linear_to_flax(ref.attention_weights),
            "temporal_sampling_offsets":
                _torch_linear_to_flax(ref.temporal_sampling_offsets),
            "temporal_attention_weights":
                _torch_linear_to_flax(ref.temporal_attention_weights),
            "value_proj": _torch_linear_to_flax(ref.value_proj),
            "output_proj": _torch_linear_to_flax(ref.output_proj),
        }}

    def test_temporal_encoder_parity(self, ref_modules, rng):
        """Vectorized temporal encoder vs the reference's per-frame loop
        (reference L417-464), weights transplanted, all-frames connectivity."""
        d_model, n_heads, Pc, Pt, L = 64, 4, 2, 2, len(SHAPES)
        T = 3
        W = T - 1
        ref = ref_modules.TemporalMSDeformAttnEncoder(
            n_frames=T, d_model=d_model, n_levels=L, t_window=W,
            n_heads=n_heads, n_curr_points=Pc, n_temporal_points=Pt)
        ref.eval()
        # de-randomize the value/output projections deterministically
        for lin in (ref.value_proj, ref.output_proj):
            torch.nn.init.uniform_(lin.weight, -0.1, 0.1)
            torch.nn.init.uniform_(lin.bias, -0.05, 0.05)
        torch.nn.init.uniform_(ref.attention_weights.weight, -0.1, 0.1)
        torch.nn.init.uniform_(ref.temporal_attention_weights.weight, -0.1, 0.1)
        torch.nn.init.uniform_(ref.sampling_offsets.weight, -0.02, 0.02)
        torch.nn.init.uniform_(ref.temporal_sampling_offsets.weight, -0.02, 0.02)

        Lq = S
        query = rng.randn(T, Lq, d_model).astype(np.float32)
        flat = rng.randn(T, S, d_model).astype(np.float32)
        refpts = rng.rand(T, Lq, L, 2).astype(np.float32)

        shapes_t = torch.tensor(SHAPES, dtype=torch.long)
        starts_t = torch.tensor([0, 192, 240], dtype=torch.long)
        tshapes_t = shapes_t.repeat(W, 1)
        tstarts = torch.cumsum(
            torch.cat([torch.zeros(1, dtype=torch.long),
                       (tshapes_t[:, 0] * tshapes_t[:, 1])[:-1]]), 0)
        toffsets = [torch.tensor([f - t for f in range(T) if f != t],
                                 dtype=torch.long) for t in range(T)]
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(query), torch.from_numpy(refpts),
                          torch.from_numpy(flat), (shapes_t, tshapes_t),
                          (starts_t, tstarts), toffsets)[0].numpy()

        from devis_tpu.models.attention import TemporalMSDeformAttnEncoder
        mine = TemporalMSDeformAttnEncoder(
            n_frames=T, d_model=d_model, n_levels=L, t_window=W,
            n_heads=n_heads, n_curr_points=Pc, n_temporal_points=Pt,
            impl="xla", connect_all=True)
        out_mine = mine.apply(self._transplant_temporal(ref),
                              jnp.asarray(query), jnp.asarray(refpts),
                              jnp.asarray(flat), SHAPES)
        np.testing.assert_allclose(np.asarray(out_mine), out_ref,
                                   rtol=5e-4, atol=5e-5)

    def test_temporal_decoder_parity(self, ref_modules, rng):
        """Instance-aware temporal decoder vs the reference (L288-414),
        2-dim reference points."""
        d_model, n_heads, Pc, Pt, L = 64, 4, 2, 2, len(SHAPES)
        T = 3
        W = T - 1
        ref = ref_modules.TemporalMSDeformAttnDecoder(
            n_frames=T, d_model=d_model, n_levels=L, t_window=W,
            n_heads=n_heads, n_curr_points=Pc, n_temporal_points=Pt,
            dec_instance_aware_att=True)
        ref.eval()
        for lin in (ref.value_proj, ref.output_proj,
                    ref.attention_weights, ref.temporal_attention_weights):
            torch.nn.init.uniform_(lin.weight, -0.1, 0.1)
        torch.nn.init.uniform_(ref.sampling_offsets.weight, -0.02, 0.02)
        torch.nn.init.uniform_(ref.temporal_sampling_offsets.weight, -0.02, 0.02)

        Lq = 8
        query = rng.randn(1, T * Lq, d_model).astype(np.float32)
        flat = rng.randn(T, S, d_model).astype(np.float32)
        refpts = rng.rand(1, T * Lq, L, 2).astype(np.float32)

        shapes_t = torch.tensor(SHAPES, dtype=torch.long)
        starts_t = torch.tensor([0, 192, 240], dtype=torch.long)
        tshapes_t = shapes_t.repeat(W, 1)
        tstarts = torch.cumsum(
            torch.cat([torch.zeros(1, dtype=torch.long),
                       (tshapes_t[:, 0] * tshapes_t[:, 1])[:-1]]), 0)
        toffsets = [torch.tensor([f - t for f in range(T) if f != t],
                                 dtype=torch.long) for t in range(T)]
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(query), torch.from_numpy(refpts),
                          torch.from_numpy(flat), (shapes_t, tshapes_t),
                          (starts_t, tstarts), toffsets)[0].numpy()

        from devis_tpu.models.attention import TemporalMSDeformAttnDecoder
        mine = TemporalMSDeformAttnDecoder(
            n_frames=T, d_model=d_model, n_levels=L, t_window=W,
            n_heads=n_heads, n_curr_points=Pc, n_temporal_points=Pt,
            impl="xla", instance_aware=True)
        out_mine = mine.apply(self._transplant_temporal(ref),
                              jnp.asarray(query), jnp.asarray(refpts),
                              jnp.asarray(flat), SHAPES)
        np.testing.assert_allclose(np.asarray(out_mine), out_ref,
                                   rtol=5e-4, atol=5e-5)

    def test_ref_box_modulated_sampling(self, ref_modules, rng):
        """4-dim reference boxes use the box-modulated offset formula
        (reference L118-121)."""
        d_model, n_heads, n_points, L = 64, 4, 2, len(SHAPES)
        ref = ref_modules.MSDeformAttn(d_model=d_model, n_levels=L,
                                       n_heads=n_heads, n_points=n_points)
        ref.eval()
        from devis_tpu.models.attention import MSDeformAttn as Mine
        mine = Mine(d_model=d_model, n_levels=L, n_heads=n_heads,
                    n_points=n_points, impl="xla")
        B, Lq = 1, 12
        query = rng.randn(B, Lq, d_model).astype(np.float32)
        value = rng.randn(B, S, d_model).astype(np.float32)
        boxes = np.concatenate([rng.rand(B, Lq, L, 2) * 0.6 + 0.2,
                                rng.rand(B, Lq, L, 2) * 0.3 + 0.05],
                               axis=-1).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(query), torch.from_numpy(boxes),
                          torch.from_numpy(value),
                          torch.tensor(SHAPES, dtype=torch.long),
                          torch.tensor([0, 192, 240], dtype=torch.long),
                          None)[0].numpy()
        params = {"params": {
            "sampling_offsets": _torch_linear_to_flax(ref.sampling_offsets),
            "attention_weights": _torch_linear_to_flax(ref.attention_weights),
            "value_proj": _torch_linear_to_flax(ref.value_proj),
            "output_proj": _torch_linear_to_flax(ref.output_proj),
        }}
        out_mine = mine.apply(params, jnp.asarray(query), jnp.asarray(boxes),
                              jnp.asarray(value), SHAPES)
        np.testing.assert_allclose(np.asarray(out_mine), out_ref,
                                   rtol=2e-4, atol=2e-5)
