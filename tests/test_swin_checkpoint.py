"""Swin torch→flax key mapping validated against the ACTUAL reference Swin
module's state dict (imported with the same stubs as test_reference_parity)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_swin():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    for name in ["timm", "timm.models", "timm.models.layers",
                 "MultiScaleDeformableAttention", "visdom", "pycocotools",
                 "pycocotools.mask"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["visdom"].Visdom = object
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    tv.__version__ = "0.0"
    for sub in ["torchvision.models", "torchvision.ops",
                "torchvision.ops.boxes", "torchvision.models._utils",
                "torchvision.datasets"]:
        sys.modules.setdefault(sub, types.ModuleType(sub))
    if not hasattr(sys.modules["torchvision.ops"], "deform_conv2d"):
        sys.modules["torchvision.ops"].deform_conv2d = lambda *a, **k: None
        sys.modules["torchvision.ops.boxes"].box_area = lambda b: (
            (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))
        sys.modules["torchvision.models._utils"].IntermediateLayerGetter = object
    sys.modules["timm.models.layers"].DropPath = torch.nn.Identity
    sys.modules["timm.models.layers"].trunc_normal_ = lambda *a, **k: None
    sys.modules["timm.models.layers"].to_2tuple = lambda x: ((x, x)
                                                             if not isinstance(
                                                                 x, tuple)
                                                             else x)
    from src.models.swin_backbone import SwinTransformer
    return SwinTransformer(
        pretrain_img_size=224, patch_size=4, embed_dim=32,
        depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4), window_size=4,
        out_indices=(0, 1, 2, 3))


@pytest.mark.slow
def test_key_mapping_covers_reference_swin(ref_swin):
    """Every key our converter generates for the flax Swin must exist in the
    reference module's state dict (modulo attention-mask buffers, which are
    recomputed, and relative-position indices, which are static)."""
    from devis_tpu.models.backbones.swin import SwinTransformer as Mine
    from devis_tpu.util.checkpoint import flax_variables_to_torch_keys

    mine = Mine(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
                window=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = mine.init(jax.random.PRNGKey(0), x)

    ref_keys = set(ref_swin.state_dict().keys())
    ref_keys = {k for k in ref_keys
                if "relative_position_index" not in k and "attn_mask" not in k}

    gen = flax_variables_to_torch_keys(v)
    missing = [k for k in gen if k not in ref_keys]
    assert not missing, f"keys not in reference Swin: {missing[:8]}"
    unused = ref_keys - set(gen)
    assert not unused, f"reference keys unmapped: {sorted(unused)[:8]}"


@pytest.mark.slow
def test_weight_transplant_roundtrip(ref_swin):
    """Loading the reference Swin's state dict into the flax module must
    succeed strictly and reproduce the qkv weights."""
    from devis_tpu.models.backbones.swin import SwinTransformer as Mine
    from devis_tpu.util.checkpoint import torch_to_flax_variables

    mine = Mine(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
                window=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = mine.init(jax.random.PRNGKey(0), x)
    state = {k: t.detach().numpy() for k, t in ref_swin.state_dict().items()
             if "relative_position_index" not in k and "attn_mask" not in k}
    loaded, missing, unused = torch_to_flax_variables(state, v)
    assert not missing and not unused, (missing[:5], unused[:5])
    got = np.asarray(
        loaded["params"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"])
    want = ref_swin.layers[0].blocks[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)
