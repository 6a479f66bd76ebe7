"""FULL-MODEL numerical parity against the genuine reference implementation.

Builds the reference `DeformableDETRSegm` (image) and `DeVIS` (video) torch
models from `/root/reference/src` on CPU — via the reference's own
`build_model` (`src/models/__init__.py:15`) — with the CUDA op replaced by the
reference's pure-PyTorch oracle and torchvision's ResNet-50 recreated locally
(torchvision is not installed; both sides consume the SAME transplanted
weights, so any architectural mismatch in the stand-in shows up as an output
mismatch). Random-init weights are transplanted torch→flax through
`util/checkpoint.py` with strict coverage, then the whole forwards are
compared: pred_logits / pred_boxes over all queries, Hungarian-matched mask
logits (image, reference `deformable_segmentation.py:231-241`), and the
eval-path trajectory results (video, reference `devis_segmentation.py:87-115`).

This is the strongest accuracy evidence obtainable without released
checkpoints (reference weights/ is empty in this environment).

The mask heads run with USE_MDC=False (plain convs): torchvision's
`deform_conv2d` is unavailable for the reference side; our modulated
deformable conv has its own oracle parity + gradient tests
(tests/test_deform_conv.py).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

REF = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision ResNet-50 stand-in (state-dict compatible with torchvision)
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers, norm_layer):
        super().__init__()
        self.inplanes = 64
        self._norm = norm_layer
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                self._norm(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              self._norm)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self.inplanes, planes,
                                      norm_layer=self._norm))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter transcription."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = {}
        for name, module in model.named_children():
            layers[name] = module
            if name in return_layers:
                del return_layers[name]
            if not return_layers:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = {}
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install_ref_env():
    """Reference `build_model` with CUDA/third-party stubs installed."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ["MultiScaleDeformableAttention", "visdom", "pycocotools",
                 "pycocotools.mask", "timm", "timm.models",
                 "timm.models.layers"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["visdom"].Visdom = object
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    tv.__version__ = "0.0"
    for sub in ["torchvision.models", "torchvision.ops",
                "torchvision.ops.boxes", "torchvision.models._utils",
                "torchvision.datasets"]:
        sys.modules.setdefault(sub, types.ModuleType(sub))

    def _resnet50(replace_stride_with_dilation=None, pretrained=False,
                  norm_layer=None, **kw):
        assert not any(replace_stride_with_dilation or []), \
            "DC5 not exercised here"
        return _ResNet([3, 4, 6, 3], norm_layer)

    sys.modules["torchvision.models"].resnet50 = _resnet50
    tv.models = sys.modules["torchvision.models"]
    sys.modules["torchvision.models._utils"].IntermediateLayerGetter = \
        _IntermediateLayerGetter
    sys.modules["torchvision.ops"].deform_conv2d = lambda *a, **k: None

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    sys.modules["torchvision.ops.boxes"].box_area = box_area
    sys.modules["timm.models.layers"].DropPath = nn.Identity
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

    import src.models as ref_models
    return ref_models.build_model


@pytest.fixture(scope="module")
def ref_build():
    return install_ref_env()


def _image_cfg():
    from devis_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 2
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
    cfg.MODEL.NUM_QUERIES = 10
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.MASK_HEAD.USE_MDC = False
    cfg.MODEL.LOSS.MASK_AUX_LOSS = []
    cfg.TEST.NUM_OUT = 5
    return cfg


def _vis_cfg():
    cfg = _image_cfg()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.DEVIS.NUM_FRAMES = 3
    cfg.MODEL.NUM_QUERIES = 12
    cfg.SOLVER.BATCH_SIZE = 1
    return cfg


def _transplant(ref_model, our_model, imgs_shape, vis=False):
    """torch state dict → flax variables through the production converter."""
    from devis_tpu.util.checkpoint import torch_to_flax_variables
    state = {k: v.detach().cpu().numpy()
             for k, v in ref_model.state_dict().items()}
    # Under box refine the reference decoder holds ALIASES of the per-layer
    # heads (`self.transformer.decoder.bbox_embed = self.bbox_embed`,
    # deformable_detr.py:100-117) — duplicate state-dict entries; verify the
    # aliasing and drop them.
    for k in list(state):
        m = k.split("transformer.decoder.")
        if len(m) == 2 and m[1].startswith(("bbox_embed", "class_embed",
                                            "ref_point_embed")):
            canon = m[0] + m[1]
            if canon in state:
                np.testing.assert_array_equal(state[k], state[canon])
                del state[k]
    T, H, W = imgs_shape
    imgs = jnp.zeros((T, H, W, 3), jnp.float32)
    mask = jnp.zeros((T, H, W), bool)
    template = jax.eval_shape(our_model.init, jax.random.PRNGKey(0), imgs,
                              mask)
    variables, missing, unused = torch_to_flax_variables(state, template,
                                                         strict=True)
    assert not missing, f"params not covered by the reference: {missing[:8]}"
    assert not unused, f"reference params not consumed: {unused[:8]}"
    return variables


class TestImageModelFullParity:
    @pytest.mark.slow
    def test_whole_forward(self, ref_build, rng):
        cfg = _image_cfg()
        cfg.freeze()
        num_classes = 7

        torch.manual_seed(0)
        ref_model, _, _ = ref_build(num_classes, "cpu", cfg)
        ref_model.eval()

        from devis_tpu.models import build_model
        our_model = build_model(num_classes=num_classes, cfg=cfg)

        B, H, W = 2, 64, 96
        variables = _transplant(ref_model, our_model, (B, H, W))

        imgs = rng.rand(B, H, W, 3).astype(np.float32)
        pad = np.zeros((B, H, W), bool)
        pad[1, 48:, :] = True           # image 1 is 48x96 + padding
        pad[1, :, 80:] = True           # ... and 48x80 actually
        imgs[1][pad[1]] = 0.0

        # two GT instances per image, boxes normalized cxcywh
        labels = np.array([[1, 3], [2, 5]], np.int32)
        boxes = np.array([[[0.3, 0.4, 0.2, 0.3], [0.7, 0.6, 0.2, 0.2]],
                          [[0.4, 0.3, 0.3, 0.2], [0.6, 0.7, 0.15, 0.2]]],
                         np.float32)
        valid = np.ones((2, 2), bool)

        from src.util.misc import NestedTensor
        t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous()
        t_mask = torch.from_numpy(pad)
        t_targets = [{"labels": torch.from_numpy(labels[b]).long(),
                      "boxes": torch.from_numpy(boxes[b])}
                     for b in range(B)]
        with torch.no_grad():
            out_ref, _ = ref_model(NestedTensor(t_imgs, t_mask), t_targets)

        targets = {"labels": jnp.asarray(labels), "boxes": jnp.asarray(boxes),
                   "valid": jnp.asarray(valid)}
        out = our_model.apply(variables, jnp.asarray(imgs), jnp.asarray(pad),
                              targets=targets, train=False)

        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]),
            out_ref["pred_logits"].numpy(), rtol=2e-3, atol=2e-4,
            err_msg="pred_logits")
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"]),
            out_ref["pred_boxes"].numpy(), rtol=2e-3, atol=2e-4,
            err_msg="pred_boxes")

        # Hungarian match must agree, then matched mask logits must agree.
        ref_indices = out_ref["indices"]
        our_src = np.asarray(out["indices"])               # (B, N_slots)
        ref_masks = out_ref["pred_masks"].numpy()[:, 0]    # drop channel dim
        our_masks = np.asarray(out["pred_masks"])          # (B, N_slots, h, w)
        k = 0
        for b in range(B):
            src_b, tgt_b = (x.numpy() for x in ref_indices[b])
            for src, tgt in zip(src_b, tgt_b):
                assert our_src[b, tgt] == src, (b, tgt, src, our_src[b])
                # float32 drift amplifies through the 6-layer conv+GN FPN
                # cascade over 2-3 px maps — looser than the logits check
                np.testing.assert_allclose(
                    our_masks[b, tgt], ref_masks[k], rtol=2e-2, atol=2e-3,
                    err_msg=f"mask b={b} tgt={tgt}")
                k += 1

        # top-k eval results agree (scores/labels after the same top-k rule)
        res = out["top_k"]
        proc = out_ref["pre_computed_results"]
        np.testing.assert_allclose(np.asarray(res["scores"]),
                                   proc["scores"].numpy(), rtol=2e-3,
                                   atol=2e-4)
        np.testing.assert_array_equal(
            np.asarray(res["query_top_k_indexes"]),
            out_ref["query_top_k_indexes"].numpy())


class TestDeVISFullParity:
    @pytest.mark.slow
    def test_whole_eval_forward(self, ref_build, rng):
        cfg = _vis_cfg()
        cfg.freeze()
        num_classes = 7
        T = cfg.MODEL.DEVIS.NUM_FRAMES

        torch.manual_seed(0)
        ref_model, _, _ = ref_build(num_classes, "cpu", cfg)
        ref_model.eval()

        from devis_tpu.models import build_model
        our_model = build_model(num_classes=num_classes, cfg=cfg)

        H, W = 64, 96
        variables = _transplant(ref_model, our_model, (T, H, W), vis=True)

        imgs = rng.rand(T, H, W, 3).astype(np.float32)
        pad = np.zeros((T, H, W), bool)

        from src.util.misc import NestedTensor
        t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous()
        t_mask = torch.from_numpy(pad)
        ref_targets = {"tgt_size": (H, W), "clip_length": T}
        with torch.no_grad():
            results_ref = ref_model(NestedTensor(t_imgs, t_mask), ref_targets)

        out, res = our_model.apply(variables, jnp.asarray(imgs),
                                   jnp.asarray(pad), train=False,
                                   clip_length=jnp.asarray(T))

        # trajectory top-k: scores (T, K), labels (K,) — reference labels are
        # +1 (tracker convention, devis_segmentation.py:144-147)
        np.testing.assert_allclose(np.asarray(res["scores"]),
                                   results_ref["scores"].numpy(),
                                   rtol=2e-3, atol=2e-4, err_msg="scores")
        np.testing.assert_array_equal(
            np.asarray(res["labels"]) + 1,
            results_ref["labels"][0].numpy(), err_msg="labels")

        # boxes: ours cxcywh normalized; reference absolute xyxy clamped
        b = np.asarray(res["boxes"])                       # (T, K, 4)
        xy = np.stack([(b[..., 0] - b[..., 2] / 2) * W,
                       (b[..., 1] - b[..., 3] / 2) * H,
                       (b[..., 0] + b[..., 2] / 2) * W,
                       (b[..., 1] + b[..., 3] / 2) * H], axis=-1)
        xy[..., 0::2] = xy[..., 0::2].clip(0, W)
        xy[..., 1::2] = xy[..., 1::2].clip(0, H)
        np.testing.assert_allclose(xy, results_ref["boxes"].numpy(),
                                   rtol=2e-3, atol=2e-3, err_msg="boxes")

        # masks: reference (T, n_unique, h, w) with inverse_idxs k→column;
        # ours (Nm, T, h, w) with mask_gather k→row.
        ref_masks = results_ref["masks"].numpy()
        inv = results_ref["inverse_idxs"].numpy()
        our_masks = np.asarray(res["masks"])
        gather = np.asarray(res["mask_gather"])
        K = gather.shape[0]
        for k in range(K):
            np.testing.assert_allclose(
                our_masks[gather[k]],                       # (T, h, w)
                ref_masks[:, inv[k]], rtol=5e-3, atol=5e-4,
                err_msg=f"mask top-k {k}")
