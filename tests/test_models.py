"""End-to-end model forward tests (tiny shapes, CPU).

Verifies that each model family builds from reference-style configs, runs
forward under jit with static shapes, produces finite outputs of the right
shapes, and composes with the criterion.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devis_tpu.config import get_cfg_defaults
from devis_tpu.models import build_model
from devis_tpu.models.criterion import (build_weight_dict, clip_criterion,
                                        image_criterion, weighted_total)


def _small_cfg(vis=False, mask_on=False):
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 2
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    cfg.MODEL.NUM_QUERIES = 12
    cfg.MODEL.MASK_ON = mask_on
    cfg.TEST.NUM_OUT = 5
    if vis:
        cfg.DATASETS.TYPE = "vis"
        cfg.MODEL.DEVIS.NUM_FRAMES = 3
        cfg.MODEL.NUM_QUERIES = 12      # 4 per frame
        cfg.SOLVER.BATCH_SIZE = 1
    return cfg


@pytest.fixture(scope="module")
def rng_np():
    return np.random.RandomState(1)


class TestImageModel:
    @pytest.mark.slow
    def test_segm_forward_train_and_criterion(self, rng_np):
        cfg = _small_cfg(mask_on=True)
        model = build_model(num_classes=7, cfg=cfg)
        B, H, W, N = 2, 64, 96, 3
        imgs = jnp.asarray(rng_np.rand(B, H, W, 3), jnp.float32)
        mask = np.zeros((B, H, W), bool)
        mask[0, 48:, :] = True
        targets = {
            "labels": jnp.asarray(rng_np.randint(0, 6, (B, N)), jnp.int32),
            "boxes": jnp.asarray(rng_np.rand(B, N, 4) * 0.4 + 0.3, jnp.float32),
            "valid": jnp.asarray([[True, True, False], [True, False, False]]),
            "masks": jnp.asarray(rng_np.rand(B, N, H, W) > 0.7, jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), imgs, jnp.asarray(mask),
                               targets=targets, train=True)

        @jax.jit
        def fwd(v, imgs, mask):
            return model.apply(v, imgs, mask, targets=targets, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               deterministic=False)

        out = fwd(variables, imgs, jnp.asarray(mask))
        assert out["pred_logits"].shape == (B, 12, 7)
        assert out["pred_boxes"].shape == (B, 12, 4)
        assert out["pred_masks"].shape[:2] == (B, N)
        assert "pred_masks" in out["aux_outputs"][0]

        losses = image_criterion(
            out, targets, num_classes=6,
            matcher_cfg=dict(cost_class=2.0, cost_bbox=5.0, cost_giou=2.0),
            mask_on=True)
        wd = build_weight_dict(cfg)
        total = weighted_total(losses, wd)
        assert np.isfinite(float(total))
        assert "loss_mask" in losses and "loss_mask_0" in losses

    @pytest.mark.slow
    def test_segm_forward_eval(self, rng_np):
        cfg = _small_cfg(mask_on=True)
        model = build_model(num_classes=7, cfg=cfg)
        B, H, W = 1, 64, 64
        imgs = jnp.asarray(rng_np.rand(B, H, W, 3), jnp.float32)
        mask = jnp.zeros((B, H, W), bool)
        variables = model.init(jax.random.PRNGKey(0), imgs, mask)
        out = jax.jit(lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, imgs, mask)
        tk = out["top_k"]
        assert tk["scores"].shape == (B, 5)
        assert tk["masks"].shape[:2] == (B, 5)
        assert bool(jnp.all(tk["scores"][:, :-1] >= tk["scores"][:, 1:]))


class TestDeVISModel:
    @pytest.mark.slow
    def test_forward_train_and_criterion(self, rng_np):
        cfg = _small_cfg(vis=True)
        model = build_model(num_classes=5, cfg=cfg)
        T, H, W, N = 3, 64, 64, 2
        imgs = jnp.asarray(rng_np.rand(T, H, W, 3), jnp.float32)
        mask = jnp.zeros((T, H, W), bool)
        targets = {
            "labels": jnp.asarray(rng_np.randint(0, 4, (N,)), jnp.int32),
            "boxes": jnp.asarray(rng_np.rand(N, T, 4) * 0.4 + 0.3, jnp.float32),
            "valid": jnp.asarray([[True, True, True], [True, False, True]]),
            "exists": jnp.asarray([True, True]),
            "masks": jnp.asarray(rng_np.rand(N, T, H, W) > 0.7, jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), imgs, mask,
                               targets=targets, train=True)
        out = jax.jit(lambda v, i, m: model.apply(
            v, i, m, targets=targets, train=True))(variables, imgs, mask)
        assert out["pred_logits"].shape == (1, T * 4, 5)
        assert out["pred_masks"].shape[:2] == (N, T)

        losses = clip_criterion(
            out, targets, num_classes=4, num_frames=T,
            matcher_cfg=dict(cost_class=2.0, cost_bbox=5.0, cost_giou=2.0),
            mask_on=True)
        wd = build_weight_dict(cfg)
        total = weighted_total(losses, wd)
        assert np.isfinite(float(total)), losses

    @pytest.mark.slow
    def test_forward_eval(self, rng_np):
        cfg = _small_cfg(vis=True)
        model = build_model(num_classes=5, cfg=cfg)
        T, H, W = 3, 64, 64
        imgs = jnp.asarray(rng_np.rand(T, H, W, 3), jnp.float32)
        mask = jnp.zeros((T, H, W), bool)
        variables = model.init(jax.random.PRNGKey(0), imgs, mask)
        out, results = jax.jit(lambda v, i, m, cl: model.apply(
            v, i, m, train=False, clip_length=cl))(
            variables, imgs, mask, jnp.asarray(T))
        assert results["scores"].shape == (T, 5)
        assert results["labels"].shape == (5,)
        assert results["boxes"].shape == (T, 5, 4)
        # Nq=4 <= num_out=5 → masks computed for all 4 trajectories
        assert results["masks"].shape[:2] == (4, T)
        assert results["mask_gather"].shape == (5,)
        assert bool(jnp.isfinite(results["masks"]).all())

    @pytest.mark.slow
    def test_ablation_no_temporal(self, rng_np):
        cfg = _small_cfg(vis=True)
        cfg.MODEL.DEVIS.DEFORMABLE_ATTENTION.DISABLE_TEMPORAL_CONNECTIONS = True
        model = build_model(num_classes=5, cfg=cfg)
        T, H, W = 3, 64, 64
        imgs = jnp.asarray(rng_np.rand(T, H, W, 3), jnp.float32)
        mask = jnp.zeros((T, H, W), bool)
        variables = model.init(jax.random.PRNGKey(0), imgs, mask)
        out, results = model.apply(variables, imgs, mask, train=False)
        assert results["scores"].shape == (T, 5)


def test_resnet_stem_space_to_depth_exact(rng_np):
    """The 4x4/s1 space-to-depth stem reformulation must equal the plain
    7x7/s2 conv bit-for-bit in f32 (even H/W), and the odd-H/W fallback
    must use the direct conv (reference resnet stem, torchvision conv1)."""
    from devis_tpu.models.backbones.resnet import _stem_conv, _StemParams
    import flax.linen as nn

    class Direct(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = _StemParams(name="conv1")().astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

    class S2D(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _stem_conv(self, x, x.dtype)

    for H, W in [(32, 48), (30, 34), (31, 48), (32, 45)]:
        x = jnp.asarray(rng_np.randn(2, H, W, 3), jnp.float32)
        params = Direct().init(jax.random.PRNGKey(0), x)
        want = Direct().apply(params, x)
        got = S2D().apply(params, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestChannelFirstMaskHead:
    """The channel-first mask-head spine must match the NHWC spine exactly
    (same parameter tree, layout-only change)."""

    def test_groupnorm_cf_matches_flax(self, rng_np):
        import flax.linen as nn
        from devis_tpu.models.segmentation import GroupNormCF

        x = jnp.asarray(rng_np.randn(2, 16, 6, 10), jnp.float32)
        ref = nn.GroupNorm(num_groups=8, epsilon=1e-5)
        cf = GroupNormCF(num_groups=8, epsilon=1e-5)
        v = ref.init(jax.random.PRNGKey(0), jnp.transpose(x, (0, 2, 3, 1)))
        # random affine params, shared between the two modules
        v = jax.tree.map(
            lambda p: jnp.asarray(rng_np.randn(*p.shape), p.dtype), v)
        y_ref = ref.apply(v, jnp.transpose(x, (0, 2, 3, 1)))
        y_cf = cf.apply(v, x)
        np.testing.assert_allclose(np.asarray(jnp.transpose(y_cf, (0, 2, 3, 1))),
                                   np.asarray(y_ref), rtol=2e-5, atol=2e-5)

    def test_spine_matches_nhwc(self, rng_np):
        from devis_tpu.models.segmentation import MaskHeadConv

        B, N = 1, 3
        feats = [jnp.asarray(rng_np.randn(B, 8, 12, 24), jnp.float32),
                 jnp.asarray(rng_np.randn(B, 16, 24, 12), jnp.float32),
                 jnp.asarray(rng_np.randn(B, 32, 48, 8), jnp.float32)]
        heads = 8
        bbox_masks = [
            jnp.asarray(rng_np.rand(B * N, heads, f.shape[1], f.shape[2]),
                        jnp.float32)
            for f in feats[:2]]
        kw = dict(dim=64, fpn_dims=(12, 8), nheads=heads,
                  use_deformable_conv=True, num_att_levels=2)
        nhwc = MaskHeadConv(channel_first_spine=False, **kw)
        cf = MaskHeadConv(channel_first_spine=True, **kw)
        variables = nhwc.init(jax.random.PRNGKey(3), feats, bbox_masks,
                              expand=N)
        # identical parameter trees: CF must accept the NHWC-initialized tree
        y_nhwc = nhwc.apply(variables, feats, bbox_masks, expand=N)
        y_cf = cf.apply(variables, feats, bbox_masks, expand=N)
        assert y_nhwc.shape == y_cf.shape
        # offset convs are zero-init → all taps in-band → banded == exact
        np.testing.assert_allclose(np.asarray(y_cf), np.asarray(y_nhwc),
                                   rtol=2e-4, atol=2e-4)


class TestTransformerRemat:
    """TPU.TRANSFORMER_GRADIENT_CHECKPOINT (per-layer nn.remat — needed to
    fit SwinL training in one 16 GB chip) must not change the math: grads
    are bit-identical to the no-remat transformer."""

    def test_remat_layers_grads_bit_identical(self, rng_np):
        from devis_tpu.models.transformer import DeformableTransformer
        SH = ((8, 8), (4, 4))
        kwargs = dict(d_model=32, n_heads=2, num_encoder_layers=1,
                      num_decoder_layers=1, dim_feedforward=64,
                      num_feature_levels=len(SH), variant="image", impl="xla")
        srcs = [jnp.asarray(rng_np.rand(1, h, w, 32), jnp.float32)
                for h, w in SH]
        masks = [jnp.zeros((1, h, w), bool) for h, w in SH]
        pos = [jnp.asarray(rng_np.rand(1, h, w, 32), jnp.float32)
               for h, w in SH]
        qe = jnp.asarray(rng_np.rand(10, 64), jnp.float32)
        tr_r = DeformableTransformer(remat_layers=True, **kwargs)
        tr_n = DeformableTransformer(remat_layers=False, **kwargs)
        variables = tr_n.init(jax.random.PRNGKey(0), srcs, masks, pos, qe)

        def loss(v, tr):
            out = tr.apply(v, srcs, masks, pos, qe)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in jax.tree.leaves(out) if hasattr(o, "astype"))

        g_r = jax.grad(lambda v: loss(v, tr_r))(variables)
        g_n = jax.grad(lambda v: loss(v, tr_n))(variables)
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_n)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
