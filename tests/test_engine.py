"""Engine tests: LR param groups, MultiStepLR schedule, SPMD train step over
the 8-device CPU mesh (the driver's dryrun layout)."""
import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devis_tpu.config import get_cfg_defaults
from devis_tpu.datasets import collate_clip, collate_images
from devis_tpu.datasets.synthetic import (SyntheticCocoDataset,
                                          SyntheticVISDataset)
from devis_tpu.engine import (create_train_state, group_base_lrs,
                              make_train_step, match_name_keywords,
                              multistep_schedule, param_labels)
from devis_tpu.models import build_model
from devis_tpu.parallel import make_mesh, replicate, shard_batch


def _vis_cfg():
    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "vis"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
    cfg.MODEL.DEVIS.NUM_FRAMES = 2
    cfg.MODEL.NUM_QUERIES = 8
    cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
    return cfg


class TestParamGroups:
    def test_match_name_keywords_backbone_canonicalization(self):
        # reference keyword 'backbone.0' must hit flax paths 'detr.backbone.*'
        assert match_name_keywords("detr.backbone.layer2_0.conv1.kernel",
                                   ["backbone.0"])
        assert not match_name_keywords("detr.bbox_embed_0.kernel",
                                       ["backbone.0"])

    @pytest.mark.slow
    def test_group_assignment(self):
        cfg = _vis_cfg()
        cfg.freeze()
        model = build_model(num_classes=7, cfg=cfg)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                       jnp.zeros((2, 32, 32), bool), train=False)
        labels = param_labels(v["params"], cfg)
        flat = {".".join(str(k.key) for k in p): l for p, l in
                jax.tree_util.tree_flatten_with_path(labels)[0]}
        assert flat["detr.transformer.encoder_layers_0.self_attn."
                    "sampling_offsets.kernel"] == "linear_proj"
        assert flat["detr.transformer.encoder_layers_0.self_attn."
                    "temporal_sampling_offsets.kernel"] == "temporal_linear_proj"
        assert flat["detr.transformer.reference_points.kernel"] == "linear_proj"
        assert flat["mask_head.lay1.weight"] == "mask_head"
        assert flat["bbox_attention.q_linear.kernel"] == "mask_head"
        assert flat["detr.backbone.layer2_0.conv1.kernel"] == "backbone"
        assert flat["detr.backbone.conv1.kernel"] == "frozen"
        assert flat["detr.backbone.layer1_0.conv1.kernel"] == "frozen"
        assert flat["detr.query_embed"] == "base"
        counts = collections.Counter(flat.values())
        assert set(counts) == {"base", "backbone", "linear_proj", "mask_head",
                               "temporal_linear_proj", "frozen"}

    def test_group_lrs_match_reference(self):
        cfg = get_cfg_defaults()
        lrs = group_base_lrs(cfg)
        assert lrs["base"] == pytest.approx(2e-4)
        assert lrs["backbone"] == pytest.approx(2e-5)
        assert lrs["linear_proj"] == pytest.approx(2e-5)
        assert lrs["temporal_linear_proj"] == pytest.approx(2e-5)


class TestSchedule:
    def test_multistep(self):
        sched = multistep_schedule(1.0, milestones=[2, 4], gamma=0.1,
                                   steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(19)) == pytest.approx(1.0)
        assert float(sched(20)) == pytest.approx(0.1)
        assert float(sched(40)) == pytest.approx(0.01)


class TestTrainStep:
    @pytest.mark.slow
    def test_vis_spmd_step_8dev(self):
        cfg = _vis_cfg()
        cfg.freeze()
        model = build_model(num_classes=7, cfg=cfg)
        H, W = 64, 96
        ds = SyntheticVISDataset(num_frames=2, n_videos=4, video_len=4,
                                 size=(H, W))
        clips = [collate_clip(ds[i % len(ds)], (H, W), max_instances=4)
                 for i in range(8)]
        batch = jax.tree.map(lambda *xs: np.stack(xs), *clips)
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"][0],
            jnp.asarray(batch["pad_mask"][0]),
            targets=jax.tree.map(lambda x: x[0], batch["targets"]), train=True)
        state = create_train_state(cfg, variables, steps_per_epoch=10)
        mesh = make_mesh()
        assert mesh.devices.size == 8
        state = replicate(state, mesh)
        sb = shard_batch(batch, mesh)
        step = make_train_step(model, cfg, num_classes=7)
        rng = jax.random.PRNGKey(42)
        state, m1 = step(state, sb, rng)
        state, m2 = step(state, sb, rng)
        assert float(m1["finite"]) == 1.0
        assert np.isfinite(float(m2["loss"]))
        assert int(state.step) == 2
        # frozen params must not move
        p = jax.device_get(state.params)
        assert float(m2["grad_norm"]) > 0.0

    @pytest.mark.slow
    def test_frozen_params_stay_fixed_and_loss_decreases(self):
        cfg = _vis_cfg()
        cfg.freeze()
        model = build_model(num_classes=7, cfg=cfg)
        H, W = 64, 96
        ds = SyntheticVISDataset(num_frames=2, n_videos=2, video_len=4,
                                 size=(H, W))
        clips = [collate_clip(ds[0], (H, W), max_instances=4)]
        batch = jax.tree.map(lambda *xs: np.stack(xs), *clips)
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"][0],
            jnp.asarray(batch["pad_mask"][0]),
            targets=jax.tree.map(lambda x: x[0], batch["targets"]), train=True)
        state = create_train_state(cfg, variables, steps_per_epoch=100)
        step = make_train_step(model, cfg, num_classes=7)
        before = np.asarray(state.params["detr"]["backbone"]["conv1"]["kernel"])
        base_before = np.asarray(state.params["detr"]["query_embed"])
        losses = []
        rng = jax.random.PRNGKey(3)
        for _ in range(4):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        after = np.asarray(state.params["detr"]["backbone"]["conv1"]["kernel"])
        base_after = np.asarray(state.params["detr"]["query_embed"])
        np.testing.assert_array_equal(before, after)
        assert not np.array_equal(base_before, base_after)
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_image_step(self):
        cfg = get_cfg_defaults()
        cfg.MODEL.MASK_ON = True
        cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
        cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
        cfg.MODEL.NUM_QUERIES = 8
        cfg.MODEL.LOSS.MASK_AUX_LOSS = [0]
        cfg.freeze()
        model = build_model(num_classes=7, cfg=cfg)
        ds = SyntheticCocoDataset(n_images=2, size=(64, 96))
        batch = collate_images([ds[0], ds[1]], (64, 96), max_instances=4)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["images"]),
            jnp.asarray(batch["pad_mask"]), targets=batch["targets"],
            train=True)
        state = create_train_state(cfg, variables, steps_per_epoch=10)
        step = make_train_step(model, cfg, num_classes=7)
        state, m = step(state, batch, jax.random.PRNGKey(5))
        assert float(m["finite"]) == 1.0
        assert np.isfinite(float(m["loss"]))


class TestEmptyTargetClip:
    @pytest.mark.slow
    def test_all_invalid_targets_through_jitted_step(self):
        """All-`exists=False` clip (no GT instances at all) through the
        jitted train step: BIG_COST-neutralized matcher columns + masked
        losses must stay finite and produce usable gradients (the reference
        short-circuits this case host-side, matcher.py:61-71; our static-
        shape path must be numerically safe instead)."""
        cfg = _vis_cfg()
        cfg.freeze()
        model = build_model(num_classes=7, cfg=cfg)
        H, W = 64, 96
        ds = SyntheticVISDataset(num_frames=2, n_videos=2, video_len=4,
                                 size=(H, W))
        clip = collate_clip(ds[0], (H, W), max_instances=4)
        # wipe every target slot
        clip["targets"]["exists"][:] = False
        clip["targets"]["valid"][:] = False
        batch = jax.tree.map(lambda *xs: np.stack(xs), *[clip])
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"][0],
            jnp.asarray(batch["pad_mask"][0]),
            targets=jax.tree.map(lambda x: x[0], batch["targets"]), train=True)
        state = create_train_state(cfg, variables, steps_per_epoch=10)
        step = make_train_step(model, cfg, num_classes=7)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        assert float(m["finite"]) == 1.0, "NaN/Inf with empty targets"
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))
        # focal no-object loss still produces a training signal
        assert float(m["grad_norm"]) > 0.0
