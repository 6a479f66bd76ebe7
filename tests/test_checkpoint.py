"""Torch→flax checkpoint converter tests.

Released reference weights are not available offline, so the converter is
validated structurally: a synthetic torch-style state dict is generated from
the model's own parameter tree (via the inverse name/layout mapping), then
converted back and checked for exact coverage and value round-trip.
"""
import numpy as np

import jax
import jax.numpy as jnp

from devis_tpu.config import get_cfg_defaults
from devis_tpu.models import build_model
from devis_tpu.util.checkpoint import (adapt_weights_devis,
                                       flax_variables_to_torch_keys,
                                       prefix_def_detr, shift_class_neurons,
                                       torch_to_flax_variables)


def _tiny_cfg(vis=False):
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER.ENCODER_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DECODER_LAYERS = 2
    cfg.MODEL.NUM_QUERIES = 8
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.HIDDEN_DIM = 128
    cfg.MODEL.DIM_FEEDFORWARD = 64
    if vis:
        cfg.DATASETS.TYPE = "vis"
        cfg.MODEL.DEVIS.NUM_FRAMES = 2
    return cfg


def _template(cfg):
    model = build_model(num_classes=7, cfg=cfg)
    T = cfg.MODEL.DEVIS.NUM_FRAMES if cfg.DATASETS.TYPE == "vis" else 1
    imgs = jnp.zeros((T if cfg.DATASETS.TYPE == "vis" else 2, 64, 64, 3))
    mask = jnp.zeros(imgs.shape[:3], bool)
    return model, jax.eval_shape(
        lambda: build_model(num_classes=7, cfg=cfg).init(
            jax.random.PRNGKey(0), imgs, mask))


class TestConverter:
    def _run_roundtrip(self, cfg):
        model = build_model(num_classes=7, cfg=cfg)
        T = cfg.MODEL.DEVIS.NUM_FRAMES if cfg.DATASETS.TYPE == "vis" else 2
        imgs = jnp.zeros((T, 64, 64, 3))
        mask = jnp.zeros((T, 64, 64), bool)
        # eval_shape: structural template only, no compile
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, mask)

        torch_keys = flax_variables_to_torch_keys(template)
        rng = np.random.RandomState(0)
        state = {k: rng.randn(*s).astype(np.float32) for k, s in torch_keys.items()}
        # decoder self-attn is packed in torch checkpoints
        C = cfg.MODEL.HIDDEN_DIM
        for i in range(cfg.MODEL.TRANSFORMER.DECODER_LAYERS):
            base = "def_detr.transformer.decoder.layers"
            state[f"{base}.{i}.self_attn.in_proj_weight"] = \
                rng.randn(3 * C, C).astype(np.float32)
            state[f"{base}.{i}.self_attn.in_proj_bias"] = \
                rng.randn(3 * C).astype(np.float32)
            state[f"{base}.{i}.self_attn.out_proj.weight"] = \
                rng.randn(C, C).astype(np.float32)
            state[f"{base}.{i}.self_attn.out_proj.bias"] = \
                rng.randn(C).astype(np.float32)

        variables, missing, unused = torch_to_flax_variables(
            state, template, strict=True)
        assert not missing, missing[:5]
        assert not unused, unused[:5]
        return state, variables

    def test_image_segm_full_coverage_and_layout(self):
        cfg = _tiny_cfg(vis=False)
        state, variables = self._run_roundtrip(cfg)
        # Dense transposed: value_proj kernel == torch weight.T
        k = np.asarray(variables["params"]["detr"]["transformer"]
                       ["encoder_layers_0"]["self_attn"]["value_proj"]["kernel"])
        tw = state["def_detr.transformer.encoder.layers.0.self_attn.value_proj.weight"]
        np.testing.assert_array_equal(k, tw.T)
        # Conv OIHW -> HWIO: backbone conv1
        k = np.asarray(variables["params"]["detr"]["backbone"]["conv1"]["kernel"])
        tw = state["def_detr.backbone.0.body.conv1.weight"]
        np.testing.assert_array_equal(k, tw.transpose(2, 3, 1, 0))
        # FrozenBN buffers land in the frozen collection
        rm = np.asarray(variables["frozen"]["detr"]["backbone"]["bn1"]["running_mean"])
        np.testing.assert_array_equal(
            rm, state["def_detr.backbone.0.body.bn1.running_mean"])
        # decoder self-attn q kernel = first third of in_proj, transposed
        q = np.asarray(variables["params"]["detr"]["transformer"]
                       ["decoder_layers_0"]["self_attn"]["q_proj"]["kernel"])
        packed = state["def_detr.transformer.decoder.layers.0.self_attn.in_proj_weight"]
        np.testing.assert_array_equal(q, packed[:cfg.MODEL.HIDDEN_DIM].T)

    def test_devis_full_coverage(self):
        cfg = _tiny_cfg(vis=True)
        state, variables = self._run_roundtrip(cfg)
        # temporal params exist and convert
        t = variables["params"]["detr"]["transformer"]["encoder_layers_0"][
            "self_attn"]["temporal_sampling_offsets"]["kernel"]
        assert np.asarray(t).ndim == 2

    def test_shift_class_neurons(self):
        state = {"class_embed.0.bias": np.arange(5.0), "other": np.arange(3.0)}
        out = shift_class_neurons(state)
        np.testing.assert_array_equal(out["class_embed.0.bias"],
                                      [1, 2, 3, 4, 0])
        np.testing.assert_array_equal(out["other"], [0, 1, 2])

    def test_prefix_def_detr(self):
        state = {"transformer.level_embed": np.zeros(2),
                 "bbox_attention.q_linear.weight": np.zeros((2, 2)),
                 "def_detr.query_embed.weight": np.zeros((4, 4))}
        out = prefix_def_detr(state)
        assert "def_detr.transformer.level_embed" in out
        assert "bbox_attention.q_linear.weight" in out
        assert "def_detr.query_embed.weight" in out


class TestDevisAdaptation:
    def test_temporal_cloning_and_class_transplant(self):
        rng = np.random.RandomState(0)
        M, L, P, C = 8, 4, 4, 256
        state = {
            "transformer.encoder.layers.0.self_attn.sampling_offsets.weight":
                rng.randn(M * L * P * 2, C).astype(np.float32),
            "transformer.encoder.layers.0.self_attn.sampling_offsets.bias":
                rng.randn(M * L * P * 2).astype(np.float32),
            "transformer.encoder.layers.0.self_attn.attention_weights.weight":
                rng.randn(M * L * P, C).astype(np.float32),
            "transformer.encoder.layers.0.self_attn.attention_weights.bias":
                rng.randn(M * L * P).astype(np.float32),
            "class_embed.0.weight": rng.randn(91, C).astype(np.float32),
            "class_embed.0.bias": rng.randn(91).astype(np.float32),
        }
        T, W, Pt = 3, 2, 1   # Pt<P forces the shape-mismatch surgery path
        model_keys = {
            "def_detr.transformer.encoder.layers.0.self_attn."
            "temporal_sampling_offsets.weight": (M * L * W * Pt * 2, C),
            "def_detr.transformer.encoder.layers.0.self_attn."
            "temporal_sampling_offsets.bias": (M * L * W * Pt * 2,),
            "def_detr.transformer.encoder.layers.0.self_attn."
            "temporal_attention_weights.weight": (M * L * W * Pt, C),
            "def_detr.transformer.encoder.layers.0.self_attn."
            "temporal_attention_weights.bias": (M * L * W * Pt,),
            "def_detr.class_embed.0.weight": (40, C),
            "def_detr.class_embed.0.bias": (40,),
        }
        out = adapt_weights_devis(
            state, model_keys, lvl_res=4, focal_loss=True,
            finetune_class_logits=True, num_frames=T,
            finetune_query_embds=False, finetune_temporal_modules=True,
            enc_connect_all_frames=False, enc_temporal_window=W,
            enc_n_temporal_points=Pt, dec_n_temporal_points=Pt)
        for k, s in model_keys.items():
            assert k in out and out[k].shape == s, k
        # Temporal offsets = spatial offsets tiled over W frames, first Pt points
        src = state["transformer.encoder.layers.0.self_attn.sampling_offsets.bias"]
        got = out["def_detr.transformer.encoder.layers.0.self_attn."
                  "temporal_sampling_offsets.bias"]
        expect = np.tile(src.reshape(M, 1, L, P, 2), (1, W, 1, 1, 1))[
            :, :, :, :Pt].reshape(-1)
        np.testing.assert_array_equal(got, expect)
        # COCO→YT-VIS class transplant: ytvis class 0 ← coco logit 0 (id 1)
        cw = out["def_detr.class_embed.0.weight"]
        np.testing.assert_array_equal(cw[0], state["class_embed.0.weight"][0])
        np.testing.assert_array_equal(cw[4], state["class_embed.0.weight"][40])
        np.testing.assert_array_equal(cw[1], np.zeros(C))   # unmapped → init
