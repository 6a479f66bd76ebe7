"""Swin backbone tests: shapes/strides, window round-trip, rel-pos index,
shift mask structure, and model-factory integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devis_tpu.models.backbones.swin import (SWIN_CONFIGS, SwinTransformer,
                                             relative_position_index,
                                             shift_attn_mask,
                                             window_partition, window_reverse)


class TestWindowOps:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(2, 14, 28, 8).astype(np.float32))
        wins = window_partition(x, 7)
        assert wins.shape == (2 * 2 * 4, 7, 7, 8)
        back = window_reverse(wins, 7, 2, 14, 28)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = relative_position_index(2)
        # (w²=4, 4) values in [0, (2w-1)²) = [0, 9)
        assert idx.shape == (4, 4)
        assert idx.min() >= 0 and idx.max() < 9
        # self-offset is the table center for every position
        center = (2 - 1) * (2 * 2 - 1) + (2 - 1)
        np.testing.assert_array_equal(np.diag(idx), center)
        # symmetric pairs map to mirrored offsets
        assert idx[0, 1] != idx[1, 0]

    def test_shift_mask_blocks(self):
        m = shift_attn_mask(14, 14, 7, 3)
        assert m.shape == (4, 49, 49)
        # first window (interior) is unmasked
        np.testing.assert_array_equal(m[0], 0)
        # shifted windows must mask some cross-region pairs
        assert (m[-1] < 0).any()
        # mask is symmetric in its zero-structure
        np.testing.assert_array_equal((m[-1] < 0), (m[-1] < 0).T)


class TestSwinBackbone:
    @pytest.mark.slow
    def test_shapes_tiny(self, rng):
        model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                                num_heads=(2, 2, 4, 4), window=4)
        x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(v, x)
        assert len(outs) == 4
        assert outs[0].shape == (1, 16, 24, 32)     # stride 4
        assert outs[1].shape == (1, 8, 12, 64)      # stride 8
        assert outs[2].shape == (1, 4, 6, 128)      # stride 16
        assert outs[3].shape == (1, 2, 3, 256)      # stride 32
        for o in outs:
            assert bool(jnp.isfinite(o).all())

    @pytest.mark.slow
    def test_non_window_multiple_input(self, rng):
        """Inputs not divisible by the window must pad internally."""
        model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                                num_heads=(2, 2, 4, 4), window=7)
        x = jnp.asarray(rng.rand(1, 72, 100, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(v, x)
        assert outs[0].shape[1:3] == (18, 25)
        assert bool(jnp.isfinite(outs[-1]).all())

    def test_factory_integration(self):
        from devis_tpu.config import get_cfg_defaults
        from devis_tpu.models import build_backbone
        cfg = get_cfg_defaults()
        cfg.defrost() if hasattr(cfg, "defrost") else None
        cfg.MODEL.BACKBONE = "swin_t_p4w7"
        backbone, ch = build_backbone(cfg)
        assert tuple(ch) == (96, 192, 384, 768)
        assert SWIN_CONFIGS["swin_l_p4w12"]["window"] == 12
