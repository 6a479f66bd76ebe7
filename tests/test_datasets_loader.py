"""Host data-loader and static-shape bucketing tests."""
import numpy as np
import pytest

from devis_tpu.datasets import (TrainLoader, collate_clip, collate_images,
                                make_buckets, pick_canvas, round_up)
from devis_tpu.datasets.synthetic import (SyntheticCocoDataset,
                                          SyntheticVISDataset)
from devis_tpu.inference import make_eval_buckets


class TestBuckets:
    def test_pick_canvas_smallest_fit(self):
        buckets = [(128, 256), (256, 128), (256, 256)]
        assert pick_canvas(100, 200, buckets) == (128, 256)
        assert pick_canvas(200, 100, buckets) == (256, 128)
        assert pick_canvas(200, 200, buckets) == (256, 256)
        # nothing fits → round up to 64
        assert pick_canvas(300, 80, buckets) == (320, 128)

    def test_make_buckets_orientations(self):
        b = make_buckets([480, 512], 768)
        assert (512, 768) in b and (768, 512) in b

    def test_eval_buckets_cover_both_orientations(self):
        b = make_eval_buckets(360, 640)
        assert pick_canvas(360, 640, b) == (384, 640)
        assert pick_canvas(640, 360, b) == (640, 384)
        assert pick_canvas(360, 360, b)[0] <= 384


class TestTrainLoader:
    def test_vis_epoch_batches(self):
        ds = SyntheticVISDataset(num_frames=3, n_videos=2, video_len=5,
                                 size=(64, 96))
        loader = TrainLoader(ds, batch_size=2, vis=True,
                             buckets=[(64, 96)], max_instances=4, seed=0)
        batches = list(loader)
        assert len(batches) == len(loader) == len(ds) // 2
        b = batches[0]
        assert b["images"].shape == (2, 3, 64, 96, 3)
        assert b["targets"]["labels"].shape == (2, 4)
        assert b["targets"]["boxes"].shape == (2, 4, 3, 4)

    def test_shuffle_changes_with_epoch(self):
        ds = SyntheticVISDataset(num_frames=3, n_videos=4, video_len=6,
                                 size=(64, 96))
        loader = TrainLoader(ds, batch_size=1, vis=True,
                             buckets=[(64, 96)], max_instances=4, seed=0)
        first = [b["targets"]["labels"].tobytes() for b in loader]
        loader.set_epoch(1)
        second = [b["targets"]["labels"].tobytes() for b in loader]
        assert len(first) == len(second)
        assert first != second        # different order across epochs

    def test_image_mode(self):
        ds = SyntheticCocoDataset(n_images=4, size=(64, 96))
        loader = TrainLoader(ds, batch_size=2, vis=False,
                             buckets=[(64, 96)], max_instances=4, seed=0)
        b = next(iter(loader))
        assert b["images"].shape == (2, 64, 96, 3)
        assert b["targets"]["masks"].shape[0] == 2


class TestCollateEdgeCases:
    def test_clip_more_instances_than_capacity(self):
        ds = SyntheticVISDataset(num_frames=2, n_videos=1, video_len=3,
                                 size=(64, 96))
        out = collate_clip(ds[0], (64, 96), max_instances=1)
        assert out["targets"]["labels"].shape == (1,)
        assert out["targets"]["exists"].sum() == 1

    def test_images_empty_sample(self):
        sample = {"image": np.zeros((40, 50, 3), np.float32),
                  "labels": np.zeros((0,), np.int32),
                  "boxes": np.zeros((0, 4), np.float32),
                  "masks": np.zeros((0, 40, 50), np.uint8),
                  "valid": np.zeros((0,), bool)}
        out = collate_images([sample], (64, 64), max_instances=3)
        assert not out["targets"]["valid"].any()
        assert out["pad_mask"][0, 45:].all()


class TestNMS:
    def test_greedy_suppression(self):
        import jax.numpy as jnp
        from devis_tpu.util.box_ops import nms
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                             [50, 50, 60, 60], [0, 0, 3, 3]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7, 0.95])
        keep = np.asarray(nms(boxes, scores, 0.5))
        assert keep.tolist() == [True, False, True, True]
