"""RLE codec and clip-stitching tracker tests."""
import numpy as np
import pytest

from devis_tpu.evaluation import rle as rle_lib
from devis_tpu.tracking.track import Track, encode_mask
from devis_tpu.tracking.inference_matcher import HungarianInferenceMatcher
from devis_tpu.tracking.tracker import Tracker, process_boxes_host


class TestRLE:
    def test_roundtrip(self, rng):
        for _ in range(20):
            h, w = rng.randint(1, 40), rng.randint(1, 40)
            mask = rng.rand(h, w) > 0.6
            rle = rle_lib.encode(mask)
            assert isinstance(rle["counts"], str)
            np.testing.assert_array_equal(rle_lib.decode(rle), mask.astype(np.uint8))
            assert rle_lib.area(rle) == int(mask.sum())

    def test_known_string_format(self):
        # 3x3 mask with a single center pixel: F-order runs = [4, 1, 4]
        mask = np.zeros((3, 3), bool)
        mask[1, 1] = True
        rle = rle_lib.encode(mask)
        assert rle_lib._ensure_counts(rle) == [4, 1, 4]
        np.testing.assert_array_equal(rle_lib.decode(rle), mask)

    def test_iou(self, rng):
        a = rng.rand(20, 30) > 0.5
        b = rng.rand(20, 30) > 0.5
        ra, rb = rle_lib.encode(a), rle_lib.encode(b)
        got = rle_lib.iou([ra], [rb])[0, 0]
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        np.testing.assert_allclose(got, inter / union, rtol=1e-9)
        # crowd semantics: denominator = dt area
        got_crowd = rle_lib.iou([ra], [rb], iscrowd=[True])[0, 0]
        np.testing.assert_allclose(got_crowd, inter / a.sum(), rtol=1e-9)

    def test_merge(self, rng):
        a = rng.rand(15, 10) > 0.5
        b = rng.rand(15, 10) > 0.5
        u = rle_lib.decode(rle_lib.merge([rle_lib.encode(a), rle_lib.encode(b)]))
        np.testing.assert_array_equal(u.astype(bool), a | b)
        i = rle_lib.decode(rle_lib.merge([rle_lib.encode(a), rle_lib.encode(b)],
                                         intersect=True))
        np.testing.assert_array_equal(i.astype(bool), a & b)

    def test_empty_and_full(self):
        for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
            rle = rle_lib.encode(mask)
            np.testing.assert_array_equal(rle_lib.decode(rle), mask)


class _FakeVideo:
    """Synthetic video: a bright square moving right 2px/frame."""
    def __init__(self, n_frames=10, T=6, stride=4, size=(48, 64)):
        self.T, self.stride = T, stride
        self.size = size
        self.n_frames = n_frames
        self.real_video_length = n_frames
        self.final_video_length = n_frames
        self.original_size = size
        self.video_id = 7
        starts = list(range(0, n_frames - T + 1, stride))
        if starts[-1] != n_frames - T:
            starts.append(n_frames - T)
        self.clip_starts = starts
        self.last_real_idx = 0

    def __len__(self):
        return len(self.clip_starts)

    def square_mask(self, frame):
        h, w = self.size
        m = np.zeros((h, w), np.float32)
        x = 5 + 2 * frame
        m[10:20, x:x + 10] = 1.0
        return m


def _fake_infer(video, clip_idx):
    """Emits one confident detection tracking the moving square."""
    T = video.T
    start = video.clip_starts[clip_idx]
    h, w = video.size
    logits = np.stack([video.square_mask(start + t) * 20 - 10 for t in range(T)])
    boxes = np.zeros((T, 1, 4), np.float32)
    for t in range(T):
        x = 5 + 2 * (start + t)
        boxes[t, 0] = [(x + 5) / w, 15 / h, 10 / w, 10 / h]
    return {"scores": np.full((T, 1), 0.9, np.float32),
            "labels": np.zeros((1,), np.int64),
            "boxes": boxes,
            "center_points": boxes[..., :2],
            "mask_logits": logits[None],               # (1, T, h, w)
            "mask_gather": np.zeros((1,), np.int64),
            "valid_hw": (h, w)}


TRACKER_CFG = dict(per_class_matching=False, track_min_detection_score=0.001,
                   track_min_score=0.002, track_min_detections=1,
                   final_class_policy="most_common", final_score_policy="mean")


class TestTracker:
    @pytest.mark.parametrize("per_class", [False, True])
    def test_single_object_stitching(self, per_class):
        video = _FakeVideo()
        cfg = dict(TRACKER_CFG, per_class_matching=per_class)
        matcher = HungarianInferenceMatcher(overlap_window=2, cost_class=1,
                                            cost_mask_iou=1, score_cost=1)
        tracker = Tracker(_fake_infer, matcher, cfg, num_frames=6,
                          overlap_window=2)
        results = tracker(video)
        assert len(results) == 1
        r = results[0]
        assert r["video_id"] == 7
        assert r["category_id"] == 1
        assert 0.85 < r["score"] <= 0.95
        assert len(r["segmentations"]) == video.n_frames
        for f, seg in enumerate(r["segmentations"]):
            assert seg is not None and isinstance(seg["counts"], str)
            dec = rle_lib.decode(seg)
            expected = video.square_mask(f) > 0.5
            inter = np.logical_and(dec, expected).sum()
            union = np.logical_or(dec, expected).sum()
            assert inter / union > 0.95, f"frame {f} iou {inter/union}"

    def test_soft_iou_batch_matches_pairwise(self):
        """The one-matmul all-pairs soft IoU must equal the per-pair route."""
        rs = np.random.RandomState(3)
        m1 = [[rs.rand(12, 16).astype(np.float32) for _ in range(2)]
              for _ in range(3)]
        m2 = [[rs.rand(12, 16).astype(np.float32) for _ in range(2)]
              for _ in range(4)]
        batched = HungarianInferenceMatcher._soft_track_iou_batch(m1, m2)
        assert batched is not None and batched.shape == (3, 4)
        for i in range(3):
            for j in range(4):
                want = HungarianInferenceMatcher._soft_track_iou(m1[i], m2[j])
                np.testing.assert_allclose(batched[i, j], want, rtol=1e-5)
        # RLE-frozen masks (dicts) must fall back to the pairwise route
        frozen = [[rle_lib.encode(m > 0.5) for m in ms] for ms in m1]
        assert HungarianInferenceMatcher._soft_track_iou_batch(
            frozen, m2) is None

    def test_low_score_track_filtered(self):
        video = _FakeVideo()

        def low_score_infer(v, i):
            r = _fake_infer(v, i)
            r["scores"] = np.full_like(r["scores"], 0.001)
            return r

        matcher = HungarianInferenceMatcher(overlap_window=2)
        tracker = Tracker(low_score_infer, matcher, TRACKER_CFG,
                          num_frames=6, overlap_window=2)
        assert tracker(video) == []


class TestProcessBoxes:
    def test_convert_and_clamp(self):
        boxes = np.array([[[0.5, 0.5, 0.4, 0.4], [0.0, 0.0, 0.4, 0.4]]])
        out = process_boxes_host(boxes, (100, 200))
        np.testing.assert_allclose(out[0, 0], [60, 30, 140, 70])
        np.testing.assert_allclose(out[0, 1], [0, 0, 40, 20])
