"""Result-visualization modes (reference viz_utils.py:30-350): per-clip
track folders, independent final-track folders + matches.txt, and merged
per-frame overlays, driven through the real Tracker."""
import os

import numpy as np
import pytest

from devis_tpu.tracking.inference_matcher import HungarianInferenceMatcher
from devis_tpu.tracking.tracker import Tracker
from devis_tpu.util.visualization import create_color_map

from .test_rle_tracking import TRACKER_CFG, _fake_infer, _FakeVideo


class _VizVideo(_FakeVideo):
    """_FakeVideo + the frame-access surface visualization needs."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.file_names = [f"vid7/{t:05d}.jpg" for t in range(self.n_frames)]
        self.video_clips = [
            [self.file_names[s + t] for t in range(self.T)]
            for s in self.clip_starts]
        self.cat_names = {1: "square"}

    def read_frame(self, t: int) -> np.ndarray:
        h, w = self.size
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = (255 * self.square_mask(t)).astype(np.uint8)
        return img


def test_color_map_matches_voc_bit_pattern():
    cmap = create_color_map()
    assert cmap.shape == (256, 3) and cmap.dtype == np.uint8
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])
    np.testing.assert_array_equal(cmap[3], [128, 128, 0])
    np.testing.assert_array_equal(cmap[4], [0, 0, 128])
    norm = create_color_map(normalized=True)
    assert norm.dtype == np.float32 and float(norm.max()) <= 1.0


@pytest.mark.parametrize("merge", [False, True],
                         ids=["independent", "merged"])
def test_tracker_visualization_modes(tmp_path, merge):
    video = _VizVideo()
    matcher = HungarianInferenceMatcher(overlap_window=2, cost_class=1,
                                        cost_mask_iou=1, score_cost=1)
    viz = dict(out_viz_path=str(tmp_path), save_clip_viz=True,
               merge_tracks=merge)
    tracker = Tracker(_fake_infer, matcher, TRACKER_CFG, num_frames=6,
                      overlap_window=2, visualization_cfg=viz)
    results = tracker(video)
    assert len(results) == 1

    # per-clip viz: one folder per window with one track folder of T frames
    clip_root = tmp_path / "vid7" / "clip_results"
    windows = sorted(os.listdir(clip_root))
    assert windows == [f"window_{i}" for i in range(len(video))]
    for w in windows:
        track_dirs = os.listdir(clip_root / w)
        assert len(track_dirs) == 1 and "_track_0_id_0" in track_dirs[0]
        assert len(os.listdir(clip_root / w / track_dirs[0])) == video.T

    if merge:
        # merged mode: one overlay per video frame directly in the folder
        frames = [f for f in os.listdir(tmp_path / "vid7")
                  if f.endswith(".jpg")]
        assert len(frames) == video.n_frames
    else:
        # independent mode: per-track folder with every frame + matches.txt
        troot = tmp_path / "vid7" / "tracks_results"
        tdirs = os.listdir(troot)
        assert len(tdirs) == 1 and tdirs[0].endswith("_track_0")
        files = os.listdir(troot / tdirs[0])
        assert "matches.txt" in files
        assert len(files) == video.n_frames + 1
        matches = (troot / tdirs[0] / "matches.txt").read_text().splitlines()
        # one stitch record per non-seed clip
        assert len(matches) == len(video) - 1
        assert matches[0].startswith("Window_0 track_0 / Window_1 track_0")

    # overlays actually drew onto the frames (mask blend changes pixels)
    import cv2
    sample_dir = (tmp_path / "vid7" if merge
                  else tmp_path / "vid7" / "tracks_results" / tdirs[0])
    name = sorted(f for f in os.listdir(sample_dir) if f.endswith(".jpg"))[0]
    img = cv2.imread(str(sample_dir / name))
    t = video.file_names.index(f"vid7/{name}")
    base = cv2.cvtColor(video.read_frame(t), cv2.COLOR_RGB2BGR)
    assert img is not None and not np.array_equal(img, base)


def test_render_sampling_points_merged_and_per_level():
    """Sampling-point overlays (reference att_maps_viz.py:208-818): the
    merged render draws every level; a per-level render draws only that
    level's points (pixels touched by other levels stay untouched)."""
    from devis_tpu.util.visualization import render_sampling_points

    T, Lq, M, L, P = 2, 3, 2, 4, 4
    rng = np.random.RandomState(0)
    loc = rng.rand(T, Lq, M, L, P, 2).astype(np.float32)
    att = rng.rand(T, Lq, M, L, P).astype(np.float32)
    frame = np.zeros((64, 96, 3), np.float32)

    merged = render_sampling_points(frame, loc, att, query_idx=1, frame_idx=0)
    assert merged.shape == (64, 96, 3) and merged.any()

    per_level = [render_sampling_points(frame, loc, att, 1, 0, level=lvl)
                 for lvl in range(L)]
    for lvl, img in enumerate(per_level):
        assert img.any(), f"level {lvl} drew nothing"
    # the union of level renders touches every pixel the merged render does
    union = np.zeros_like(merged)
    for img in per_level:
        union = np.maximum(union, img)
    assert np.array_equal(union.astype(bool), merged.astype(bool))
    # and each single level is a strict subset (others' points absent)
    for img in per_level:
        assert img.astype(bool).sum() < merged.astype(bool).sum()
