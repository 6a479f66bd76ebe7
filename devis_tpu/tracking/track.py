"""Per-instance track container for near-online clip stitching.

Behavioral equivalent of the reference's `Track` (`src/models/tracker.py:13-216`):
per-frame lists of scores/masks/categories/boxes/centroids plus validity flags;
overlap frames keep the higher-scoring detection on append; masks leaving the
stitching overlap window are immediately RLE-encoded to free memory
(reference L129-138). Masks are numpy probability maps while inside the
overlap window and RLE dicts once frozen.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..evaluation import rle as rle_lib

ATTRS = ("scores", "masks", "categories", "boxes", "centroid_points")


def encode_mask(mask: np.ndarray) -> Dict:
    """Probability mask → RLE at 0.5 threshold (reference L219-223)."""
    return rle_lib.encode(np.asarray(mask) > 0.5)


class Track:
    def __init__(self, track_id: int, track_length: int, start_idx: int = 0):
        self._id = track_id
        self.length = track_length
        self.start_idx = start_idx
        self.scores: List[Optional[float]] = [None] * track_length
        self.masks: List = [None] * track_length
        self.categories: List[Optional[int]] = [None] * track_length
        self.boxes: List = [None] * track_length
        self.centroid_points: List = [None] * track_length
        self.valid_frames: List[bool] = [True] * track_length
        self.mask_id: Optional[int] = None
        self.last_t = 0

    def __len__(self):
        return self.length

    def get_id(self) -> int:
        return self._id

    def valid(self, min_detections: int = 1) -> bool:
        return sum(self.valid_frames) >= min_detections

    def update(self, scores, categories, boxes, masks, centroid_points, mask_id):
        """Fill a clip track from model outputs (reference L38-44)."""
        self.scores = [float(s) for s in scores]
        self.categories = [int(c) for c in categories]
        self.boxes = [np.asarray(b) for b in boxes]
        self.centroid_points = [np.asarray(c) for c in centroid_points]
        self.mask_id = mask_id
        self.masks = list(masks)

    # -- accessors over the stitching windows (reference L65-84) ------------
    def get_last_t_result(self, t: int, attr: str):
        return getattr(self, attr)[self.last_t + t]

    def get_last_results(self, t_window: int, attr: str):
        return getattr(self, attr)[self.last_t - t_window:self.last_t]

    def get_first_t_result(self, t: int, attr: str):
        return getattr(self, attr)[self.start_idx + t]

    def get_first_results(self, t_window: int, attr: str):
        return getattr(self, attr)[self.start_idx:self.start_idx + t_window]

    def get_results_to_append(self, t: int, attr: str):
        return getattr(self, attr)[self.start_idx + t:]

    def get_mask_id(self):
        return self.mask_id

    # -- lifecycle ----------------------------------------------------------
    def init_video_track(self, num_t: int, clip_track: "Track"):
        for attr in ATTRS:
            getattr(self, attr)[:num_t] = getattr(clip_track, attr)
        self.mask_id = clip_track.mask_id

    def add_video_track(self, t_window: int, clip_track: "Track"):
        """Start a fresh video track mid-video (reference L86-96)."""
        start_idx = self.last_t - t_window - clip_track.start_idx
        for i in range(start_idx):
            self.valid_frames[i] = False
        for attr in ATTRS:
            results = getattr(clip_track, attr)
            getattr(self, attr)[start_idx:start_idx + len(results)] = results
        self.mask_id = clip_track.mask_id

    def kill_track(self):
        for i in range(self.last_t, self.length):
            self.valid_frames[i] = False
        self.encode_all_masks()

    def append_track(self, clip_track: "Track", t_window: int):
        """Stitch a matched clip track: overlap frames keep the
        higher-scoring detection, then the new frames are appended
        (reference L103-124)."""
        overlap_positions = range(
            self.last_t - t_window - clip_track.start_idx, self.last_t)
        for other_pos, self_pos in enumerate(overlap_positions):
            other_score = clip_track.scores[other_pos] or 0
            self_score = self.scores[self_pos] or 0
            if other_score > self_score:
                for attr in ATTRS:
                    getattr(self, attr)[self_pos] = getattr(clip_track, attr)[other_pos]
        for attr in ATTRS:
            results = clip_track.get_results_to_append(t_window, attr)
            getattr(self, attr)[self.last_t:self.last_t + len(results)] = results
        self.mask_id = clip_track.mask_id

    def update_stride(self, stride: int):
        self.last_t += stride

    def update_stride_and_encode_masks(self, stride: int, overlap_window: int):
        """Advance the clock; RLE-encode masks leaving the overlap window
        (reference L129-138)."""
        for idx in range(self.last_t - overlap_window,
                         self.last_t - overlap_window + stride):
            if 0 <= idx < len(self.masks):
                if self.masks[idx] is None:
                    self.valid_frames[idx] = False
                elif not isinstance(self.masks[idx], dict):
                    self.masks[idx] = encode_mask(self.masks[idx])
        self.last_t += stride

    def encode_all_masks(self):
        for t in range(self.length):
            if self.masks[t] is not None and not isinstance(self.masks[t], dict):
                self.masks[t] = encode_mask(self.masks[t])

    # -- final results (reference L140-195) ---------------------------------
    def filter_frame_detections(self, min_detection_score: float):
        for idx, score in enumerate(self.scores):
            if score is not None and score < min_detection_score:
                self.valid_frames[idx] = False

    def _valid_scores(self):
        return [s for v, s in zip(self.valid_frames, self.scores) if v and s is not None]

    def compute_final_score(self, policy: str) -> float:
        scores = self._valid_scores()
        if not scores:
            return 0.0
        if policy == "mean":
            return float(np.mean(scores))
        if policy == "median":
            return float(np.median(scores))
        raise ValueError(f"unknown score policy {policy}")

    def compute_final_category(self, policy: str) -> int:
        if policy == "most_common":
            cats = np.array([c for v, c in zip(self.valid_frames, self.categories)
                             if v and c is not None])
            return int(np.argmax(np.bincount(cats)))
        if policy == "score_weighting":
            acc: Dict[int, float] = {}
            for v, s, c in zip(self.valid_frames, self.scores, self.categories):
                if v and c is not None:
                    acc[c] = acc.get(c, 0.0) + (s or 0.0)
            return max(acc.items(), key=lambda kv: kv[1])[0]
        raise ValueError(f"unknown category policy {policy}")

    def get_formatted_result(self, video_id, category_policy: str,
                             score_policy: str) -> Dict:
        segmentations = [m if v else None
                         for v, m in zip(self.valid_frames, self.masks)]
        return {"video_id": int(video_id),
                "score": self.compute_final_score(score_policy),
                "category_id": int(self.compute_final_category(category_policy)),
                "segmentations": segmentations}
