"""Per-instance track container for near-online clip stitching.

Behavioral equivalent of the reference's `Track` (`src/models/tracker.py:13-216`):
per-frame lists of scores/masks/categories/boxes/centroids plus validity flags;
overlap frames keep the higher-scoring detection on append; masks leaving the
stitching overlap window are RLE-encoded (reference L129-138).

TPU-first difference: a mask entry can be, besides an RLE dict or a full-res
probability map, a `SmallMask` — the /4-resolution model logits plus the
video size. Soft-IoU stitching reads its `probs` at /4 directly (the soft
IoU is rank-order robust to the downsampling, and the reference's full-res
sigmoid+resize per frame dominated host time), and the reference-exact
full-resolution RLE (bilinear-resize the LOGITS, threshold at logit>0 ⇔
p>0.5, reference devis_segmentation.py:119-133 + tracker.py:239-260) is
materialized lazily — only for frames that actually survive into a track,
optionally on a background encode pool (a `concurrent.futures.Future` then
stands in until resolved).
"""
from __future__ import annotations

from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from ..evaluation import rle as rle_lib

ATTRS = ("scores", "masks", "categories", "boxes", "centroid_points")


class SmallMask:
    """Deferred full-resolution mask (see module docstring)."""
    __slots__ = ("logits", "tgt_size", "_probs")

    def __init__(self, logits: np.ndarray, tgt_size):
        self.logits = logits          # (hv, wv) float8/16/32 at model stride
        self.tgt_size = tgt_size      # (H, W) original video size
        self._probs = None

    @property
    def probs(self) -> np.ndarray:
        """Sigmoid probabilities at model /4 resolution (soft-IoU input)."""
        if self._probs is None:
            x = self.logits.astype(np.float32)
            self._probs = 1.0 / (1.0 + np.exp(-x))
        return self._probs

    def to_rle(self) -> Dict:
        """Reference-exact full-res RLE: bilinear-resize the logits to the
        video size, threshold at logit>0 (⇔ p>0.5)."""
        import cv2
        m = cv2.resize(self.logits.astype(np.float32),
                       (self.tgt_size[1], self.tgt_size[0]),
                       interpolation=cv2.INTER_LINEAR)
        return rle_lib.encode(m > 0.0)


def encode_mask(mask) -> Dict:
    """Any mask form → RLE dict (reference L219-223 thresholds probs at 0.5)."""
    if isinstance(mask, dict):
        return mask
    if isinstance(mask, Future):
        return mask.result()
    if isinstance(mask, SmallMask):
        return mask.to_rle()
    return rle_lib.encode(np.asarray(mask) > 0.5)


def mask_probs(mask) -> np.ndarray:
    """Probability-map view of a mask entry (soft-IoU input)."""
    if isinstance(mask, SmallMask):
        return mask.probs
    return np.asarray(mask, np.float32)


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
        # (video_track_id, clip_track_id) per stitch — visualization's
        # matches.txt (reference tracker.py:27,105)
        self.matching_ids_record: List = []

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
        self.matching_ids_record.append((self._id, clip_track.get_id()))
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

    def update_stride_and_encode_masks(self, stride: int, overlap_window: int,
                                       encoder=None):
        """Advance the clock; RLE-encode masks leaving the overlap window
        (reference L129-138). With an `encoder` executor the full-res
        resize+RLE runs on background threads (a Future stands in)."""
        for idx in range(self.last_t - overlap_window,
                         self.last_t - overlap_window + stride):
            if 0 <= idx < len(self.masks):
                m = self.masks[idx]
                if m is None:
                    self.valid_frames[idx] = False
                elif not isinstance(m, (dict, Future)):
                    self.masks[idx] = (encoder.submit(encode_mask, m)
                                       if encoder is not None
                                       else encode_mask(m))
        self.last_t += stride

    def encode_all_masks(self):
        for t in range(self.length):
            if self.masks[t] is not None:
                self.masks[t] = encode_mask(self.masks[t])

    # -- final results (reference L140-195) ---------------------------------
    def filter_frame_detections(self, min_detection_score: float):
        for idx, score in enumerate(self.scores):
            if score is not None and score < min_detection_score:
                self.valid_frames[idx] = False

    def mean_score(self) -> float:
        """Mean over valid-frame scores (reference L59-63; clip-viz folder
        naming)."""
        return self.compute_final_score("mean")

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
