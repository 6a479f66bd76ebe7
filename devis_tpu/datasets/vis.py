"""YouTube-VIS / OVIS video datasets.

Reimplements `src/datasets/vis.py`: the clip-sampling train dataset
(every valid start index, or every frame with reflection padding for short
videos, L38-76) and the val dataset that parses each video into overlapping
clips (stride = T − overlap; short videos reflected; last clip anchored to the
video end with `last_real_idx`, L163-211).

Target layout difference (TPU static shapes): instead of the reference's
flattened instance-frame lists, train targets are per-trajectory arrays
padded to capacity N:
  labels (N,) 0-based category, boxes (N, T, 4), valid (N, T), exists (N,),
  masks (N, T, H, W).
The reference marks invalid frames with a background label and relies on
masked index tricks (vis.py:90-95); a per-trajectory label + validity mask is
the equivalent information.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from .coco import polygons_to_mask
from .transforms import ClipTransform, ValTransform, boxes_from_masks


class VISTrainDataset:
    def __init__(self, ann_file: str, img_folder: str, num_frames: int,
                 sample_each_frame: bool = False, scales=None,
                 max_size: int = 768, scale_factor: float = 1.0,
                 create_bbx_from_mask: bool = True, seed: Optional[int] = None):
        with open(ann_file) as f:
            self.db = json.load(f)
        self.img_folder = img_folder
        self.num_frames = num_frames
        self.videos = {v["id"]: v for v in self.db["videos"]}
        self.anns_by_vid: Dict[int, List] = {}
        for ann in self.db["annotations"]:
            if not ann.get("iscrowd", 0):
                self.anns_by_vid.setdefault(ann["video_id"], []).append(ann)
        self.cat_ids = sorted(c["id"] for c in self.db["categories"])

        # clip start index table (reference vis.py:38-53)
        self.samples: List[Tuple[int, int]] = []
        for vid_id, v in self.videos.items():
            length = v["length"]
            if not sample_each_frame:
                if length < num_frames:
                    self.samples.append((vid_id, 0))
                    continue
                for f in range(length - num_frames + 1):
                    self.samples.append((vid_id, f))
            else:
                for f in range(length):
                    self.samples.append((vid_id, f))

        scales = scales or [288, 320, 352, 392, 416, 448, 480, 512]
        scales = [int(scale_factor * s) for s in scales]
        self.transform = ClipTransform(
            scales=scales, max_size=int(scale_factor * max_size),
            scales_before_crop=[int(scale_factor * s) for s in (400, 500, 600)],
            crop_size=(int(scale_factor * 384), int(scale_factor * 600)),
            create_bbx_from_mask=create_bbx_from_mask, seed=seed)

    def __len__(self):
        return len(self.samples)

    def frame_indices(self, vid_id: int, frame_id: int) -> List[int]:
        """Absolute frame indices of a clip starting at frame_id, with the
        reference's reflection padding for short videos (vis.py:62-76)."""
        length = self.videos[vid_id]["length"]
        idxs = list(range(frame_id, length))
        if len(idxs) >= self.num_frames:
            return idxs[:self.num_frames]
        fwd = list(range(length))
        while len(idxs) < self.num_frames:
            idxs.extend(fwd[::-1][1:])
            idxs.extend(fwd[1:])
        return idxs[:self.num_frames]

    def __getitem__(self, idx: int) -> Dict:
        vid_id, frame_id = self.samples[idx]
        video = self.videos[vid_id]
        fidx = self.frame_indices(vid_id, frame_id)
        anns = self.anns_by_vid.get(vid_id, [])

        frames = []
        for fi in fidx:
            path = os.path.join(self.img_folder, video["file_names"][fi])
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(path)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
            h, w = img.shape[:2]
            boxes, masks, valid = [], [], []
            for ann in anns:
                bbox = ann["bboxes"][fi]
                segm = ann["segmentations"][fi]
                ok = bbox is not None and segm is not None
                if ok:
                    x, y, bw, bh = bbox
                    boxes.append([max(x, 0), max(y, 0),
                                  min(x + bw, w), min(y + bh, h)])
                    masks.append(polygons_to_mask(segm, h, w))
                else:
                    boxes.append([0, 0, 0, 0])
                    masks.append(np.zeros((h, w), np.uint8))
                valid.append(ok)
            frames.append({"image": img,
                           "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                           "masks": (np.stack(masks) if masks
                                     else np.zeros((0, h, w), np.uint8)),
                           "valid": np.asarray(valid, bool)})
        frames = self.transform(frames)

        labels = np.asarray([a["category_id"] - 1 for a in anns], np.int32)
        T = self.num_frames
        N = len(anns)
        h, w = frames[0]["image"].shape[:2]
        out = {
            "images": np.stack([f["image"] for f in frames]),     # (T, H, W, 3)
            "labels": labels,                                     # (N,)
            "boxes": np.stack([f["boxes"] for f in frames], axis=1)
            if N else np.zeros((0, T, 4), np.float32),            # (N, T, 4)
            "masks": np.stack([f["masks"] for f in frames], axis=1)
            if N else np.zeros((0, T, h, w), np.uint8),           # (N, T, H, W)
            "valid": np.stack([f["valid"] for f in frames], axis=1)
            if N else np.zeros((0, T), bool),                     # (N, T)
            "exists": np.ones(N, bool),
            "video_id": vid_id,
        }
        # area<=2 instances per frame are invalidated
        # (reference vis_transforms.py:197-242)
        if N:
            areas = out["masks"].reshape(N, T, -1).sum(-1)
            out["valid"] = out["valid"] & (areas > 2)
        return out


class VideoClips:
    """One validation video parsed into overlapping clips
    (reference VideoClip, vis.py:103-129)."""

    def __init__(self, video_id: int, images_folder: str, file_names: List[str],
                 original_size: Tuple[int, int], clips: List[List[str]],
                 last_real_idx: int, real_video_length: Optional[int],
                 transform: ValTransform, cat_names: Dict[int, str]):
        self.video_id = video_id
        self.images_folder = images_folder
        self.file_names = file_names
        self.original_size = original_size
        self.video_clips = clips
        self.last_real_idx = last_real_idx
        self.real_video_length = real_video_length
        self.final_video_length = len(file_names)
        self.transform = transform
        self.cat_names = cat_names

    def __len__(self):
        return len(self.video_clips)

    @property
    def video_name(self) -> str:
        """YT-VIS folder name of this video (file_names are
        '<hash>/00000.jpg'; reference viz_utils.py:154)."""
        first = self.file_names[0]
        return first.split("/")[0] if "/" in first else str(self.video_id)

    def read_frame(self, t: int) -> np.ndarray:
        """Original-resolution RGB uint8 frame `t` (visualization)."""
        img = cv2.imread(os.path.join(self.images_folder, self.file_names[t]),
                         cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.file_names[t])
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def load_clip(self, idx: int) -> np.ndarray:
        """(T, H, W, 3) frames of clip `idx` — normalized f32, or raw uint8
        when the transform defers normalization to the device."""
        raw = not getattr(self.transform, "normalize", True)
        frames = []
        for name in self.video_clips[idx]:
            img = cv2.imread(os.path.join(self.images_folder, name),
                             cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(name)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if not raw:
                img = img.astype(np.float32)
            frames.append(self.transform(img))
        return np.stack(frames)


class VISValDataset:
    def __init__(self, ann_file: str, images_folder: str, max_clip_length: int,
                 stride: int, min_size: int = 360, max_size: int = 640):
        with open(ann_file) as f:
            self.annotations = json.load(f)
        self.max_clip_length = max_clip_length
        self.overlap_window = max_clip_length - stride
        self.has_gt = bool(self.annotations.get("annotations"))
        self.cat_names = {c["id"]: c["name"]
                          for c in self.annotations["categories"]}
        self.cat_names[0] = "Bkg"
        transform = ValTransform(min_size, max_size, normalize=False)
        self.videos = [self._parse_video(v, images_folder, transform)
                       for v in self.annotations["videos"]]

    def _parse_video(self, video, images_folder, transform) -> VideoClips:
        T = self.max_clip_length
        names = video["file_names"]
        length = video["length"]
        clips: List[List[str]] = []
        last_real_idx = 0
        real_video_length = None
        if length < T:
            padded = list(names)
            j = 1
            while len(padded) < T:
                padded.extend(names[::-1][1:] if j % 2 else names[1:])
                j += 1
            clips.append(padded[:T])
            real_video_length = length
        elif length == T:
            clips.append(names[:T])
        else:
            clips.append(names[:T])
            start = T - self.overlap_window
            end = start + T
            while end < length:
                clips.append(names[start:end])
                start = end - self.overlap_window
                end = start + T
            last_clip_start = len(names) - 1 - T
            last_real_idx = start - last_clip_start - 1
            clips.append(names[-T:])
        return VideoClips(video["id"], images_folder, names,
                          (video["height"], video["width"]), clips,
                          last_real_idx, real_video_length, transform,
                          self.cat_names)

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, idx: int) -> VideoClips:
        return self.videos[idx]

    def get_total_num_frames(self) -> int:
        return sum(v["length"] for v in self.annotations["videos"])


VIS_PATHS = {
    "yt_vis_train_19": ("Youtube_VIS-2019/train/JPEGImages",
                        "Youtube_VIS-2019/train/train.json", 40),
    "yt_vis_val_19": ("Youtube_VIS-2019/valid/JPEGImages",
                      "Youtube_VIS-2019/valid/valid.json", 40),
    "yt_vis_train_21": ("Youtube_VIS-2021/train/JPEGImages",
                        "Youtube_VIS-2021/train/instances.json", 40),
    "yt_vis_train_21_wo_2975_2359": (
        "Youtube_VIS-2021/train/JPEGImages",
        "Youtube_VIS-2021/train/instances_wo_2975_2359.json", 40),
    "yt_vis_val_21": ("Youtube_VIS-2021/valid/JPEGImages",
                      "Youtube_VIS-2021/valid/instances.json", 40),
    "yt_vis_val_long": ("Youtube_VIS-long/valid/JPEGImages",
                        "Youtube_VIS-long/valid/instances.json", 40),
    "ovis_train": ("OVIS/train", "OVIS/annotations_train.json", 25),
    "ovis_val": ("OVIS/valid", "OVIS/annotations_valid.json", 25),
    "mini_train": ("Youtube_VIS/train/JPEGImages",
                   "Youtube_VIS/train/mini_train.json", 40),
    "mini_val": ("Youtube_VIS/valid/JPEGImages",
                 "Youtube_VIS/valid/mini_valid.json", 40),
}


class ConcatDataset:
    """Minimal torch-style ConcatDataset (reference datasets/__init__.py:43)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._lens = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self._lens)

    def __getitem__(self, idx: int):
        for d, n in zip(self.datasets, self._lens):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)


def build_vis(image_set: str, cfg):
    split = (cfg.DATASETS.TRAIN_DATASET if image_set == "TRAIN"
             else cfg.DATASETS.VAL_DATASET)
    if split.startswith("synthetic"):
        from .synthetic import SyntheticVISDataset, SyntheticVISValDataset
        if image_set == "TRAIN":
            return SyntheticVISDataset(num_frames=cfg.MODEL.DEVIS.NUM_FRAMES), 40
        return SyntheticVISValDataset(
            num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            stride=cfg.TEST.CLIP_TRACKING.STRIDE,
            min_size=cfg.INPUT.MIN_SIZE_TEST,
            max_size=cfg.INPUT.MAX_SIZE_TEST), 40
    img_dir, ann, num_classes = VIS_PATHS[split]
    root = cfg.DATASETS.DATA_PATH
    if image_set == "TRAIN":
        ds = VISTrainDataset(
            os.path.join(root, ann), os.path.join(root, img_dir),
            num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
            sample_each_frame=cfg.INPUT.DEVIS.SAMPLE_EACH_FRAME,
            scale_factor=cfg.INPUT.SCALE_FACTOR_TRAIN,
            create_bbx_from_mask=cfg.INPUT.DEVIS.CREATE_BBX_FROM_MASK,
            seed=cfg.SEED)
        if cfg.DATASETS.DEVIS.COCO_JOINT_TRAINING:
            from .coco import COCO_PATHS
            from .coco_joint_vis import (COCO_TO_YT19_CATEGORY_MAP,
                                         COCO_TO_YT21_CATEGORY_MAP,
                                         CocoJointVIS)
            cmap = (COCO_TO_YT19_CATEGORY_MAP if "19" in split
                    else COCO_TO_YT21_CATEGORY_MAP)
            cdir, cann, _ = COCO_PATHS["train"]
            joint = CocoJointVIS(os.path.join(root, cdir),
                                 os.path.join(root, cann),
                                 num_frames=cfg.MODEL.DEVIS.NUM_FRAMES,
                                 category_map=cmap, seed=cfg.SEED,
                                 scale_factor=cfg.INPUT.SCALE_FACTOR_TRAIN)
            ds = ConcatDataset([ds, joint])
    else:
        ds = VISValDataset(
            os.path.join(root, ann), os.path.join(root, img_dir),
            max_clip_length=cfg.MODEL.DEVIS.NUM_FRAMES,
            stride=cfg.TEST.CLIP_TRACKING.STRIDE,
            min_size=cfg.INPUT.MIN_SIZE_TEST, max_size=cfg.INPUT.MAX_SIZE_TEST)
    return ds, num_classes
