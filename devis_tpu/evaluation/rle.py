"""COCO-compatible run-length-encoded masks in pure numpy.

pycocotools is not available in this environment, and the reference depends on
it for mask RLE encode / IoU / area (`src/models/tracker.py:219-223`,
`src/util/mask_ops.py:5-33`) and for the results.json submission format. This
module reimplements the needed slice with the exact on-disk format
(column-major runs starting with zeros; LEB128-style char encoding with the
delta trick of pycocotools' `rleToString`). A C++ fast path can be slotted in
via devis_tpu.native later; all functions are numpy-vectorized.

An RLE object is `{"size": [h, w], "counts": str}` — identical to pycocotools.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def encode(mask: np.ndarray) -> Dict:
    """Binary mask (H, W) → RLE dict with compressed string counts."""
    h, w = mask.shape
    flat = np.asarray(mask, dtype=bool).flatten(order="F")
    if flat.size == 0:
        return {"size": [h, w], "counts": ""}
    from . import _native
    counts = _native.encode_counts(flat.view(np.uint8))
    if counts is not None:
        s = _native.counts_to_string(counts)
        if s is not None:
            return {"size": [h, w], "counts": s}
        counts = counts.tolist()
    else:
        # runs of equal values; counts start with the number of leading zeros
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        boundaries = np.concatenate([[0], change, [flat.size]])
        counts = np.diff(boundaries).tolist()
        if flat[0]:
            counts = [0] + counts
    return {"size": [h, w], "counts": _counts_to_string(counts)}


def decode(rle: Dict) -> np.ndarray:
    """RLE dict → binary mask (H, W) uint8."""
    h, w = rle["size"]
    counts = _ensure_counts(rle)
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


def area(rle: Dict) -> int:
    counts = _ensure_counts(rle)
    return int(sum(counts[1::2]))


def _intervals(rle: Dict) -> np.ndarray:
    """1-run [start, end) intervals in flat Fortran order, shape (n, 2)."""
    counts = np.asarray(_ensure_counts(rle), dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.stack([starts[1::2], ends[1::2]], axis=1)


def _pair_intersection(iv_a: np.ndarray, iv_b: np.ndarray) -> int:
    """Total overlap length between two sorted interval sets."""
    if len(iv_a) == 0 or len(iv_b) == 0:
        return 0
    i = j = 0
    total = 0
    na, nb = len(iv_a), len(iv_b)
    while i < na and j < nb:
        lo = max(iv_a[i, 0], iv_b[j, 0])
        hi = min(iv_a[i, 1], iv_b[j, 1])
        if hi > lo:
            total += hi - lo
        if iv_a[i, 1] < iv_b[j, 1]:
            i += 1
        else:
            j += 1
    return int(total)


def intersection(a: Dict, b: Dict) -> int:
    """Foreground-overlap area of two RLE masks (no decode)."""
    from . import _native
    ca, cb = _ensure_counts(a), _ensure_counts(b)
    L = _native.lib()
    if L is not None:
        ca = np.ascontiguousarray(ca, np.int64)
        cb = np.ascontiguousarray(cb, np.int64)
        return int(L.rle_intersection(_native._ptr_long(ca), len(ca),
                                      _native._ptr_long(cb), len(cb)))
    return _pair_intersection(_intervals(a), _intervals(b))


def iou(dt: Sequence[Dict], gt: Sequence[Dict],
        iscrowd: Sequence[bool] | None = None) -> np.ndarray:
    """Pairwise mask IoU, pycocotools semantics: for crowd gt the denominator
    is the detection area. Returns (len(dt), len(gt)) float64."""
    if iscrowd is None:
        iscrowd = [False] * len(gt)
    if len(dt) and len(gt):
        from . import _native
        native = _native.iou_matrix(
            [np.asarray(_ensure_counts(d), np.int64) for d in dt],
            [np.asarray(_ensure_counts(g), np.int64) for g in gt],
            [bool(c) for c in iscrowd])
        if native is not None:
            return native
    dt_iv = [_intervals(d) for d in dt]
    gt_iv = [_intervals(g) for g in gt]
    dt_area = [area(d) for d in dt]
    gt_area = [area(g) for g in gt]
    out = np.zeros((len(dt), len(gt)))
    for i in range(len(dt)):
        for j in range(len(gt)):
            inter = _pair_intersection(dt_iv[i], gt_iv[j])
            union = (dt_area[i] if iscrowd[j]
                     else dt_area[i] + gt_area[j] - inter)
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def merge(rles: Sequence[Dict], intersect: bool = False) -> Dict:
    """Union (or intersection) of RLE masks."""
    assert rles, "merge of empty list"
    h, w = rles[0]["size"]
    acc = decode(rles[0]).astype(bool)
    for r in rles[1:]:
        m = decode(r).astype(bool)
        acc = acc & m if intersect else acc | m
    return encode(acc)


# ---------------------------------------------------------------------------
# pycocotools-format string codec (maskApi.c rleToString/rleFrString)
# ---------------------------------------------------------------------------

def _counts_to_string(counts: List[int]) -> str:
    from . import _native
    s = _native.counts_to_string(np.asarray(counts, np.int64))
    if s is not None:
        return s
    chars = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            chars.append(chr(ch + 48))
    return "".join(chars)


def _string_to_counts(s: str) -> List[int]:
    from . import _native
    c = _native.string_to_counts(s)
    if c is not None:
        return c.tolist()
    counts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            ch = ord(s[p]) - 48
            x |= (ch & 0x1F) << (5 * k)
            more = bool(ch & 0x20)
            p += 1
            k += 1
            if not more and (ch & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _ensure_counts(rle: Dict) -> List[int]:
    c = rle["counts"]
    if isinstance(c, str):
        return _string_to_counts(c)
    if isinstance(c, bytes):
        return _string_to_counts(c.decode("utf-8"))
    return list(c)


def soft_iou(probs1: np.ndarray, probs2: np.ndarray) -> float:
    """Soft IoU on probability masks (reference matcher.py:310-321)."""
    inter = float((probs1 * probs2).sum())
    union = float((probs1 + probs2 - probs1 * probs2).sum())
    union = max(union, 1e-6)
    return inter / union if union > 0 else 0.0


def compute_iou_matrix(masks1: Sequence[Dict], masks2: Sequence[Dict],
                       is_encoded: bool = True) -> np.ndarray:
    """RLE IoU matrix (reference util/mask_ops.py:5-33)."""
    return iou(list(masks1), list(masks2))
