"""Multi-host helpers for evaluation.

The reference gathers per-rank prediction lists with pickle-over-NCCL
(`src/util/misc.py:85-125`) and de-duplicates videos that DistributedSampler
padded across ranks (`accumulate_results`, `misc.py:129-139`). The TPU-native
equivalents: `process_allgather` over a padded uint8 pickle buffer, and the
same first-wins de-dup by video id.
"""
from __future__ import annotations

import pickle
from typing import Dict, List

import numpy as np

import jax


def all_gather_objects(obj) -> List:
    """Gather an arbitrary picklable object from every process."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    blob = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[:blob.size] = blob
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(jax.process_count())]


def accumulate_results(per_process_results: List[List[Dict]]) -> List[Dict]:
    """Merge per-process tracker outputs, keeping the FIRST process's records
    for each video id (videos are padded across processes to even out the
    sampler — reference misc.py:129-139)."""
    seen = set()
    merged: List[Dict] = []
    for records in per_process_results:
        vids = {r["video_id"] for r in records}
        fresh = vids - seen
        merged.extend(r for r in records if r["video_id"] in fresh)
        seen |= fresh
    return merged
