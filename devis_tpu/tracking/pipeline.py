"""Persistent cross-video clip-inference pipeline.

The reference tracker runs everything serially per video (`src/models/
tracker.py:296-462`, prefetching only via DataLoader workers). Round-3
profiling showed that per-video pipelines leave the device idle at every
video boundary: the pools lived inside `Tracker.__call__`, so each video
paid a serial prep → upload → execute → fetch refill for clip 0 and a drain
at the end (~300 ms/video through the device tunnel), on top of the
steady-state fetch floor.

`ClipPipeline` instead owns ONE loader/dispatch/fetch pipeline spanning a
whole evaluation: `inference_vis` enqueues every (video, clip) work item up
front (videos already grouped by eval canvas), and the Tracker consumes
results strictly in order via `next()`. Clip 0 of video j+1 is prepared,
uploaded, and dispatched while video j's tail clips are still streaming
back — the video-boundary bubble disappears and the only serial fill is the
very first clip of the whole pass.

Stages (each on its own thread(s), FIFO order preserved end-to-end):
  prepare  — JPEG decode + resize + canvas pad (host, `n_loaders` workers)
  dispatch — host→device upload + async enqueue of the jitted forward
             (1 worker: device queue order == consumption order)
  fetch    — block on the device→host transfer, adapt to Tracker contract

A plain-callable `infer_fn(video, clip_idx)` (no prepare/dispatch/fetch
attributes) degrades to a single-stage background pipeline with the same
interface.
"""
from __future__ import annotations

import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Deque, List, Optional, Tuple


class ClipPipeline:
    def __init__(self, infer_fn: Callable, prep_depth: int = 4,
                 disp_depth: int = 2, n_loaders: int = 2):
        self.infer_fn = infer_fn
        self.staged = hasattr(infer_fn, "prepare") and hasattr(infer_fn, "run")
        self.deep = self.staged and hasattr(infer_fn, "dispatch") \
            and hasattr(infer_fn, "fetch")
        self.prep_depth = prep_depth
        self.disp_depth = disp_depth
        self._load_pool = ThreadPoolExecutor(max_workers=n_loaders)
        self._disp_pool = ThreadPoolExecutor(max_workers=1)
        self._fetch_pool = ThreadPoolExecutor(max_workers=1)
        self._work: Deque[Tuple[object, int]] = deque()
        self._preps: Deque[Future] = deque()
        self._disps: Deque[Future] = deque()
        self._fetches: Deque[Future] = deque()
        # per-clip completion timestamps for bubble accounting
        self.fetch_done_t: List[float] = []
        self._closed = False

    # -- producer side ------------------------------------------------------
    def add_video(self, video) -> None:
        """Enqueue every clip of `video`; results come back via `next()` in
        exactly this order."""
        assert not self._closed
        for clip_idx in range(len(video)):
            self._work.append((video, clip_idx))
        self._pump()

    # -- plumbing ------------------------------------------------------------
    def _pump(self) -> None:
        """Keep every stage's queue filled to its depth (FIFO)."""
        if not self.staged:
            # single-stage: run the whole infer_fn on the fetch thread,
            # keeping one clip in flight ahead of the consumer.
            while self._work and len(self._fetches) < 2:
                video, i = self._work.popleft()
                self._fetches.append(
                    self._fetch_pool.submit(self.infer_fn, video, i))
            return
        while self._work and (len(self._preps) + len(self._disps)
                              + len(self._fetches)) < self.prep_depth:
            video, i = self._work.popleft()
            self._preps.append(
                self._load_pool.submit(self.infer_fn.prepare, video, i))
        if self.deep:
            while self._preps and (len(self._disps)
                                   + len(self._fetches)) < self.disp_depth + 1:
                fut = self._preps.popleft()
                self._disps.append(self._disp_pool.submit(
                    lambda f=fut: self.infer_fn.dispatch(f.result())))
            while self._disps and len(self._fetches) < 2:
                fut = self._disps.popleft()
                self._fetches.append(self._fetch_pool.submit(
                    lambda f=fut: self._timed_fetch(f)))
        else:
            while self._preps and len(self._fetches) < 2:
                fut = self._preps.popleft()
                self._fetches.append(self._fetch_pool.submit(
                    lambda f=fut: self.infer_fn.run(f.result())))

    def _timed_fetch(self, disp_fut: Future):
        out = self.infer_fn.fetch(disp_fut.result())
        self.fetch_done_t.append(time.perf_counter())
        return out

    # -- consumer side -------------------------------------------------------
    def next(self):
        """Blocking: the next clip's results, in enqueue order."""
        self._pump()
        fut = self._fetches.popleft()
        self._pump()
        res = fut.result()
        self._pump()
        return res

    def close(self) -> None:
        self._closed = True
        self._work.clear()
        self._load_pool.shutdown(wait=False)
        self._disp_pool.shutdown(wait=False)
        self._fetch_pool.shutdown(wait=False)
