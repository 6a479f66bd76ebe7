"""Metrics logging + profiling hooks.

Replaces the reference's Visdom live plots (`src/util/visdom_vis.py:34-191`,
toggled by VISDOM_ON) with a JSONL metrics stream any dashboard can tail, and
keeps an optional visdom sink behind the same config toggle for drop-in
compatibility. Adds the TPU profiling hooks the reference lacks entirely
(SURVEY.md §5): `jax.profiler` traces and device-memory reporting (the
counterpart of the reference's CUDA max-memory print, engine.py:224).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsWriter:
    """Append-only JSONL metrics stream: one record per call with a
    monotonically increasing step, wall time, and arbitrary scalars."""

    def __init__(self, output_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._f = open(self.path, "a")

    def write(self, step: int, scalars: Dict[str, float], **tags):
        rec = {"step": int(step), "time": time.time(), **tags,
               **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class VisdomSink:
    """Optional live line plots (reference visdom_vis.py LineVis). No-op when
    the visdom client isn't installed or the server is unreachable."""

    def __init__(self, server: str, port: int, env: str = "main"):
        try:
            import visdom
            self.vis = visdom.Visdom(server=server, port=port, env=env,
                                     raise_exceptions=False)
        except Exception:
            self.vis = None
        self._wins: Dict[str, str] = {}

    def plot(self, window: str, step: int, scalars: Dict[str, float]):
        if self.vis is None:
            return
        import numpy as np
        ys = np.asarray([[scalars[k] for k in sorted(scalars)]])
        xs = np.asarray([step])
        win = self._wins.get(window)
        self._wins[window] = self.vis.line(
            Y=ys, X=xs, win=win, update="append" if win else None,
            opts={"title": window, "legend": sorted(scalars)})


def build_metrics(cfg) -> MetricsWriter:
    return MetricsWriter(cfg.OUTPUT_DIR)


def build_visdom(cfg) -> Optional[VisdomSink]:
    if not cfg.VISDOM_ON:
        return None
    return VisdomSink(cfg.VISDOM_SERVER, cfg.VISDOM_PORT)


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (counterpart of the reference's
    `torch.cuda.max_memory_allocated` log)."""
    out = {}
    for i, dev in enumerate(jax.local_devices()):
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[f"dev{i}_bytes_in_use_gib"] = stats.get("bytes_in_use", 0) / 2**30
            out[f"dev{i}_peak_bytes_gib"] = stats.get("peak_bytes_in_use", 0) / 2**30
    return out


class ProfilerSession:
    """Scoped `jax.profiler` trace: with ProfilerSession(dir, enabled): ...
    Produces a TensorBoard-loadable trace of device + host activity."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self.log_dir = log_dir
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            jax.profiler.stop_trace()
        return False
