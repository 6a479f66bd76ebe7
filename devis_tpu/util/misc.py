"""Small shared utilities (jnp + host-side batching helpers).

Replaces the parts of the reference's `src/util/misc.py` that the TPU stack
needs: inverse_sigmoid, padded-batch construction (the NestedTensor equivalent
— on TPU we keep a plain (array, mask) pair with *static* canvas shapes), and
simple metric smoothing/logging.
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def pad_images_to_canvas(images: Sequence[np.ndarray],
                         canvas: Tuple[int, int] | None = None,
                         size_divisibility: int = 1):
    """Batch variable-size HWC images into one padded NHWC array + pad mask.

    TPU-native replacement for `nested_tensor_from_tensor_list`
    (reference: misc.py:321-373). `canvas` fixes the static output shape (one
    jit cache entry per canvas); otherwise the max extent (rounded up to
    `size_divisibility`) is used.

    Returns (batch (N,H,W,C) float32, mask (N,H,W) bool — True on padding).
    """
    n = len(images)
    hs = [im.shape[0] for im in images]
    ws = [im.shape[1] for im in images]
    if canvas is None:
        d = size_divisibility
        canvas = (-(-max(hs) // d) * d, -(-max(ws) // d) * d)
    H, W = canvas
    assert max(hs) <= H and max(ws) <= W, f"images exceed canvas {canvas}"
    c = images[0].shape[2]
    batch = np.zeros((n, H, W, c), dtype=np.float32)
    mask = np.ones((n, H, W), dtype=bool)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        batch[i, :h, :w] = im
        mask[i, :h, :w] = False
    return batch, mask


class SmoothedValue:
    """Track a series of values with windowed median/avg (misc.py:23-82)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Console metric logger with ETA (reference: misc.py:169-286)."""

    def __init__(self, print_freq: int = 10, delimiter: str = "  ", debug: bool = False):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_freq = print_freq
        self.debug = debug

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def synchronize_between_processes(self):
        """All-reduce each meter's count/total across hosts so printed global
        averages reflect ALL ranks (reference misc.py:199-210, which
        all-reduces over NCCL; here a host-side process_allgather). The
        windowed median/avg stay per-process, matching the reference. No-op
        single-process."""
        import jax
        if jax.process_count() == 1:
            return
        from ..parallel.multihost import all_gather_objects
        payload = {k: (m.count, m.total) for k, m in self.meters.items()}
        gathered = all_gather_objects(payload)
        for k, meter in self.meters.items():
            meter.count = sum(p[k][0] for p in gathered if k in p)
            meter.total = sum(p[k][1] for p in gathered if k in p)

    def log_every(self, iterable: Iterable, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % self.print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    print(f"{header} [{i}/{total}] eta: {eta_str} {self} "
                          f"time: {iter_time} data: {data_time}", flush=True)
                else:
                    print(f"{header} [{i}] {self} time: {iter_time}", flush=True)
            i += 1
            end = time.time()
            if self.debug and i >= 2:
                break
        total_time = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(total_time))}", flush=True)
