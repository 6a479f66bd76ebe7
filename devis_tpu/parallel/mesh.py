"""Device-mesh and sharding helpers.

The reference scales with DDP over NCCL (`/root/reference/main.py:131`,
`src/util/misc.py:437-460`). The TPU-native equivalent is SPMD: one
`jax.sharding.Mesh` with a `data` axis; the batch is sharded over it, the
parameters are replicated, and XLA inserts the gradient `psum`s that DDP's
all-reduce performed explicitly. Multi-host execution uses
`jax.distributed.initialize` (driven by the CLI) and the same mesh spanning
all processes' devices.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(dp: int = 0, devices=None) -> Mesh:
    """A 1-D data-parallel mesh.

    dp == 0 → use every available device (the common case); otherwise the
    first `dp` devices. Kept 1-D because the model is small enough that DP is
    the only parallelism that pays for itself (SURVEY.md §2.10); the mesh is
    still the extension point for tensor-sharding a Swin-L FFN later (add an
    axis here, annotate in the module).
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp:
        devices = devices[:dp]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for a batch pytree."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def local_batch_size(global_batch: int, mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return global_batch
    n = mesh.devices.size
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n
