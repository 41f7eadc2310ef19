"""Device mesh and sharding utilities — the distributed layer.

The reference's only parallelism is single-node data-parallel DDP over NCCL
(networkFactory.py:134, train.py:67-73; SURVEY.md §2.9). The TPU-native
equivalent is declarative: a ``jax.sharding.Mesh`` over the chips, batch
arrays sharded on the ``data`` axis, parameters replicated (or sharded on
``model`` for tensor-parallel experiments), and XLA/GSPMD inserting the
gradient all-reduce and cross-replica batch-norm reductions over ICI —
no explicit collectives in the training step.

Multi-host: the same program runs per host after
``jax.distributed.initialize``; per-host input sharding is handled by the
dataset's ``epoch_batches(shard_count, shard_index)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None,
                axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """A mesh over the given (or all) devices.

    ``shape`` reshapes the device list for multi-axis meshes, e.g.
    ``shape=(4, 2), axis_names=('data', 'model')``.
    """
    devices = list(devices if devices is not None else jax.devices())
    arr = np.array(devices)
    if shape is not None:
        arr = arr.reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """Device-put host arrays with the batch dimension sharded."""
    sharding = batch_sharding(mesh, axis)
    return tuple(jax.device_put(a, sharding) for a in arrays)
