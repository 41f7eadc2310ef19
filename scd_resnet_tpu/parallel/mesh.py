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


def mesh_from_config(shape: Sequence[int],
                     axes: Optional[Sequence[str]] = None,
                     devices: Optional[Sequence] = None,
                     batch_size: Optional[int] = None) -> Mesh:
    """Build the mesh the ``meshShape``/``meshAxes`` config keys describe.

    The one-knob analog of the reference's DDP world size
    (networkFactory.py:134): ``"meshShape": [4, 2]`` with
    ``"meshAxes": ["data", "model"]`` trains DP=4 x TP=2. Axis names
    default to ``("data",)``, ``("data", "model")``, or
    ``("data", "model", "pipe")`` by rank. Validates device count and
    (when given) that the batch divides the data axis — a sharded batch
    that doesn't divide would silently pad, so it hard-fails instead.
    """
    shape = tuple(int(s) for s in shape)
    if axes is None:
        defaults = {1: ("data",), 2: ("data", "model"),
                    3: ("data", "model", "pipe")}
        if len(shape) not in defaults:
            raise ValueError(
                "meshShape of rank {} needs explicit meshAxes".format(
                    len(shape)))
        axes = defaults[len(shape)]
    axes = tuple(str(a) for a in axes)
    if len(axes) != len(shape):
        raise ValueError(
            "meshAxes {} does not match meshShape {}".format(axes, shape))
    if "data" not in axes:
        raise ValueError("meshAxes must include a 'data' axis (the batch "
                         "shards over it); got {}".format(axes))
    devices = list(devices if devices is not None else jax.devices())
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            "meshShape {} needs {} devices; only {} available".format(
                shape, need, len(devices)))
    if batch_size is not None:
        data_size = shape[axes.index("data")]
        if batch_size % data_size != 0:
            raise ValueError(
                "batchSize {} is not divisible by the mesh data axis "
                "{}".format(batch_size, data_size))
    return create_mesh(devices[:need], axes, shape)


def param_sharding_rule(mesh: Mesh, value, axis: str = "model",
                        min_channels: int = 64) -> NamedSharding:
    """Tensor-parallel placement for one parameter (or ShapeDtypeStruct):
    shard wide kernels' output channels over the TP axis, replicate
    everything else (pure DP). "Wide" = last dim >= ``min_channels`` and
    divisible by the axis size — biases, BN vectors, and narrow kernels
    stay replicated, so a 1-D 'data' mesh reproduces plain DP exactly.
    GSPMD inserts the activation all-gathers/reduces over ICI."""
    size = mesh.shape.get(axis, 1)
    shape = tuple(getattr(value, "shape", ()))
    if (size > 1 and len(shape) >= 2 and shape[-1] >= min_channels
            and shape[-1] % size == 0):
        spec = [None] * (len(shape) - 1) + [axis]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def tree_param_shardings(mesh: Mesh, tree, axis: str = "model"):
    """``param_sharding_rule`` mapped over a pytree of params (or of
    ``jax.eval_shape`` structs — the rule only reads shapes)."""
    return jax.tree_util.tree_map(
        lambda v: param_sharding_rule(mesh, v, axis), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """Device-put host arrays with the batch dimension sharded."""
    sharding = batch_sharding(mesh, axis)
    return tuple(jax.device_put(a, sharding) for a in arrays)
