"""Config-reachable multi-axis parallelism (round-5 VERDICT #1).

The ``meshShape``/``meshAxes`` config keys are the one-knob analog of the
reference's DDP world size (networkFactory.py:134): the production factory
builds the multi-axis mesh, shards the batch over 'data' and wide kernels
over 'model' (parallel/mesh.py rules), and GSPMD inserts the collectives.

The headline check: dp=8 and dp=4 x tp=2 produce the same loss trajectory
(fp-reduction-order tolerance) on the 8-virtual-device CPU backend.
"""

import jax
import numpy as np
import pytest

from scd_resnet_tpu.core.config import Configuration
from scd_resnet_tpu.data.dataset import SCDDataset
from scd_resnet_tpu.data.synthetic import make_archive
from scd_resnet_tpu.parallel.mesh import mesh_from_config, param_sharding_rule
from scd_resnet_tpu.train.factory import NetworkFactory


def test_mesh_from_config_geometry():
    mesh = mesh_from_config([4, 2])
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh3 = mesh_from_config([2, 2, 2])
    assert mesh3.axis_names == ("data", "model", "pipe")
    named = mesh_from_config([2, 4], ["model", "data"])
    assert named.shape["data"] == 4

    with pytest.raises(ValueError, match="needs 16 devices"):
        mesh_from_config([16])
    with pytest.raises(ValueError, match="not divisible"):
        mesh_from_config([3, 2], batch_size=8)
    with pytest.raises(ValueError, match="does not match"):
        mesh_from_config([4, 2], ["data"])
    with pytest.raises(ValueError, match="'data' axis"):
        mesh_from_config([4, 2], ["model", "pipe"])


def test_param_sharding_rule_widths():
    mesh = mesh_from_config([4, 2])
    wide = jax.ShapeDtypeStruct((3, 3, 16, 64), np.float32)
    narrow = jax.ShapeDtypeStruct((3, 3, 16, 32), np.float32)
    bias = jax.ShapeDtypeStruct((128,), np.float32)
    odd = jax.ShapeDtypeStruct((3, 3, 16, 65), np.float32)
    assert param_sharding_rule(mesh, wide).spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    for v in (narrow, bias, odd):
        assert param_sharding_rule(mesh, v).spec == jax.sharding.PartitionSpec()
    # 1-D data mesh: everything replicated (pure DP unchanged)
    dp = mesh_from_config([8])
    assert param_sharding_rule(dp, wide).spec == jax.sharding.PartitionSpec()


@pytest.fixture(scope="module")
def tiny_archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("meshcfg")
    archive = str(root / "scdx16p100.d")
    make_archive(archive, num_images=2, reps=2, clips_per_image=6, size=128)
    return root, archive


def _factory(root, archive, mesh_cfg):
    cfg = Configuration()
    cfg.update_config(
        {
            "datasetName": "scdx16p100",
            "modelName": "centerOffsetRes10q",
            "trainName": "meshcfg",
            "batchSize": 8,
            "validationBatchSize": 4,
            "iterations": 3,
            "validation": 100,
            "snapshot": 100,
            "learningRate": 1e-3,
            "residency": "host",  # exercise the streaming step's shardings
            "dirTemp": str(root / "temp") + "/",
            "dirResult": str(root / "results") + "/",
            "dirDataset": str(root) + "/",
            **mesh_cfg,
        }
    )
    dataset = SCDDataset(
        archive, None, argument_ratio=16, partition=1.0,
        train_subset="train16p100", test_set=4,
        split_profile_path=cfg.dirDataSplitProfile,
    )
    return NetworkFactory(cfg, dataset=dataset)


def test_dp_vs_dp_x_tp_loss_trajectory(tiny_archive):
    """dp=8 and dp=4 x tp=2 must train identically (up to fp reduction
    order): same init (seeded), same fold_in augment keys, same batches —
    the mesh shape is a placement decision, not a numerics one."""
    root, archive = tiny_archive

    f_dp = _factory(root, archive, {})
    assert f_dp.mesh.axis_names == ("data",)
    batch = next(f_dp.dataset.epoch_batches(8))

    losses_dp = [float(f_dp.train(*batch)[0]) for _ in range(3)]
    del f_dp

    f_tp = _factory(
        root, archive, {"meshShape": [4, 2], "meshAxes": ["data", "model"]})
    assert f_tp.mesh.shape == {"data": 4, "model": 2}
    # the TP axis actually shards parameters: at least one wide kernel
    # carries 'model' in its committed sharding spec
    specs = [
        p.sharding.spec for p in jax.tree_util.tree_leaves(f_tp.params)
    ]
    assert any("model" in [ax for ax in s if ax] for s in specs)
    # ... and narrow leaves stay replicated
    assert any(s == jax.sharding.PartitionSpec() for s in specs)

    losses_tp = [float(f_tp.train(*batch)[0]) for _ in range(3)]

    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-3, atol=1e-6)


def test_tp_mesh_resident_training_step(tiny_archive):
    """The HBM-resident path (shard_map gather over 'data') must also run
    on a multi-axis mesh: rows shard over the data axis only, replicated
    across 'model', and the resident train step executes with TP-sharded
    parameters."""
    root, archive = tiny_archive
    f = _factory(root, archive, {
        "meshShape": [4, 2], "meshAxes": ["data", "model"],
        "residency": "device", "storageDtype": "float16",
    })
    assert f.resident and f._n_dev == 4  # data-axis shards, not device count
    loss, _ = f.train_resident(np.zeros(8, np.int32))
    assert np.isfinite(float(loss))
    # a validation pass over the resident set exercises the gated
    # validate step's shardings too
    out = f.validate_resident_set()
    assert len(out) >= 1
