"""Dataset intake semantics: rotation-augment ratio filtering and partition
truncation (scdx16p100.py:144-161), plus device-shard partitioning."""

import numpy as np

from scd_resnet_tpu.data.dataset import SCDDataset
from scd_resnet_tpu.data.synthetic import make_archive


def _dataset(tmp_path, **kwargs):
    path = str(tmp_path / "a.d")
    make_archive(path, num_images=2, reps=4, clips_per_image=4, size=128)
    # 2 x 4 x 4 = 32 clips, reps 0..3
    return SCDDataset(path, None, test_set=4, **kwargs)


def test_argument_ratio_filters_rotation_reps(tmp_path):
    ds = _dataset(tmp_path, argument_ratio=2, partition=1.0,
                  train_subset="train2p100")
    # reps 0,1 kept: 2 images x 2 reps x 4 clips = 16, minus 4 validation
    total = len(ds.order) + len(ds.data_profile["validation"])
    assert total == 16
    kept_reps = {int(ds.names[i].split(".")[1]) for i in ds.order}
    assert kept_reps <= {0, 1}


def test_partition_truncates(tmp_path):
    ds = _dataset(tmp_path, argument_ratio=4, partition=0.5,
                  train_subset="train4p50")
    total = len(ds.order) + len(ds.data_profile["validation"])
    assert total == 16  # 32 * 0.5


def test_device_shards_cover_rows(tmp_path):
    ds = _dataset(tmp_path, argument_ratio=4, partition=1.0,
                  train_subset="train4p100")
    # 32 clips, 4 validation -> 28 training rows; 4 shards of 7
    rows, local_train = ds.device_shards(4)
    assert len(rows) == 4 and all(len(r) == 7 for r in rows)
    # shards contain training rows ONLY (validation streams from host)
    train_set = set(ds.order)
    validation = set(ds.data_profile["validation"])
    for shard_rows, local in zip(rows, local_train):
        assert len(local) == len(shard_rows)
        for r in shard_rows:
            assert int(r) in train_set and int(r) not in validation
    # index batches are per-shard local and in range
    batches = list(ds.epoch_local_indices(8, 4, local_train))
    assert batches, "expected at least one resident batch"
    for idx in batches:
        assert idx.shape == (8,)
        for d in range(4):
            sl = idx[d * 2:(d + 1) * 2]
            assert np.all(sl < len(rows[d]))


def test_storage_dtype_compacts(tmp_path):
    ds = _dataset(tmp_path, argument_ratio=4, partition=1.0,
                  train_subset="t", storage_dtype="uint8")
    assert ds.samples.dtype == np.uint8


def test_epoch_keyed_shuffle_resume_exact(tmp_path):
    """(seed, epoch)-keyed epoch orders: deterministic per epoch and
    resumable mid-stream — a resumed run must see exactly the batches an
    uninterrupted run would have, not a replay of epoch 1 (factory
    resume schedule; the legacy stateful shuffle restarts instead)."""
    ds = _dataset(tmp_path)
    bs = 4

    def batch_ids(epoch):
        # first column of sample indices is enough to identify batches
        return [tuple(s[:, 0, 0].tolist())
                for s, _, _ in ds.epoch_batches(bs, epoch=epoch)]

    assert batch_ids(0) == batch_ids(0)      # deterministic
    assert batch_ids(0) != batch_ids(1)      # epochs differ
    spe = ds.steps_per_epoch(bs)
    assert spe == len(ds) // bs and spe >= 1

    # resident mode: same guarantees per device shard
    rows, local = ds.device_shards(2)
    a = list(ds.epoch_local_indices(bs, 2, local, epoch=3))
    b = list(ds.epoch_local_indices(bs, 2, local, epoch=3))
    c = list(ds.epoch_local_indices(bs, 2, local, epoch=4))
    assert all((x == y).all() for x, y in zip(a, b))
    assert any((x != y).any() for x, y in zip(a, c))
    assert ds.steps_per_epoch_resident(bs, 2, local) == len(a)


def test_steps_per_epoch_zero_shard():
    """A host shard smaller than one batch must be detectable (the
    factory raises instead of spinning in an empty epoch loop)."""
    import numpy as np

    class _Stub:
        order = list(range(5))

        def __len__(self):
            return 5

    from scd_resnet_tpu.data.dataset import SCDDataset

    assert SCDDataset.steps_per_epoch(_Stub(), 8, 2, 1) == 0
