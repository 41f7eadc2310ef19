"""End-to-end: synthetic archive -> dataset -> factory -> a few training
steps with validation + checkpoint round trip, on an 8-device CPU mesh.

Uses 128x128 clips (32x32 heatmaps) and the quarter-width ResNet-10 to
keep single-core CPU compile time tolerable."""

import json
import os

import numpy as np
import pytest

from scd_resnet_tpu.core.config import Configuration
from scd_resnet_tpu.data.dataset import SCDDataset
from scd_resnet_tpu.data.synthetic import make_archive
from scd_resnet_tpu.train.factory import NetworkFactory
from scd_resnet_tpu.train.registry import MODEL_PROFILES, DATASET_PROFILES


def test_registry_covers_reference_profiles():
    for depth in (10, 18, 34, 50):
        assert f"centerOffsetRes{depth}" in MODEL_PROFILES
    for depth in (10, 18, 34, 50, 101):
        assert f"centerOffsetRes{depth}h" in MODEL_PROFILES
    assert "centerOffsetRes10q" in MODEL_PROFILES
    assert len(DATASET_PROFILES) == 25
    p = DATASET_PROFILES["scdx4p25"]
    assert p.argument_ratio == 4 and p.partition == 0.25
    assert p.train_subset == "train4p25"


def test_hourglass2_profile_supervises_both_stacks():
    """centerOffsetHourglass2 (reference nstack=2 default, hourglass.py:20)
    registers with stacks=2 and its loss averages intermediate supervision
    over both stack outputs."""
    import jax.numpy as jnp

    profile = MODEL_PROFILES["centerOffsetHourglass2"]
    assert profile.model_params == {"stacks": 2}
    assert profile.model_cls.__name__ == "CenterNetHourglass"

    B, H, W, K = 2, 8, 8, 4
    out = {
        "heatmap": jnp.zeros((B, H, W, 1)),
        "regr": jnp.ones((B, H, W, 4)),
        "offset": jnp.ones((B, H, W, 2)),
    }
    ys = [
        jnp.zeros((B, H, W, 1)),            # heat gt
        jnp.ones((B, K)),                   # tag mask
        jnp.zeros((B, K, 6)),               # regr gt
        jnp.zeros((B, K), jnp.int32),       # indices
    ]
    loss1, _ = profile.loss([out], ys)
    loss2, _ = profile.loss([out, out], ys)
    # per-stack mean: two identical stacks give the same averaged loss
    assert jnp.allclose(loss1, loss2)
    assert bool(jnp.isfinite(loss2))


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("scd")
    archive = str(root / "scdx16p100.d")
    make_archive(archive, num_images=2, reps=2, clips_per_image=6, size=128)
    cfg = Configuration()
    cfg.update_config(
        {
            "datasetName": "scdx16p100",
            "modelName": "centerOffsetRes10q",
            "trainName": "smoke",
            "batchSize": 8,
            "validationBatchSize": 4,
            "iterations": 3,
            "validation": 2,
            "snapshot": 2,
            "learningRate": 1e-3,
            "learningRateDecay": [2],
            "learningRateDecayRate": [10],
            "bestSnapshotMetric": "mIoU",
            "debug": True,
            "dirTemp": str(root / "temp") + "/",
            "dirResult": str(root / "results") + "/",
            "dirDataset": str(root) + "/",
        }
    )
    dataset = SCDDataset(
        archive, None, argument_ratio=16, partition=1.0,
        train_subset="train16p100", test_set=4,
        split_profile_path=cfg.dirDataSplitProfile,
    )
    return cfg, dataset, root


def test_dataset_shapes_and_split(tiny_env):
    cfg, dataset, root = tiny_env
    # 2 images x 2 reps x 6 clips = 24 total, 4 validation
    assert len(dataset) == 20
    assert dataset.samples.shape[1:] == (128, 128)
    split = json.load(open(cfg.dirDataSplitProfile))
    assert len(split["validation"]) == 4
    assert len(split["train16p100"]) == 20
    batches = list(dataset.epoch_batches(8))
    assert len(batches) == 2  # drop_last
    s, l, c = batches[0]
    assert s.shape == (8, 128, 128) and l.shape == (8, 30, 8) and c.shape == (8,)

    # split profile reuse path
    ds2 = SCDDataset(
        str(root / "scdx16p100.d"), split, argument_ratio=16, partition=1.0,
        train_subset="train16p100",
    )
    assert set(ds2.order) == set(split["train16p100"])


def test_validation_padding_index_math():
    """The padded resident validation batching covers every true row
    exactly once and marks wrap-padding rows invalid (the round-2
    divisibility cliffs: vbs % n_dev and the per-shard tail)."""

    class Fake:
        _n_dev = 4
        _val_total = 10   # awkward: not divisible by devices or batch
        _val_eff_vbs = 8  # vbs 6 would round to 8 on 4 devices
        _val_padded = 16  # ceil(10/8)*8

    batches = list(NetworkFactory._validation_index_batches(Fake()))
    assert len(batches) == 2
    covered = []
    for idx, valid in batches:
        assert idx.shape == valid.shape == (8,)
        shard_len = Fake._val_padded // Fake._n_dev
        device = np.repeat(np.arange(4), 2)
        rows = device * shard_len + idx
        covered += [int(r) for r, v in zip(rows, valid) if v]
    assert sorted(covered) == list(range(10))

    batch = {
        "iou": (np.ones((8, 3, 2)), np.ones((8, 3, 2), bool)),
        "objs": np.ones(8),
    }
    valid = np.array([True] * 5 + [False] * 3)
    masked = NetworkFactory._mask_padded_rows(batch, valid)
    assert masked["iou"][1].sum() == 5 * 3 * 2
    assert masked["iou"][0].sum() == 8 * 3 * 2  # values untouched
    assert masked["objs"].sum() == 5.0
    # all-valid batches pass through unchanged (no copy)
    assert NetworkFactory._mask_padded_rows(batch, np.ones(8, bool)) is batch


def test_gated_pad_rows_exclude_device_reduced_sums():
    """Wrap-padding rows must contribute NOTHING to the metrics the
    device reduces to (sum, count) scalars (mIoUC/mIoUO/mIoUwoO/ortho/
    MAEs) — the round-3 review found _mask_padded_rows could only fix the
    grid leaves after the fact. The gated evaluation (scores forced to -1
    for pad rows) must reproduce the unpadded run's sums exactly."""
    import jax.numpy as jnp

    from scd_resnet_tpu.models.center_net_offset import center_net_evaluation
    from scd_resnet_tpu.train.factory import _gate_pad_rows

    rng = np.random.default_rng(0)
    b, k, hs = 2, 4, 16
    base_scores = rng.uniform(0.4, 0.9, (b, k))
    base_inds = rng.integers(0, hs * hs, (b, k))
    base_offset = rng.normal(0, 1, (b, k, 2))
    base_regr = rng.uniform(1, 4, (b, k, 4))
    base_mask = np.array([[1, 1, 0, 0], [1, 0, 0, 0]], bool)
    base_regr_gt = rng.uniform(1, 4, (b, k, 8))

    def rows(n):  # replicate the SAME 2-row batch n/2 times
        reps = n // b
        scores = jnp.asarray(np.tile(base_scores, (reps, 1)))
        inds = jnp.asarray(np.tile(base_inds, (reps, 1)))
        ys_ = (inds // hs).astype(jnp.float32)
        xs_ = (inds % hs).astype(jnp.float32)
        offset = jnp.asarray(np.tile(base_offset, (reps, 1, 1)))
        regr = jnp.asarray(np.tile(base_regr, (reps, 1, 1)))
        out_dict = {"heatmap": jnp.zeros((n, hs, hs, 1))}
        heat = jnp.zeros((n, hs, hs, 1))
        tag_mask = jnp.asarray(np.tile(base_mask, (reps, 1)))
        regr_gt = jnp.asarray(np.tile(base_regr_gt, (reps, 1, 1)))
        locs = regr_gt  # validation layout: ys[3] = (B, K, 8) loc records
        ys = [heat, tag_mask, regr_gt, locs]
        decoded = (scores, inds, ys_, xs_, offset, regr, out_dict)
        return ys, decoded

    ys2, decoded2 = rows(2)   # the true batch
    ys4, decoded4 = rows(4)   # true batch + wrap-padded duplicates
    row_valid = jnp.asarray([True, True, False, False])
    gated = _gate_pad_rows(decoded4, row_valid, "centerOffset")

    ref = center_net_evaluation(None, ys2, *decoded2)
    out = center_net_evaluation(None, ys4, *gated)
    for key in ("ortho", "ioucenter", "iouoffsetwo", "iouoffset"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), rtol=1e-6,
            err_msg=key)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out["maes"][i]), np.asarray(ref["maes"][i]),
            rtol=1e-6, err_msg="mae{}".format(i))
    # the AP pair grid: pad rows fully masked
    mask4 = np.asarray(out["iouscore"][2])
    assert not mask4[2:].any()


def test_size_scale_matches_training_constant():
    """stitch_size_rows' _SIZE_SCALE must track the training-side
    DOWNSAMPLE * SIZE_REGR_FACTOR (models/center_net.py) — they are
    deliberately not imported across the light/heavy module boundary."""
    from scd_resnet_tpu.infer.analyse import _SIZE_SCALE
    from scd_resnet_tpu.models.center_net import SIZE_REGR_FACTOR

    assert _SIZE_SCALE == 4 * SIZE_REGR_FACTOR


def test_coarse_remat_fallback_trains(tiny_env):
    """'remat': true with a model that has NO `remat` field (the ResNet
    families) takes the whole-forward jax.checkpoint fallback; one
    resident train step must run and produce a finite loss."""
    cfg, dataset, root = tiny_env
    cfg.update_config({"remat": True})
    try:
        factory = NetworkFactory(cfg, dataset=dataset)
        assert not hasattr(type(factory.model), "remat")
        loss, _ = factory.train_resident(np.zeros(8, np.int32))
        assert np.isfinite(float(loss))
    finally:
        cfg.update_config({"remat": False})


def test_training_loop_and_checkpoint(tiny_env):
    cfg, dataset, root = tiny_env
    factory = NetworkFactory(cfg, dataset=dataset)
    # vbs 4 on 8 devices + 4 val clips: resident via padding (streamed
    # with a warning before round 3)
    assert factory.val_resident
    factory.begin_training()

    # loss CSV written at snapshot iteration with 5 columns
    loss_file = os.path.join(cfg.dirResult, "losses.smoke.2.txt")
    assert os.path.exists(loss_file)
    rows = np.loadtxt(loss_file, delimiter=",").reshape(-1, 5)
    assert rows.shape[0] == 2
    assert np.all(np.isfinite(rows))

    # evals text written with the [Tr]/[It] lines
    evals = open(os.path.join(cfg.dirResult, "evals.smoke.txt")).read()
    assert "Experiment: smoke" in evals
    assert "[Tr]" in evals and "[It]" in evals and "[mIoU]" in evals

    # -debug dumped augmented-batch overlays at the validation boundary
    debug_dir = os.path.join(cfg.dirResult, "debug.smoke")
    overlays = sorted(os.listdir(debug_dir))
    assert overlays and overlays[0].startswith("it000002.clip")

    # best-validation tracking wrote the best checkpoint and logged it
    best = os.path.join(cfg.dirTemp, "centerOffsetRes10q.smoke.best.pth")
    assert os.path.exists(best)
    assert "[Best] [mIoU]" in evals

    # checkpoint resume: loads without error and keeps training
    ckpt = os.path.join(cfg.dirTemp, "centerOffsetRes10q.smoke.2.pth")
    assert os.path.exists(ckpt)
    cfg.update_config({"currentIter": 2, "iterations": 4})
    factory2 = NetworkFactory(cfg, dataset=dataset)
    factory2.begin_training()


def test_parse_metric_line_on_real_report_formats():
    from scd_resnet_tpu.train.factory import parse_metric_line

    center = ("[It]    2200:     [mIoU] 59.13823843    [mIoUC] 89.91561944"
              "    [AP30] 78.14    [AP50] 57.49    [Orth] 0.217619"
              "    [majMAE] 1.060755    [avgS] 0.8391")
    assert parse_metric_line(center, "mIoU") == 59.13823843
    assert parse_metric_line(center, "AP50") == 57.49
    assert parse_metric_line(center, "Orth") == 0.217619
    assert parse_metric_line(center, "boxAP50") is None

    corner = ("[heatPeakAP50] 81.60    [tlPeakAP50] 25.60    "
              "[boxAP50] 38.90")
    assert parse_metric_line(corner, "boxAP50") == 38.90
    assert parse_metric_line(corner, "heatPeakAP50") == 81.60
