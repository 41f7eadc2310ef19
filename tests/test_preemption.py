"""Graceful preemption: a stop request (the SIGTERM/SIGINT handler the
schedule loop installs) checkpoints params + optimizer + step at the next
step boundary, flushes pending loss rows, and records the resume hint —
TPU pods are preemptible; the reference lost the whole run (SURVEY.md §5
"failure detection: none")."""

import glob
import os
import signal

import numpy as np

from scd_resnet_tpu.core.config import Configuration
from scd_resnet_tpu.data.dataset import SCDDataset
from scd_resnet_tpu.data.synthetic import make_archive
from scd_resnet_tpu.train.factory import NetworkFactory


def _tiny(root, iterations=50):
    archive = str(root / "scdx16p100.d")
    make_archive(archive, num_images=2, reps=2, clips_per_image=6, size=128)
    cfg = Configuration()
    cfg.update_config(
        {
            "datasetName": "scdx16p100",
            "modelName": "centerOffsetRes10q",
            "trainName": "preempt",
            "batchSize": 8,
            "validationBatchSize": 4,
            "iterations": iterations,
            "validation": 25,
            "snapshot": 25,
            "learningRate": 1e-3,
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
    return cfg, dataset


def test_stop_request_checkpoints_and_exits(tmp_path):
    cfg, dataset = _tiny(tmp_path)
    factory = NetworkFactory(cfg, dataset)
    # deliver the signal for real: the loop installs request_stop as the
    # handler, so the flag is set during the first step and the loop must
    # stop at that boundary — long before the 50-iteration schedule
    prev = signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGTERM, prev)
    import threading

    threading.Timer(
        0.5, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    factory.begin_training()
    assert factory.preempted
    stopped_at = cfg.currentIteration
    assert 0 < stopped_at < 50

    # full state on disk: checkpoint + flushed loss CSV + resume hint
    assert os.path.exists(factory._checkpoint_path())
    csvs = glob.glob(str(tmp_path / "results" / "losses.preempt.*.txt"))
    assert csvs, "pending loss rows were not flushed"
    rows = np.loadtxt(csvs[0], delimiter=",", ndmin=2)
    assert rows[-1, 0] == stopped_at
    evals = open(str(tmp_path / "results" / "evals.preempt.txt")).read()
    assert "Preempted at iteration {}".format(stopped_at) in evals

    # the handler is restored after the loop
    assert signal.getsignal(signal.SIGTERM) is prev

    # exact resume: a fresh factory continues from the saved step to the
    # end of the schedule (currentIter path, networkFactory.py:116-124)
    cfg.update_config({"iterations": stopped_at + 2})
    factory2 = NetworkFactory(cfg, dataset)
    factory2.begin_training()
    assert not factory2.preempted
    # normal completion persists the final state: currentIter lands on
    # the schedule total and the checkpoint at that step exists
    assert cfg.currentIteration == stopped_at + 2
    assert os.path.exists(factory2._checkpoint_path())
