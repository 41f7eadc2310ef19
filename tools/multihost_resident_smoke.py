"""multihost_resident_smoke.py — the device-resident dataset path under
multi-host data parallelism (VERDICT r2 missing #4): two local processes x
4 virtual CPU devices form one 8-device global mesh; the full
NetworkFactory runs ``begin_training`` with ``residency="device"`` so the
archive uploads as per-host shards (jax.make_array_from_callback in
factory._put_rows) and every train/validate step gathers clips from HBM.

Usage (the pytest in tests/test_multihost.py drives both ranks):
    python tools/multihost_resident_smoke.py 0 &
    python tools/multihost_resident_smoke.py 1
Both ranks must print identical [metrics] lines."""
import os
import sys
import tempfile

proc_id = int(sys.argv[1])
port = os.environ.get("SCD_MULTIHOST_PORT", "12356")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
print(f"proc {proc_id}: global devices {len(jax.devices())}, "
      f"local {len(jax.local_devices())}", flush=True)

from scd_resnet_tpu.core.config import Configuration  # noqa: E402
from scd_resnet_tpu.data.dataset import SCDDataset  # noqa: E402
from scd_resnet_tpu.data.synthetic import make_archive  # noqa: E402
from scd_resnet_tpu.train.factory import NetworkFactory  # noqa: E402

# per-rank scratch; the archive content is seed-deterministic, so both
# ranks see identical data (each host loads the full archive, as on a
# real pod where every host mounts the same storage)
root = tempfile.mkdtemp(prefix=f"scd_mh_resident_{proc_id}_")
archive = os.path.join(root, "scdx16p100.d")
make_archive(archive, num_images=2, reps=2, clips_per_image=12, size=64,
             seed=0)

cfg = Configuration()
cfg.update_config({
    "datasetName": "scdx16p100",
    "modelName": "centerOffsetRes10q",
    "trainName": "mh-resident",
    "batchSize": 8,
    "validationBatchSize": 8,
    "iterations": 4,
    "validation": 2,
    "snapshot": 4,
    "learningRate": 1e-3,
    "learningRateDecay": [3],
    "learningRateDecayRate": [10],
    "residency": "device",
    "dirTemp": root + "/temp/",
    "dirResult": root + "/results/",
    "dirDataset": root + "/",
})
dataset = SCDDataset(
    archive, None, argument_ratio=16, partition=1.0,
    train_subset="train16p100", test_set=8,
    split_profile_path=cfg.dirDataSplitProfile,
)

factory = NetworkFactory(cfg, dataset=dataset)
factory.begin_training()
print(f"proc {proc_id}: resident={factory.resident} "
      f"val_resident={factory.val_resident}", flush=True)

# deterministic post-training validation over the HBM-resident set: the
# expression line must be bit-identical across ranks (same global arrays,
# same replicated params)
batches = [jax.device_get(b) for b in factory.validate_resident_set()]
line = factory.expression(batches)
print(f"proc {proc_id}: [metrics] {line}", flush=True)
