"""Offline [It] evaluation of a checkpoint — no training.

Builds the factory from an exp.json, loads the given checkpoint's params +
BN stats, runs the full validation pass over the config's validation set,
and prints the family's [It] metric line. Used for post-hoc metric
studies — e.g. re-scoring round-4/5 corner checkpoints under the windowed
center gate (pair_corner_boxes center_window) to separate decode artifacts
from model regressions.

Usage:
    python tools/eval_checkpoint.py <exp.json> <checkpoint.pth> [-gpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("-gpu", action="store_true",
                        help="accepted for CLI symmetry; device selection "
                             "is JAX's")
    args = parser.parse_args()

    enable_compilation_cache()

    import jax

    from scd_resnet_tpu.core.checkpoint import load_params_only
    from scd_resnet_tpu.core.config import Configuration
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.train.factory import NetworkFactory

    cfg = Configuration.from_json(args.config)
    factory = NetworkFactory(cfg)
    params, batch_stats = load_params_only(args.checkpoint)
    factory.params = jax.device_put(params, factory._param_shard)
    if batch_stats:
        factory.batch_stats = jax.device_put(batch_stats, factory._bs_shard)
    Logger.log("evaluating {} on the {} validation set".format(
        os.path.basename(args.checkpoint), cfg.datasetName))

    if factory.val_resident:
        batches = factory.validate_resident_set()
    else:
        batches = [
            jax.device_get(factory.validate(item["xs"], item["ys"]))
            for item in factory.dataset.get_validation_set(
                cfg.validationBatchSize,
                corner_targets=factory.profile.corner_targets,
            )
        ]
    print("[It] " + factory.expression(batches))


if __name__ == "__main__":
    main()
