"""train.py — train neural networks with a given set of configuration.

CLI mirror of the reference entry point (reference: train.py:31-110):
``python train.py config.json [-gpu] [-debug] [--local_rank N]``.

The ``-gpu`` flag is accepted for config-compatibility and means "use the
accelerator" (TPU here). Multi-process NCCL rendezvous is replaced by the
JAX runtime: single-host multi-chip parallelism needs no launcher (the
train step is sharded over the local mesh), and multi-host runs call
``jax.distributed.initialize`` when the standard cluster env variables are
present — ``--local_rank`` is accepted and ignored (one process per host,
not per chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pprint import pprint


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="train.py - train neural networks with a given set of "
        "configuration."
    )
    parser.add_argument(
        "configuration", type=str, nargs="?", default=None,
        help="path to the configuration file (exp.json schema; see README)",
    )
    parser.add_argument(
        "--list-profiles", action="store_true", dest="listProfiles",
        help="print the registered model and dataset profiles and exit",
    )
    parser.add_argument(
        "-gpu", dest="useGPU", const=True, default=False, action="store_const",
        help="use the available accelerator (TPU)",
    )
    parser.add_argument(
        "-debug", dest="debug", const=True, default=False, action="store_const",
        help="enable debug features",
    )
    parser.add_argument(
        "--local_rank", default=-1, type=int, dest="localRank",
        help="accepted for reference-CLI compatibility; unused (one process "
        "per host under JAX)",
    )
    args = parser.parse_args()
    if args.listProfiles:
        from scd_resnet_tpu.train.registry import (
            DATASET_PROFILES,
            MODEL_PROFILES,
        )

        print("model profiles ({}):".format(len(MODEL_PROFILES)))
        for name in sorted(MODEL_PROFILES):
            print("  " + name)
        print("dataset profiles ({}):".format(len(DATASET_PROFILES)))
        for name in sorted(DATASET_PROFILES):
            print("  " + name)
        raise SystemExit(0)
    if args.configuration is None:
        parser.error("configuration file required (or --list-profiles)")
    return args


def begin(args):
    from scd_resnet_tpu.core.compile_cache import enable_compilation_cache
    from scd_resnet_tpu.core.config import default_config
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.train.factory import NetworkFactory

    enable_compilation_cache()

    with open(args["config"], "r") as f:
        default_config.update_config(json.load(f))
    pprint(default_config.config, indent=4)
    Logger.info(":: train.py :: configuration ::::::::::::::::::::::::::::::::")

    if not default_config.useGPU():
        # without -gpu, train on CPU — and pin it via jax.config: the
        # accelerator tunnel ignores the JAX_PLATFORMS env variable, and a
        # CPU-intended run silently grabbing the single-tenant chip wedges
        # every other client on it
        import jax

        jax.config.update("jax_platforms", "cpu")

    # multi-host: initialize the JAX distributed runtime when a coordinator
    # is configured (no-op single host)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    factory = NetworkFactory()
    telemetry = os.path.join(
        default_config.dirResult,
        "telemetry.{}.jsonl".format(default_config.trainName),
    )
    factory.begin_training(telemetry_path=telemetry)


def main():
    from scd_resnet_tpu.core.config import default_config
    from scd_resnet_tpu.core.logging import Logger

    args = parse_arguments()
    Logger.info(":: train.py :: trainer program of neural networks ::::::::::")
    settings = {
        "config": args.configuration,
        "useGPU": args.useGPU,
        "localRank": args.localRank,
        "debug": args.debug,
    }
    default_config.update("useGPU", args.useGPU)
    default_config.update("debug", args.debug)
    pprint(settings, indent=4)
    Logger.info(":: train.py :: trainer task begin :::::::::::::::::::::::::::")
    begin(settings)
    Logger.info(":: train.py :: trainer task completed :::::::::::::::::::::::")


if __name__ == "__main__":
    main()
