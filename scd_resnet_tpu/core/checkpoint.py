"""Checkpoint store: params + batch stats + optimizer state + step.

The reference snapshots only the model ``state_dict`` (networkFactory.py:
290-302) — optimizer state is never saved despite the dead
``namingOptimizer`` config key (SURVEY.md §5 "checkpoint/resume"). Here a
single flax-serialized msgpack blob carries everything needed for exact
resume, written to the same ``dirTemp + naming`` template
(``{modelName}.{trainName}.{currentIter}.pth``) so experiment tooling keeps
working.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
from flax import serialization

from scd_resnet_tpu.core.logging import Logger


def save_checkpoint(path: str, params, batch_stats, opt_state, step: int) -> None:
    Logger.warn(":: checkpoint :: saving model to {}".format(path))
    payload = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": opt_state,
        "step": step,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(payload)
    # atomic replace: a hard kill mid-write (the preemption deadline this
    # save exists for) must not leave a truncated file where the resume
    # hint points
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as f:
        f.write(data)
    os.replace(tmp_path, path)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the same pytree structure as ``template``
    (a dict with params/batch_stats/opt_state/step)."""
    Logger.warn(":: checkpoint :: loading model from {}".format(path))
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def load_params_only(path: str) -> Any:
    """Warm-start from a checkpoint's parameters and batch stats (pretrain
    path, networkFactory.py:278-288). Returns ``(params, batch_stats)`` as
    raw nested dicts."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return raw["params"], raw["batch_stats"]
