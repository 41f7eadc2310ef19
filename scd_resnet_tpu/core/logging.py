"""ANSI console logger (reference: logger.py:39-61) plus structured
per-step training telemetry the reference lacked (SURVEY.md §5 calls for
first-class observability in the rebuild).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional

_RESET = "\033[0m"
_COLORS = {
    "info": "\033[34m",       # blue
    "info_green": "\033[32m",  # green
    "warn": "\033[33m",       # yellow
    "err": "\033[31m",        # red
}


class Logger:
    @staticmethod
    def info(msg: str) -> None:
        print(_COLORS["info"] + msg + _RESET, flush=True)

    @staticmethod
    def info_green(msg: str) -> None:
        print(_COLORS["info_green"] + msg + _RESET, flush=True)

    # reference-compatible alias
    infoGreen = info_green

    @staticmethod
    def warn(msg: str) -> None:
        print(_COLORS["warn"] + msg + _RESET, flush=True)

    @staticmethod
    def err(msg: str) -> None:
        print(_COLORS["err"] + msg + _RESET, file=sys.stderr, flush=True)

    @staticmethod
    def log(msg: str) -> None:
        print(_RESET + msg, flush=True)


class StepTelemetry:
    """Append-only JSONL telemetry of training steps.

    The reference only shows a live tqdm loss bar (networkFactory.py:159-162);
    here every step can additionally be recorded as one JSON line with wall
    time, so throughput regressions are diagnosable after the fact.
    """

    def __init__(self, path: Optional[str] = None, every: int = 50) -> None:
        self.path = path
        self.every = max(1, every)
        self._fh = open(path, "a") if path else None
        self._t0 = time.perf_counter()

    def record(self, step: int, payload: Dict[str, Any]) -> None:
        if self._fh is None or step % self.every != 0:
            return
        payload = dict(payload)
        payload["step"] = step
        payload["t"] = round(time.perf_counter() - self._t0, 4)
        self._fh.write(json.dumps(payload) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
