"""Multi-host data-parallel smoke as a pytest (VERDICT r1 next #9):
two subprocesses x 4 virtual CPU devices form one 8-device global mesh via
jax.distributed and run sharded training steps; both ranks must succeed
and print identical losses."""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SCD_MULTIHOST_PORT"] = str(port)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join("tools", "multihost_smoke.py"),
             str(rank)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, out[-4000:]

    losses = []
    for out in outs:
        match = re.search(r"multi-host step OK, loss=([0-9.]+)", out)
        assert match, out[-2000:]
        losses.append(float(match.group(1)))
    assert losses[0] == losses[1], losses


def test_two_process_device_resident_training():
    """Device residency under multi-host (VERDICT r2 missing #4): the full
    factory training loop with residency='device' over a 2-process global
    mesh — per-host shard uploads via make_array_from_callback, resident
    train AND resident validation — must produce identical metrics on
    both ranks."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SCD_MULTIHOST_PORT"] = str(port)

    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join("tools", "multihost_resident_smoke.py"), str(rank)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, out[-4000:]

    lines = []
    for out in outs:
        assert "resident=True val_resident=True" in out, out[-2000:]
        match = re.search(r"\[metrics\] (.+)", out)
        assert match, out[-2000:]
        lines.append(match.group(1))
    assert lines[0] == lines[1], lines
