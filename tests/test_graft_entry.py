"""Driver-contract tests for __graft_entry__.py.

The driver imports the module and calls ``dryrun_multichip(8)`` directly —
possibly against an already-initialized single-chip backend (the axon
tunnel). Round 1 failed exactly that path (MULTICHIP_r01.json ok=false), so
this test reproduces the driver's call pattern in a clean subprocess whose
JAX backend sees only ONE device: the function must detect the shortfall
and re-exec its own passing CLI path.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_import_path():
    env = dict(os.environ)
    # a clean environment: no virtual-device pinning, single CPU device
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "print('driver-path ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "driver-path ok" in proc.stdout
    # the round-3 artifact was polluted with cross-machine XLA:CPU AOT
    # loads ("could lead to ... SIGILL"); the host-keyed cache must keep
    # the dryrun clean, and the subprocess guard must not have tripped
    import __graft_entry__ as ge

    assert ge._find_aot_mismatch(proc.stderr) is None, proc.stderr[-2000:]
