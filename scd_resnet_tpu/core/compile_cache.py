"""Persistent XLA compilation cache for every entry point.

jit compiles dominate cold-start latency here: the train step takes
~35-50 s to compile over the axon TPU tunnel, a serving analyzer
30-120 s per slide geometry, and CPU test compiles 30 s-3 min on the one
host core. XLA's persistent cache is content-addressed (keyed on the HLO,
compile options, platform and jaxlib version), so enabling it is
semantics-free; validated over the axon tunnel: an identical program's
second-process compile went 11.0 s -> 0.7 s.

The cache directory is additionally keyed by a HOST FINGERPRINT (the CPU
feature flags): XLA:CPU stores ahead-of-time compiled machine code whose
target features follow the *compiling* machine, and loading such an AOT
result on a host missing those features is a latent SIGILL (XLA's
cpu_aot_loader warns exactly this — observed across the round-3 dryrun,
MULTICHIP_r03). Same-host reuse, which is all the latency win, is
unaffected; a foreign-featured machine simply gets its own subdirectory.

Called by train.py / test.py / serve.py / trace.py / preprocess.py /
bench.py before the first jit. Opt out with SCD_NO_COMPILE_CACHE=1;
redirect with JAX_COMPILATION_CACHE_DIR (the standard JAX env var, which
jax reads on its own — this helper only supplies a default when neither
override is present; the fingerprint subdir is applied either way).
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional

_DEFAULT = os.path.expanduser("~/.cache/scd_resnet_tpu/xla")


def host_fingerprint(cpuinfo_text: Optional[str] = None) -> str:
    """A short stable id for this machine's instruction-set features.

    Hash of the sorted /proc/cpuinfo feature flags (order varies between
    kernels; the set is what AOT code validity depends on). Falls back to
    the machine architecture when cpuinfo is unavailable (non-Linux)."""
    if cpuinfo_text is None:
        try:
            with open("/proc/cpuinfo") as f:
                cpuinfo_text = f.read()
        except OSError:
            return platform.machine() or "unknown"
    for line in cpuinfo_text.splitlines():
        if line.lower().startswith(("flags", "features")):
            flags = " ".join(sorted(line.split(":", 1)[1].split()))
            return hashlib.sha1(flags.encode()).hexdigest()[:12]
    return platform.machine() or "unknown"


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable the persistent compile cache; returns the directory or None
    when disabled/unavailable. Safe to call more than once."""
    if os.environ.get("SCD_NO_COMPILE_CACHE"):
        return None
    import jax

    base = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT)
    path = os.path.join(base, host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold (1 s) skips the tiny host-side programs but
        # catches every model/analyzer compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unwritable dir / unsupported jax: run uncached
        return None
    return path
