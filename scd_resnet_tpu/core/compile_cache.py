"""Persistent XLA compilation cache for every entry point.

jit compiles dominate cold-start latency here: the train step takes
~35-50 s to compile over the axon TPU tunnel, a serving analyzer
30-120 s per slide geometry, and CPU test compiles 30 s-3 min on the one
host core. XLA's persistent cache is content-addressed (keyed on the HLO,
compile options, platform and jaxlib version), so enabling it is
semantics-free; validated over the axon tunnel: an identical program's
second-process compile went 11.0 s -> 0.7 s.

Called by train.py / test.py / serve.py / trace.py / preprocess.py /
bench.py before the first jit. Opt out with SCD_NO_COMPILE_CACHE=1;
redirect with JAX_COMPILATION_CACHE_DIR (the standard JAX env var, which
jax reads on its own — this helper only supplies a default when neither
override is present).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.expanduser("~/.cache/scd_resnet_tpu/xla")


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable the persistent compile cache; returns the directory or None
    when disabled/unavailable. Safe to call more than once."""
    if os.environ.get("SCD_NO_COMPILE_CACHE"):
        return None
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold (1 s) skips the tiny host-side programs but
        # catches every model/analyzer compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unwritable dir / unsupported jax: run uncached
        return None
    return path
