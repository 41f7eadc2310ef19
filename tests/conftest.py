"""Test configuration: force the CPU backend with 8 virtual devices so
mesh/psum logic is exercised without TPUs (SURVEY.md §4 test strategy (c)).

Note: this machine tunnels to a real TPU chip via the experimental 'axon'
platform, which ignores the JAX_PLATFORMS env var — the explicit
``jax.config.update`` below is what actually pins tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's CPU jit compiles (30 s-3 min each
# on the single host core) are identical across runs — caching them cuts
# repeat suite time dramatically (validated 11.0 s -> 0.7 s per program).
# SCD_NO_COMPILE_CACHE=1 opts out for a cold-compile run.
from scd_resnet_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
