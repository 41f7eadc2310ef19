"""core/compile_cache: opt-out, default dir, env override, idempotence,
host-fingerprint keying (the round-3 cross-machine AOT SIGILL fix)."""

import os

import jax
import pytest

from scd_resnet_tpu.core.compile_cache import (
    enable_compilation_cache,
    host_fingerprint,
)


@pytest.fixture(autouse=True)
def _restore_cache_dir():
    """jax.config is process-global; without this, redirecting the cache
    dir here would cold-recompile every later test in the suite."""
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("SCD_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None


def test_enables_and_is_idempotent(tmp_path, monkeypatch):
    monkeypatch.delenv("SCD_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "xla-cache")
    expected = os.path.join(target, host_fingerprint())
    assert enable_compilation_cache(target) == expected
    assert os.path.isdir(expected)
    assert jax.config.jax_compilation_cache_dir == expected
    # second call: same answer, no error
    assert enable_compilation_cache(target) == expected


def test_env_dir_override(tmp_path, monkeypatch):
    monkeypatch.delenv("SCD_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "from-env")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", target)
    assert enable_compilation_cache() == os.path.join(
        target, host_fingerprint())


def test_host_fingerprint_keys_by_feature_set():
    """XLA:CPU AOT results are only valid on machines with the compiling
    machine's features; the fingerprint must separate differing feature
    sets and ignore flag ORDER (kernel-version noise)."""
    a = host_fingerprint("processor: 0\nflags\t\t: fpu avx avx2 sse\n")
    a_reordered = host_fingerprint("processor: 0\nflags\t\t: sse avx2 avx fpu\n")
    b = host_fingerprint("processor: 0\nflags\t\t: fpu avx sse\n")  # no avx2
    assert a == a_reordered
    assert a != b
    # this host: stable across calls, path-safe
    mine = host_fingerprint()
    assert mine == host_fingerprint()
    assert mine and "/" not in mine and " " not in mine


def test_dryrun_aot_mismatch_detector():
    """__graft_entry__ refuses a dryrun whose stderr shows a cross-machine
    AOT load (MULTICHIP_r03's tail) and passes a clean one."""
    import __graft_entry__ as ge

    dirty = (
        "W0000 something unrelated\n"
        "E0818 01:11:04.671310 32637 cpu_aot_loader.cc:210] Loading XLA:CPU "
        "AOT result. Target machine feature +prefer-no-gather is not "
        "supported on the host machine.\n"
    )
    assert ge._find_aot_mismatch(dirty) is not None
    assert ge._find_aot_mismatch(
        "Machine type used for XLA:CPU compilation doesn't match the "
        "machine type for execution.") is not None
    assert ge._find_aot_mismatch(
        "dryrun_multichip OK: mesh=(4x2) data x model, loss=1.0\n"
        "WARNING: Platform 'axon' is experimental\n") is None
