"""core/compile_cache: opt-out, default dir, env override, idempotence."""

import os

import jax
import pytest

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache


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
    assert enable_compilation_cache(target) == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # second call: same answer, no error
    assert enable_compilation_cache(target) == target


def test_env_dir_override(tmp_path, monkeypatch):
    monkeypatch.delenv("SCD_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "from-env")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", target)
    assert enable_compilation_cache() == target
