"""Persistent-compile-cache policy: CPU platforms must never read or
write the on-disk cache.

CPU cache entries are host-specific AOT executables; entries written on
another VM (different CPU features) load with machine-feature mismatch
warnings and can SIGILL. The TPU (axon) entries are remote-compiled
against a fixed target and stay valid, so the cache is TPU-only
(cim_tpu/utils/cache.py).
"""
import os

import jax

import cim_tpu.utils.cache as cache_mod


def test_cpu_platform_skips_persistent_cache(tmp_path, monkeypatch):
    # conftest.py forces jax_platforms=cpu for the whole suite; the env
    # var may still say axon — the config value must win.
    assert "cpu" in str(jax.config.jax_platforms)
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    monkeypatch.delenv("CIM_TPU_NO_CACHE", raising=False)
    monkeypatch.setenv("CIM_TPU_CACHE_DIR", str(tmp_path / "cache"))
    before = jax.config.jax_compilation_cache_dir
    cache_mod.enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir == before
    assert not cache_mod._ENABLED
    assert not os.path.exists(str(tmp_path / "cache"))


def test_env_cpu_skips_without_config(monkeypatch, tmp_path):
    # A process that sets JAX_PLATFORMS=cpu in the environment without
    # touching jax.config must also skip.
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    monkeypatch.delenv("CIM_TPU_NO_CACHE", raising=False)
    monkeypatch.setenv("CIM_TPU_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    cache_mod.enable_persistent_cache()
    assert not cache_mod._ENABLED
    assert not os.path.exists(str(tmp_path / "cache"))
