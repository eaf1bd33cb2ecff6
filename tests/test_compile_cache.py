"""Persistent XLA compile cache helper (default-on in the CLIs)."""
import jax

from gnnep_tpu.utils import compile_cache as cc


def test_enable_sets_config_and_is_idempotent(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "_DONE", False)
    monkeypatch.delenv("GNNEP_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla")
    assert cc.enable_compile_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    # second call is a no-op (does not re-point the cache)
    assert cc.enable_compile_cache(str(tmp_path / "other")) is not None
    assert jax.config.jax_compilation_cache_dir == d


def test_env_disable(monkeypatch, tmp_path):
    monkeypatch.setattr(cc, "_DONE", False)
    monkeypatch.setenv("GNNEP_COMPILE_CACHE", "off")
    assert cc.enable_compile_cache(str(tmp_path)) is None
