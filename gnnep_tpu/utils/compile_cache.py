"""Persistent XLA compilation cache (default-on for the CLIs).

Remote compiles on the tunneled TPU runtime cost 45-200 s per program
(PERF.md), and every CLI invocation is a fresh process — without a
persistent cache, a 3-epoch training run spends most of its wall-clock
recompiling programs it built yesterday. JAX's compilation cache persists
serialized executables keyed by (HLO, compile options, backend version);
enabling it turns second-run compiles into millisecond disk loads
(verified working through the tunneled backend).

Controls: GNNEP_COMPILE_CACHE=<dir> overrides the location;
GNNEP_COMPILE_CACHE=0|off disables. Default: ~/.cache/gnnep_tpu/xla.
"""
from __future__ import annotations

import os
from pathlib import Path

_DONE = False
_ACTIVE: str | None = None


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX at a persistent compile cache; returns the
    directory in use, or None when disabled/unavailable. Call before the
    first jit compilation (CLIs do this at entry)."""
    global _DONE, _ACTIVE
    env = os.environ.get("GNNEP_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    if _DONE:
        return _ACTIVE
    target = cache_dir or env or str(Path.home() / ".cache" / "gnnep_tpu"
                                     / "xla")
    try:
        Path(target).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        # cache everything that took real compile time; tiny programs
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
        _ACTIVE = target
        return target
    except Exception:
        return None  # read-only home, ancient jax, etc. — never fatal
