"""Persistent XLA compilation cache.

The reference pays Julia JIT warm-up once per session; our analog is XLA
compilation, which was measured at 15-25 s per bench config per run with
zero cross-run reuse.  JAX ships a persistent on-disk cache keyed by the
(HLO, compile options, backend version) fingerprint — enabling it makes the
second and every later run of an unchanged executable load in <1 s.

Call `enable_persistent_cache()` BEFORE the first jit compilation (it is
safe to call multiple times; later calls are no-ops if the config is set).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache and lower the entry
    thresholds so our 1-30 s solver executables all qualify.

    Returns the cache dir actually configured, or None when the running
    jax does not support the cache config (never raises).
    """
    cache_dir = cache_dir or os.environ.get("QCT_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min compile time is 1 s; keep it (relay round trips make
        # sub-second compiles cheaper to redo than to fetch) but drop the
        # min entry size so every solver executable is cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass  # knob renamed/absent on some jax versions
        return cache_dir
    except Exception:
        return None
