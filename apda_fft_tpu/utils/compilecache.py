"""Persistent XLA compilation cache for production gateways.

First compilation of an epoch program costs 10-40 s on TPU; a gateway that
restarts (the reference's deployment restarts on every crash,
``GT_FFT_v5.py:858-859``) would re-pay it for every (N, batch, mode, budget)
shape.  JAX's persistent compilation cache serves those from disk instead.
Opt-in: call :func:`enable_compilation_cache` early (before the first
compile), or set ``"compilation_cache_dir"`` in the ``gateway`` section of
``gw_config.json`` and the service enables it at startup.
"""

from __future__ import annotations

import os

_enabled_dir: str | None = None


def enable_compilation_cache(cache_dir: str, min_compile_time_secs: float = 1.0) -> str:
    """Enable JAX's on-disk compilation cache at ``cache_dir``.

    Idempotent; returns the directory in effect.  Programs whose compile time
    is below ``min_compile_time_secs`` are not persisted (they recompile
    faster than they deserialize).
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)
    # Cache even when only one device is attached (default policy can skip).
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - older jax without this knob
        pass
    _enabled_dir = cache_dir
    return cache_dir


def disable_compilation_cache() -> None:
    """Turn the persistent cache back off (tests, special deployments).

    A long-lived process that enabled the cache keeps writing an entry for
    EVERY subsequent compile; callers that only wanted it temporarily (the
    unit test, a diagnostic session) must revert, or the global config
    leaks into unrelated work for the life of the process.
    """
    global _enabled_dir
    if _enabled_dir is None:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # The config alone is NOT enough: jax's compilation_cache module
    # initializes its cache object at most once, capturing the directory -
    # later compiles keep serializing/compressing/writing through the
    # retained object regardless of the config.  Drop it explicitly.
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:  # noqa: BLE001 - private API; config-off still limits writes
        pass
    _enabled_dir = None


def enabled_dir() -> str | None:
    """The cache directory in effect, or None when the cache is disabled."""
    return _enabled_dir
