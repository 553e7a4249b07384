"""JAX runtime setup: persistent compilation cache.

Remote TPU compilation can cost minutes per program; the persistent cache
cuts fresh-process cold start for the trainer from ~minutes to seconds.
Called once on package import (see yabpe_tpu/__init__.py). Opt out with
YABPE_COMPILE_CACHE=0 or redirect with YABPE_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DONE = False


def setup_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("YABPE_COMPILE_CACHE", "1") == "0":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # The user pinned a cache dir explicitly (e.g. to isolate a test
        # run from a concurrent writer — parallel reader/writer on one
        # cache dir has segfaulted in jax's entry deserialization);
        # don't override it.
        return
    cache_dir = os.environ.get("YABPE_COMPILE_CACHE_DIR")
    if not cache_dir:
        # Default to a dot-directory at the repo/checkout root (three levels
        # above this file: src/yabpe_tpu/utils/jaxsetup.py).
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        )
        # Key the cache on the requested platform set: CPU AOT artifacts
        # written by a remote-compile service may target different host
        # features, and loading them cross-machine risks SIGILL.
        platform = os.environ.get("JAX_PLATFORMS", "default") or "default"
        cache_dir = os.path.join(
            root, ".jax_cache", platform.replace(",", "_")
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Cache is an optimization only; never block import on it.
        pass


def effective_backend() -> str:
    """The backend the library should compute on.

    Normally ``jax.default_backend()``, but overridable with YABPE_BACKEND.
    The override exists because the sandbox's TPU PJRT plugin registers
    *eagerly* at interpreter startup, which makes a later
    ``JAX_PLATFORMS=cpu`` a silent no-op — tests and CPU-mesh dry runs set
    ``YABPE_BACKEND=cpu`` (plus ``jax_default_device``) to genuinely run on
    the virtual CPU mesh in the same process.
    """
    backend = os.environ.get("YABPE_BACKEND")
    if backend:
        return backend
    import jax

    return jax.default_backend()


def compute_devices() -> list:
    """Devices of the effective backend (mesh construction uses these)."""
    import jax

    return jax.devices(effective_backend())


__all__ = ["setup_compilation_cache", "effective_backend", "compute_devices"]
