"""JAX runtime setup: persistent compilation cache.

Remote TPU compilation can cost minutes per program; the persistent cache
cuts fresh-process cold start for the trainer from ~minutes to seconds.
Called once on package import (see yabpe_tpu/__init__.py). Opt out with
YABPE_COMPILE_CACHE=0 or redirect with YABPE_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import hashlib
import os

_DONE = False


def machine_fingerprint() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU AOT artifacts are machine-feature-specific: loading (or even
    cache-key probing) an entry produced on a host with different CPU
    features has segfaulted inside jax's compilation-cache get/put in this
    sandbox, which restarts onto heterogeneous hosts between sessions.
    Keying the CPU-backend cache directory on the feature flags makes a
    host switch land on a fresh directory instead of a poisoned one.
    """
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8", errors="replace") as f:
            text = f.read()
        lines = [
            line
            for line in text.splitlines()
            if line.startswith(("flags", "model name", "Features"))
        ]
        blob = "\n".join(sorted(set(lines))) or text[:4096]
    except OSError:
        import platform

        blob = f"{platform.machine()}-{platform.processor()}"
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


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
        dirname = platform.replace(",", "_")
        if "cpu" in platform:
            # CPU AOT artifacts are machine-feature-specific (see
            # machine_fingerprint); TPU (axon) entries are service-compiled
            # and portable, so only cpu dirs get the per-host suffix.
            dirname = f"{dirname}-{machine_fingerprint()}"
        cache_dir = os.path.join(root, ".jax_cache", dirname)
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


__all__ = [
    "setup_compilation_cache",
    "effective_backend",
    "compute_devices",
    "machine_fingerprint",
]
