"""Persistent XLA compilation cache for CLI tools and benchmarks.

TPU compiles for the fused forward+decode programs take minutes (and go
through the axon remote-compile tunnel in this environment), so every CLI
entry point enables a persistent on-disk cache keyed by the optimized-HLO
hash.  The test suite does the same in ``tests/conftest.py``; this helper
gives tools/bench the same behavior without importing test code.

Safe to call before or after backend initialization; repeated calls are
no-ops.  Override the location with ``LITEPOSE_XLA_CACHE`` (set it to an
empty string to disable).
"""

from __future__ import annotations

import os

_DEFAULT = "/tmp/litepose_tpu_xla_cache"


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (or the
    ``LITEPOSE_XLA_CACHE`` env var, or a /tmp default).  Returns the cache
    dir, or None if disabled/unsupported."""
    if path is None:
        path = os.environ.get("LITEPOSE_XLA_CACHE", _DEFAULT)
    if not path:
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # unsupported jax version / read-only fs: run uncached
        return None
    return path
