"""Persistent XLA compilation cache.

First compiles of the decode programs can take minutes through
remote-compile tunnels; the persistent cache makes them one-time per
machine.  Call :func:`enable` before the first jit (App, bench, and the
driver entry points do).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.environ.get(
    "CWSL_DIGI_TPU_JAX_CACHE",
    str(Path.home() / ".cache" / "cwsl_digi_tpu" / "jax"),
)
_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    # segregate by backend: remote-compile services (axon) cache host-CPU
    # AOT code built for THEIR machine; loading those entries on a local
    # CPU backend risks SIGILL from mismatched CPU features
    backend = jax.default_backend()
    d = Path(cache_dir or _DEFAULT) / backend
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
