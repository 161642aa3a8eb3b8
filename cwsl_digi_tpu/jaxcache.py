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


def _cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    # segregate by backend AND host CPU: remote-compile services (axon)
    # cache host-CPU AOT code built for THEIR machine, and a $HOME that
    # survives across machines (CI images) can hold CPU AOT entries whose
    # feature set does not match this host; loading those risks SIGILL
    backend = jax.default_backend()
    d = Path(cache_dir or _DEFAULT) / f"{backend}-{_cpu_fingerprint()}"
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
