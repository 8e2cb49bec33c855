"""Persistent XLA compilation cache (VERDICT r3 item 2).

The reference loads precompiled SPIR-V kernels by name
(newmark_stepper.cpp:704-705) so a cold process never pays shader
compilation.  The TPU-native analogue is JAX's persistent compilation
cache: compiled XLA executables are keyed by (HLO, compile options,
device kind) and written to a directory, so every cold process after the
first reuses the binary instead of re-running the 10²-10³ s XLA
pipeline that large fused-kernel programs cost at 50M DOF.

``enable_persistent_cache()`` is idempotent and safe to call from every
entry point (runner, bench, graft entry, interactive sessions).  The
cache directory resolves, in order:

1. ``CIVIWAVE_COMPILE_CACHE`` env var ("0"/"off" disables entirely);
2. ``~/.cache/civiwave_tpu/xla`` (created on demand).

Thresholds: entries are only persisted when compilation took >= 1 s
(tiny kernels recompile faster than they deserialize) with no minimum
size — the expensive programs here are a handful of large executables,
not thousands of small ones.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Wire the JAX persistent compilation cache; returns the directory
    in use (None when disabled).  Idempotent."""
    global _ENABLED

    env = os.environ.get("CIVIWAVE_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disabled"):
        return None
    cache_dir = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "civiwave_tpu", "xla"
    )
    if _ENABLED:
        return cache_dir

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist anything that took >= 1 s to compile, regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return cache_dir
