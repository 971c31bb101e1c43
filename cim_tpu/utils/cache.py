"""Persistent XLA compilation cache.

Production-shape train-step compiles take minutes on the remote-compile
TPU path; the persistent cache makes every subsequent process start
instant. Enabled by Trainer/Evaluator and the CLIs; cache lives under the
repo by default (override with CIM_TPU_CACHE_DIR, disable with
CIM_TPU_NO_CACHE=1).
"""
from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None):
    global _ENABLED
    if _ENABLED or os.environ.get("CIM_TPU_NO_CACHE"):
        return
    import jax

    # CPU executables are HOST-specific AOT code: entries written by a
    # previous round's VM (different CPU features) load here with
    # cpu_aot_loader machine-feature mismatch warnings — a SIGILL risk on
    # any instruction the current host lacks. TPU entries are
    # remote-compiled against a fixed target and stay valid, so the
    # persistent cache is TPU-only.
    platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    if "cpu" in str(platforms).lower().split(","):
        return

    cache_dir = cache_dir or os.environ.get(
        "CIM_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    except Exception:  # pragma: no cover - older jax flag names
        pass
