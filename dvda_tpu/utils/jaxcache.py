"""Persistent XLA compilation cache (process-global, enabled once).

The decode pipeline compiles one XLA program per (geometry bucket ×
mode); first compiles cost 20-80 s on TPU (and ~6x that with
``filter_unroll>1``).  The programs are deterministic functions of the
geometry, so JAX's persistent compilation cache turns every repeat
compile — across tracks, processes, and service restarts — into a
~30 ms disk read (measured through this container's relay: 2.3 s ->
0.03 s for a toy program; the real chunk program's 27 s warm-up drops
the same way).

The reference decoder has no analog (nothing to compile); this is part
of the rebuild's own XLA-facing runtime.  Enabled by default at
``$XDG_CACHE_HOME/dvda_tpu/jax`` (``~/.cache/...``); ``DVDA_TPU_COMPILE_
CACHE=<dir>`` overrides the location, ``=0`` disables (config.py table).
"""

from __future__ import annotations

import os

__all__ = ["ensure_compile_cache"]

_applied: str | None = None


def ensure_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at the configured
    directory (idempotent; call before the first traced call — package
    ``ops/__init__`` does).  Returns the active cache dir or None."""
    global _applied
    if _applied is not None:
        return _applied or None

    from ..config import env_compile_cache

    path = env_compile_cache()
    if not path:
        _applied = ""
        return None
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except Exception as exc:  # unwritable dir, ancient jax, ...
        from .log import logger

        if os.environ.get("DVDA_TPU_COMPILE_CACHE"):
            # the operator pinned this path: a typo'd/unwritable dir
            # silently repaying every first-compile must be visible
            logger.warning("compile cache disabled (DVDA_TPU_COMPILE_"
                           "CACHE=%s): %s", path, exc)
        else:
            logger.debug("compile cache disabled (%s): %s", path, exc)
        _applied = ""
        return None
    _applied = path
    return path
