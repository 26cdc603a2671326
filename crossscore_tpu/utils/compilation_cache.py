"""Persistent XLA compilation cache.

Remote TPU compiles in this environment take minutes for the full model graph;
the on-disk cache makes every subsequent run (bench, predict, train restarts)
start in seconds. Call :func:`enable` before the first jit.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("CROSSSCORE_COMPILE_CACHE", "~/.cache/crossscore_tpu_xla"))


def enable(cache_dir: str | Path | None = None) -> None:
    import jax

    path = Path(cache_dir or _DEFAULT).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
