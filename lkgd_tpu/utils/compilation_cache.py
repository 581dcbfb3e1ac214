"""Persistent XLA compilation cache — first compiles through the axon tunnel cost
150-500 s; cached reruns are ~0.1 s. Enabled by bench.py, __graft_entry__ and the CLIs."""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "LKGD_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
