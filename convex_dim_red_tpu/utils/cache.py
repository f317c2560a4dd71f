"""Persistent XLA compilation cache setup.

First compiles through the remote-compile TPU tunnel run 30-350 s;
enabling JAX's persistent compilation cache makes every repeated
program (driver re-runs, bench rounds, test reruns) load in
milliseconds.
"""

import os

import jax

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path=None):
    path = path or os.environ.get(
        "CDR_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cdr_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # The remote-compile relay acks many compiles in 0.3-0.9 s
        # (deferring/serving the heavy work server-side), so a 1 s
        # write threshold silently skips caching them and every new
        # process re-pays the relay round trip per program.  Cache
        # anything costing more than a local disk load.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.05)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flag names differ; cache is best-effort
    return path
