"""Persistent XLA compilation cache for the CLI drivers.

Remote-tunnel TPU compiles cost 60-200 s per program, and the adaptive
driver's bucket ladder compiles O(log C) programs — a COLD
10^7-configuration generate run spends ~5 of its ~8 minutes compiling.
JAX's in-memory cache dies with the process; enabling the persistent
cache makes every later CLI invocation (relabel, ztest, resumed
generate, repeat runs) skip compilation entirely for shapes it has seen.

The reference has no analogue (nvcc compiles ahead of time); this is
TPU-operational plumbing, not a ported component.

Measured caveat (this image's axon tunnel): the cache demonstrably HITS
across processes ("Persistent compilation cache hit for 'jit_f'",
identical keys run to run), but LOADING the cached executable through
the remote tunnel costs as much as compiling it (~160-200 s either way
for even a trivial program), so there is no wall-clock win HERE. On a
standard TPU deployment, where deserialize+load is milliseconds, the
cache removes the entire per-process compile bill (1.4-11 min of a
cold 10^7-config generate run on this image, varying purely with
tunnel load).
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    Resolution order: explicit ``path`` argument, the
    ``COLLIDE2D_CACHE_DIR`` environment variable, then
    ``~/.cache/collide2d_tpu/xla``. Setting ``COLLIDE2D_CACHE_DIR`` to an
    empty string disables the cache; an already-configured
    ``jax_compilation_cache_dir`` (e.g. via ``JAX_COMPILATION_CACHE_DIR``)
    is left untouched. Returns the directory in use, or None if disabled.

    Safe to call before or after backend initialization (the flag is read
    at compile time, not at backend init).
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if path is None:
        path = os.environ.get(
            "COLLIDE2D_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "collide2d_tpu", "xla"
            ),
        )
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compile that takes over a second — with 60-200 s remote
    # compiles the default 1 s threshold is already right, but pin it so a
    # future JAX default bump cannot silently stop caching mid-size
    # programs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
