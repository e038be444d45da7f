"""Persistent XLA compilation cache.

First compiles through the tunneled-TPU remote compiler take minutes;
with the cache enabled, re-runs of any CLI (and the bench) reuse the
serialized executables.  No-op if the jax version lacks the knobs.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    # restore standard JAX env behavior: this image's sitecustomize
    # force-sets jax_platforms to the tunneled TPU at interpreter start,
    # ignoring the user's JAX_PLATFORMS — re-pin it here so
    # `JAX_PLATFORMS=cpu python -m renderloom.cli...` works as documented.
    # sitecustomize also exports JAX_PLATFORMS=axon unconditionally, so
    # "axon" means "no user override": re-pinning it would clobber an
    # explicit earlier jax.config.update("jax_platforms", "cpu") by the
    # caller (the round-1 dryrun timeout).
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and env_platforms != "axon":
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.cache/renderloom_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    return cache_dir
