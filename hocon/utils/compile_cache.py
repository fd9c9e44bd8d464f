"""Persistent XLA/Mosaic compile cache for runtime entry points.

The TPU in this environment sits behind a tunnel where cold compiles cost
tens of seconds to minutes; tests already cache compiles (tests/conftest.py)
but CLI/bench processes each started cold. Calling ``enable_compile_cache``
before the first trace makes every repeat invocation (same code + shapes)
hit the on-disk cache.

Same safety settings as the test configuration: only JAX-level artifacts
are cached (``jax_persistent_cache_enable_xla_caches="none"``) because the
backend AOT cache embeds host machine features and can SIGILL after a
sandbox host migration.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent compile cache (idempotent, pre-trace only).

    Skipped on the axon (tunneled TPU) platform: measured there, the cache
    interacts badly with the experimental PJRT plugin — a trivial jit went
    22 s -> 78 s with caching enabled — and serialized executables would
    not survive the tunnel's host migrations anyway.
    """
    # Axon attachment is driven by the sitecustomize PJRT registration
    # (PALLAS_AXON_POOL_IPS), not only by JAX_PLATFORMS — a process with
    # the pool var set and JAX_PLATFORMS unset still lands on axon as the
    # default backend, so gate on both.
    if "axon" in os.environ.get("JAX_PLATFORMS", "") or os.environ.get(
        "PALLAS_AXON_POOL_IPS"
    ):
        return
    import jax

    cache_dir = path or os.environ.get(
        "HOCON_COMPILE_CACHE", "/tmp/hocon_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
