"""Platform/runtime helpers for the CLI entry points.

The TPU-tunnel environments register their PJRT plugin from a
``sitecustomize`` that re-points ``jax_platforms`` at interpreter
startup, which silently overrides a user's ``JAX_PLATFORMS=cpu``.  The
CLIs call :func:`honor_jax_platforms_env` first so the documented env
var works as expected.

``jit_init`` exists because ``flax`` module init runs op-by-op; over a
remote-execution tunnel every op is a round trip (measured: 23 minutes
for the flagship network's init vs ~40s jitted).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (train/eval CLIs): the flagship
    step compiles in minutes; restarts and auto-resume should not pay it
    twice.  ``JAX_COMPILATION_CACHE_DIR`` overrides the location."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       path or "/tmp/gd_tpu_jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def jit_init(net, batch, rng=None, **apply_kw):
    """One-compile flax init (init is eager per-op otherwise)."""
    import jax

    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def _init(rng, batch):
        return net.init({"params": rng}, batch, **apply_kw)

    return _init(rng, batch)
