"""Persistent XLA compilation cache (warm process starts).

The reference starts in milliseconds; a JAX process pays XLA compilation
on first trace instead (~20 s for the full localization step at the
1024^2/1081-beam scale, BENCH r4).  Enabling JAX's persistent
compilation cache amortizes that across process restarts: the second
process deserializes the executables in well under a second each
(measured on the v5e tunnel: 1.7 s -> 0.25 s for a toy jit; the bench
records `localize_compile_s` per round).

Quirk worked around here: this image reaches its TPU through an "axon"
PJRT plugin.  The backend reports platform "tpu" and serializes
executables fine, but jax's one-time cache-adoption check
(jax._src.compilation_cache.is_cache_used) runs against the PLUGIN
platform name and leaves the cache disabled.  `enable_persistent_cache`
sets the documented config knobs and then flips the adoption flag
directly — guarded so an incompatible future jax just leaves the cache
off rather than failing.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/ohm_tsd_slam_tpu/xla")


def enable_persistent_cache(path: str = None,
                            min_compile_secs: float = 0.5) -> bool:
    """Enable the on-disk XLA executable cache for this process.

    Call before the first jit execution.  Returns True when the cache
    was switched on (best effort; False means jax internals changed and
    the process simply compiles cold).
    """
    import jax

    path = path or os.environ.get("OHM_TSD_SLAM_TPU_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - knob renamed
        return False
    try:
        import jax._src.compilation_cache as cc

        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = True
        return True
    except Exception:  # pragma: no cover - private API changed
        return False
