"""utils/compile_cache.py: the persistent-cache switch must engage on
this backend and actually write entries."""

import glob
import os
import tempfile


def test_enable_persistent_cache_writes_entries():
    import jax
    import jax.numpy as jnp

    import jax._src.compilation_cache as cc

    from ohm_tsd_slam_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    with tempfile.TemporaryDirectory() as d:
        # conftest already enabled a cache; repoint it at a fresh dir
        # (reset the once-only init so the new dir takes effect)
        cc.reset_cache()
        assert enable_persistent_cache(d, min_compile_secs=0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        jax.block_until_ready(f(jnp.ones((64, 64))))
        entries = [p for p in glob.glob(os.path.join(d, "*"))]
        assert entries, "no cache entries written"

    # restore the suite-wide cache for subsequent tests
    cc.reset_cache()
    enable_persistent_cache(
        os.path.expanduser("~/.cache/ohm_tsd_slam_tpu/xla-tests"),
        min_compile_secs=1.0)
