"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run anywhere, and enable x64 so kernels can be validated in double
precision against the float64 NumPy oracle."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Skip the axon TPU-tunnel plugin registration entirely (sitecustomize
# keys on this): a partially-registered plugin leaves the MLIR "tpu"
# platform unknown, which breaks Pallas/checkify imports on CPU.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

# Persistent XLA executable cache: the suite's long poles are the
# sharded-step compiles (70-115 s each on this 2-core host); a warm
# cache deserializes them instead (utils/compile_cache.py).  Keyed by
# XLA flags, so the 8-virtual-device setting above stays part of the
# cache key.
from ohm_tsd_slam_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.expanduser("~/.cache/ohm_tsd_slam_tpu/xla-tests"),
    min_compile_secs=1.0)

# Drop any non-CPU PJRT plugin factories (e.g. the axon TPU tunnel this
# image registers via sitecustomize): tests must never claim the real
# chip, and a busy chip would hang backend initialization.
try:  # pragma: no cover - environment-specific
    from jax._src import xla_bridge

    # Keep "tpu" registered (never initialized under JAX_PLATFORMS=cpu):
    # popping it removes "tpu" from the known MLIR platforms and breaks
    # Pallas/checkify imports even for interpret-mode tests.
    for _name in list(xla_bridge._backend_factories):
        if _name not in ("cpu", "tpu"):
            xla_bridge._backend_factories.pop(_name, None)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(__file__))
