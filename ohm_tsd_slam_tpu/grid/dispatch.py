"""Runtime dispatch between the jnp push and the Pallas TPU push kernel."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ohm_tsd_slam_tpu.grid.push import push
from ohm_tsd_slam_tpu.grid.state import TsdGrid


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def best_push(grid: TsdGrid) -> Callable:
    """The fastest correct push for this grid/device: the Pallas kernel
    on TPU for supported f32 layouts (~11x the jnp push on a 1024^2
    grid), the jnp reference push otherwise."""
    from ohm_tsd_slam_tpu.ops.push_pallas import (
        push_pallas,
        supports_pallas_push,
    )

    if (_on_tpu() and grid.tsd.dtype == jnp.float32
            and supports_pallas_push(grid)):
        return push_pallas
    return push
