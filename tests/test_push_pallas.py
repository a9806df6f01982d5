"""Pallas push kernel vs the jnp reference push (interpret mode on CPU).

The kernel replicates grid/push.py exactly up to f32 rounding (FMA
ordering, polynomial atan2); see ops/push_pallas.py.  A tiny number of
cells may land in an adjacent beam bin when their bearing sits within
~3e-7 rad of a bin edge — the tests allow that at a <0.05% rate.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ohm_tsd_slam_tpu.config import GridConfig
from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid import create, push
from ohm_tsd_slam_tpu.ops import push_pallas, supports_pallas_push
from ohm_tsd_slam_tpu.sensor import polar2d
from ohm_tsd_slam_tpu.utils.testing import rect_walls, simulate_scan

CFG = GridConfig(map_size=8, cellsize=0.04)   # 256^2, 32x32 tiles
GEOM = dict(size=541, angular_res=math.radians(0.5),
            phi_min=math.radians(-135.0), max_range=8.0,
            min_range=0.01, low_reflectivity_range=1.0)


def _scan(pose_np, geom):
    walls = rect_walls(1.0, 1.0, 9.0, 9.0)
    r = simulate_scan(pose_np.astype(np.float64), geom.size,
                      geom.angular_res, geom.phi_min, geom.max_range,
                      segments=walls, circles=[((7.0, 7.2), 0.5)])
    return polar2d.standard_mask(geom, jnp.asarray(r, jnp.float32))


def _compare(g_ref, g_pal):
    a = np.array(g_ref.tsd)
    b = np.array(g_pal.tsd)
    nan_mism = (np.isnan(a) != np.isnan(b))
    assert nan_mism.mean() < 5e-4, nan_mism.sum()
    fin = ~np.isnan(a) & ~np.isnan(b)
    d = np.abs(a[fin] - b[fin])
    if d.size:
        # beam-bin edge flips change a cell's source beam; bound the rate
        assert (d > 1e-3).mean() < 5e-4, (d > 1e-3).sum()
        assert np.median(d) < 1e-5
    np.testing.assert_allclose(np.array(g_ref.weight),
                               np.array(g_pal.weight), atol=1e-2)
    np.testing.assert_array_equal(np.array(g_ref.tile_init),
                                  np.array(g_pal.tile_init))
    np.testing.assert_allclose(np.array(g_ref.tile_initw),
                               np.array(g_pal.tile_initw), atol=1e-6)


def test_supports():
    assert supports_pallas_push(create(CFG, dtype=jnp.float32))
    small = create(GridConfig(map_size=6, cellsize=0.04), dtype=jnp.float32)
    assert not supports_pallas_push(small)   # 64 cells < BLOCK_W


def test_single_push_parity():
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float32)
    pose = se2.make(5.0, 5.0, 0.4, dtype=jnp.float32)
    data, mask = _scan(np.array(pose), geom)
    g_ref = push(grid, geom, pose, data, mask)
    g_pal = push_pallas(grid, geom, pose, data, mask, interpret=True)
    _compare(g_ref, g_pal)
    # something was actually fused
    assert np.isfinite(np.array(g_pal.tsd)).sum() > 1000


def test_multi_push_accumulation():
    geom = polar2d.SensorPolar2D(**GEOM)
    g_ref = create(CFG, dtype=jnp.float32)
    g_pal = g_ref
    for xyt in [(5.0, 5.0, 0.4), (5.3, 5.1, 0.5), (4.8, 5.2, 0.3)]:
        pose = se2.make(*xyt, dtype=jnp.float32)
        data, mask = _scan(np.array(pose), geom)
        g_ref = push(g_ref, geom, pose, data, mask)
        g_pal = push_pallas(g_pal, geom, pose, data, mask, interpret=True)
    _compare(g_ref, g_pal)


def test_sensor_outside_grid_is_noop():
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float32)
    pose = se2.make(50.0, 50.0, 0.0, dtype=jnp.float32)
    data = jnp.full((geom.size,), jnp.inf, jnp.float32)
    mask = jnp.zeros((geom.size,), bool)
    g_pal = push_pallas(grid, geom, pose, data, mask, interpret=True)
    assert not np.isfinite(np.array(g_pal.tsd)).any()
    assert not np.array(g_pal.tile_init).any()


def test_all_masked_scan_matches_reference():
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float32)
    pose = se2.make(5.0, 5.0, 0.0, dtype=jnp.float32)
    data = jnp.full((geom.size,), jnp.inf, jnp.float32)
    mask = jnp.zeros((geom.size,), bool)
    g_ref = push(grid, geom, pose, data, mask)
    g_pal = push_pallas(grid, geom, pose, data, mask, interpret=True)
    _compare(g_ref, g_pal)
