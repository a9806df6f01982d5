"""Fast (splat+refine) raycast vs the exact dense march."""

import math

import jax.numpy as jnp
import numpy as np

from ohm_tsd_slam_tpu.config import GridConfig
from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid import create, push, raycast
from ohm_tsd_slam_tpu.grid.raycast_fast import raycast_fast
from ohm_tsd_slam_tpu.sensor import polar2d
from ohm_tsd_slam_tpu.utils.testing import rect_walls, simulate_scan

CFG = GridConfig(map_size=8, cellsize=0.04)
GEOM = dict(size=361, angular_res=math.radians(0.75),
            phi_min=math.radians(-135.0), max_range=9.0,
            min_range=0.01, low_reflectivity_range=1.0)


def _grid_and_geom(poses_xyt):
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float64)
    walls = rect_walls(1.5, 1.5, 8.5, 8.5)
    for pose_xyt in poses_xyt:
        pose = np.array(se2.make(*pose_xyt, dtype=jnp.float64))
        r = simulate_scan(pose, GEOM["size"], GEOM["angular_res"],
                          GEOM["phi_min"], GEOM["max_range"],
                          segments=walls,
                          circles=[((7.0, 7.2), 0.5), ((3.0, 7.5), 0.35)])
        data, mask = polar2d.standard_mask(geom, jnp.asarray(r))
        grid = push(grid, geom, jnp.asarray(pose), data, mask)
    return grid, geom


def _compare(grid, geom, pose_xyt):
    pose = jnp.asarray(np.array(se2.make(*pose_xyt, dtype=jnp.float64)))
    exact = raycast(grid, geom, pose)
    fast = raycast_fast(grid, geom, pose)

    me = np.array(exact.mask)
    mf = np.array(fast.mask)
    agree = me == mf
    # allow a small fraction of boundary-beam disagreement
    assert agree.mean() > 0.98, (agree.mean(), np.where(~agree)[0][:20])
    both = me & mf
    np.testing.assert_allclose(np.array(fast.coords)[both],
                               np.array(exact.coords)[both],
                               atol=1e-9)
    np.testing.assert_allclose(np.array(fast.normals)[both],
                               np.array(exact.normals)[both], atol=1e-9)
    return both.sum(), (~agree).sum()


def test_fast_matches_exact_same_pose():
    grid, geom = _grid_and_geom([(5.12, 5.12, 0.2)])
    n, bad = _compare(grid, geom, (5.12, 5.12, 0.2))
    assert n > 250


def test_fast_matches_exact_other_pose():
    grid, geom = _grid_and_geom([(5.12, 5.12, 0.2)])
    _compare(grid, geom, (5.3, 4.9, 0.9))
    _compare(grid, geom, (4.5, 5.5, -1.3))


def test_fast_matches_exact_multi_scan_map():
    grid, geom = _grid_and_geom(
        [(5.12, 5.12, 0.2), (5.5, 5.3, 0.6), (4.8, 4.9, -0.4)])
    n, bad = _compare(grid, geom, (5.0, 5.0, 1.2))
    assert n > 250


def test_fast_empty_grid():
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float64)
    pose = jnp.asarray(np.array(se2.make(5.0, 5.0, 0.0,
                                         dtype=jnp.float64)))
    res = raycast_fast(grid, geom, pose)
    assert not bool(np.array(res.mask).any())


def test_overflow_guard_counts_and_falls_back(monkeypatch):
    """MAX_SEGMENTS overflow must be surfaced (n_dropped) and
    raycast_checked must fall back to the exact march (VERDICT r1 #6 —
    no silent caps)."""
    import ohm_tsd_slam_tpu.grid.raycast_fast as rf

    grid, geom = _grid_and_geom([(5.12, 5.12, 0.2), (5.3, 5.2, 0.5)])
    pose = jnp.asarray(np.array(se2.make(5.12, 5.12, 0.2,
                                         dtype=jnp.float64)))

    full = rf.raycast_fast(grid, geom, pose)
    assert int(full.n_dropped) == 0
    # exact march reports no drops by definition
    assert int(raycast(grid, geom, pose).n_dropped) == 0

    # shrink the capacity below the real segment count
    monkeypatch.setattr(rf, "MAX_SEGMENTS", 128)
    starved = rf.raycast_fast(grid, geom, pose)
    assert int(starved.n_dropped) > 0

    checked = rf.raycast_checked(grid, geom, pose)
    exact = raycast(grid, geom, pose)
    assert int(checked.n_dropped) > 0
    np.testing.assert_array_equal(np.array(checked.mask),
                                  np.array(exact.mask))
    # cond-traced branch may fuse differently than the direct call:
    # allow ULP-level drift
    np.testing.assert_allclose(np.array(checked.coords),
                               np.array(exact.coords), atol=1e-12)


def test_stale_segment_cache_detected_and_falls_back():
    """A SegmentCache extracted from an older grid version must be
    detected by the fingerprint gate (ADVICE r4 #2): raycast_fast
    surfaces it as n_dropped >= beams, and raycast_checked falls back to
    the exact march of the CURRENT grid."""
    import ohm_tsd_slam_tpu.grid.raycast_fast as rf

    grid_old, geom = _grid_and_geom([(5.12, 5.12, 0.2)])
    seg_old = rf.extract_segments(grid_old)
    assert seg_old.fingerprint is not None

    # grid changes (another scan fused) -> old cache is stale
    pose2 = np.array(se2.make(5.3, 5.2, 0.5, dtype=np.float64))
    walls = rect_walls(1.5, 1.5, 8.5, 8.5)
    r2 = simulate_scan(pose2, geom.size, geom.angular_res, geom.phi_min,
                       geom.max_range, segments=walls,
                       circles=[((7.0, 7.2), 0.5)])
    d2, m2 = polar2d.standard_mask(geom, jnp.asarray(r2))
    grid_new = push(grid_old, geom, jnp.asarray(pose2), d2, m2)

    qpose = jnp.asarray(np.array(se2.make(5.0, 5.0, 0.9,
                                          dtype=jnp.float64)))
    stale = rf.raycast_fast(grid_new, geom, qpose, segments=seg_old)
    assert int(stale.n_dropped) >= geom.size

    checked = rf.raycast_checked(grid_new, geom, qpose,
                                 segments=seg_old)
    exact = raycast(grid_new, geom, qpose)
    np.testing.assert_array_equal(np.array(checked.mask),
                                  np.array(exact.mask))
    np.testing.assert_allclose(np.array(checked.coords),
                               np.array(exact.coords), atol=1e-12)

    # a FRESH cache of the new grid stays on the fast path
    seg_new = rf.extract_segments(grid_new)
    fresh = rf.raycast_fast(grid_new, geom, qpose, segments=seg_new)
    assert int(fresh.n_dropped) == 0


def test_raycast_fast_batch_matches_singles():
    """raycast_fast_batch (pose axis folded into the flat beam axis,
    joint tail conds) must reproduce per-pose raycast_fast results."""
    import ohm_tsd_slam_tpu.grid.raycast_fast as rf

    grid, geom = _grid_and_geom([(5.12, 5.12, 0.2), (5.3, 5.2, 0.5)])
    poses = jnp.stack([
        jnp.asarray(np.array(se2.make(5.0 + 0.02 * i, 5.0 - 0.01 * i,
                                      0.9 + 0.05 * i, dtype=jnp.float64)))
        for i in range(4)])
    batch = rf.raycast_fast_batch(grid, geom, poses)
    assert int(batch.n_dropped) == 0
    for i in range(4):
        single = rf.raycast_fast(grid, geom, poses[i])
        np.testing.assert_array_equal(np.asarray(batch.mask[i]),
                                      np.asarray(single.mask))
        m = np.asarray(single.mask)
        np.testing.assert_allclose(np.asarray(batch.coords[i])[m],
                                   np.asarray(single.coords)[m],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(batch.normals[i])[m],
                                   np.asarray(single.normals)[m],
                                   atol=1e-9)

    # cached segments path
    seg = rf.extract_segments(grid)
    batch2 = rf.raycast_fast_batch(grid, geom, poses, segments=seg)
    np.testing.assert_array_equal(np.asarray(batch2.mask),
                                  np.asarray(batch.mask))
    np.testing.assert_allclose(np.asarray(batch2.coords),
                               np.asarray(batch.coords), atol=1e-12)
