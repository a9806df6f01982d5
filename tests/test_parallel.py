"""Multi-device sharding: the sharded multi-robot SLAM step on a virtual
8-device CPU mesh must agree with the single-device computation
(SURVEY.md §4 test plan, item 4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ohm_tsd_slam_tpu.config import GridConfig
from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid import create
from ohm_tsd_slam_tpu.parallel import (
    make_mesh,
    make_sharded_step,
    multi_robot_slam_step,
    pose_gradient,
)
from ohm_tsd_slam_tpu.registration.icp import IcpParams
from ohm_tsd_slam_tpu.sensor.polar2d import SensorPolar2D, standard_mask
from ohm_tsd_slam_tpu.slam.localize import LocalizeParams
from ohm_tsd_slam_tpu.utils.testing import rect_walls, simulate_scan

CFG = GridConfig(map_size=7, cellsize=0.05)
GW = CFG.size_meters
GEOM = SensorPolar2D(size=181, angular_res=math.radians(1.5),
                     phi_min=math.radians(-135.0), max_range=5.0,
                     min_range=0.01, low_reflectivity_range=1.0)
PARAMS = LocalizeParams(
    geom=GEOM, icp=IcpParams(iterations=15, bounds=(0.0, GW, 0.0, GW)))


def _robot_batch(R=4):
    walls = rect_walls(0.8, 0.8, GW - 0.8, GW - 0.8)
    poses, datas, masks = [], [], []
    for r in range(R):
        pose_np = np.array(se2.make(GW / 2 + 0.15 * r, GW / 2 - 0.1 * r,
                                    0.1 * r, dtype=jnp.float64))
        ranges = simulate_scan(pose_np, GEOM.size, GEOM.angular_res,
                               GEOM.phi_min, GEOM.max_range,
                               segments=walls,
                               circles=[((4.5, 4.5), 0.3)])
        d, m = standard_mask(GEOM, jnp.asarray(ranges))
        poses.append(jnp.asarray(pose_np))
        datas.append(d)
        masks.append(m)
    return jnp.stack(poses), jnp.stack(datas), jnp.stack(masks)


def _base_grid():
    grid = create(CFG, dtype=jnp.float64)
    from ohm_tsd_slam_tpu.grid import push

    poses, data, mask = _robot_batch(1)
    return push(grid, GEOM, poses[0], data[0], mask[0])


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device():
    grid = _base_grid()
    poses, data, mask = _robot_batch(4)

    ref = multi_robot_slam_step(grid, poses, data, mask, PARAMS)

    mesh = make_mesh(jax.devices()[:8])
    step, place = make_sharded_step(mesh, PARAMS)
    with mesh:
        g, p, d, m = place(grid, poses, data, mask)
        out = step(g, p, d, m)
        jax.block_until_ready(out)

    np.testing.assert_allclose(np.array(out.poses), np.array(ref.poses),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.array(out.pose_grad),
                               np.array(ref.pose_grad),
                               rtol=1e-6, atol=1e-9)
    got = np.array(out.grid.tsd)
    exp = np.array(ref.grid.tsd)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    ok = ~np.isnan(exp)
    np.testing.assert_allclose(got[ok], exp[ok], rtol=1e-9, atol=1e-12)


def test_pose_gradient_finite_and_descending():
    """The map-residual pose gradient points downhill: stepping against
    it reduces the residual."""
    from ohm_tsd_slam_tpu.parallel.sharded import map_residual_loss

    grid = _base_grid()
    poses, data, mask = _robot_batch(1)
    # perturb the pose so the residual is nonzero
    pose = poses[0] @ se2.make(0.03, -0.02, 0.01, dtype=jnp.float64)
    g = pose_gradient(grid, GEOM, pose, data[0], mask[0])
    assert np.isfinite(np.array(g)).all()
    l0 = float(map_residual_loss(grid, GEOM, pose, data[0], mask[0]))

    step = -1e-3 * np.array(g) / (np.linalg.norm(np.array(g)) + 1e-12)
    delta = se2.make(step[0], step[1], step[2], dtype=jnp.float64)
    l1 = float(map_residual_loss(grid, GEOM, pose @ delta, data[0],
                                 mask[0]))
    assert l1 < l0


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.pose.shape == (3, 3)


def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
